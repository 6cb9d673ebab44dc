"""Pure-stdlib codecs for multimodal payloads (no PIL/ffmpeg in the
target environment — zlib + struct + numpy only)."""

from finetoo_sp_spark.codecs.jpeg import decode_jpeg, encode_jpeg_baseline
from finetoo_sp_spark.codecs.png import decode_png, encode_png

__all__ = ["decode_jpeg", "decode_png", "encode_jpeg_baseline", "encode_png"]
