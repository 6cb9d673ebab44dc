"""Crawl-robustness fuzz: every decoder must either return a result or
raise one of its DOCUMENTED exception types on arbitrary, truncated,
or bit-flipped bytes — never segfault, hang, OOM, or leak an
unexpected exception class. At 10^12 documents every byte pattern that
can exist will exist; a kernel's try/except only protects against the
exception types it lists."""

from __future__ import annotations

from struct import error as struct_error
from zlib import error as zlib_error

import numpy as np
import pytest

from finetoo_sp_spark.codecs.apng import decode_apng_frames, encode_apng
from finetoo_sp_spark.codecs.bmp import decode_bmp, encode_bmp
from finetoo_sp_spark.codecs.exif import (
    ExifError,
    insert_exif,
    make_exif_app1,
    parse_exif_jpeg,
    strip_gps_jpeg,
)
from finetoo_sp_spark.codecs.flac import parse_flac_tags
from finetoo_sp_spark.codecs.gif import decode_gif_frames
from finetoo_sp_spark.codecs.jpeg import decode_jpeg, encode_jpeg_baseline
from finetoo_sp_spark.codecs.mp4 import (
    Mp4Error,
    decode_mp4,
    decode_sample_table,
    encode_mp4_samples,
)
from finetoo_sp_spark.codecs.png import decode_png, encode_png
from finetoo_sp_spark.codecs.probe import (
    ProbeError,
    parse_id3v2,
    probe_audio_meta,
    probe_image_dims,
)
from finetoo_sp_spark.codecs.tiff import TiffError, decode_tiff
from finetoo_sp_spark.codecs.vp8l import decode_webp
from finetoo_sp_spark.codecs.wav import WavError, decode_wav
from finetoo_sp_spark.extraction.pdfcrypt import decrypt_pdf
from finetoo_sp_spark.extraction.pdfmini import parse_pdf_fragments

# (callable, allowed exception classes). ValueError covers every codec's
# documented *Error subclass plus magic rejection; the parsers that walk
# untrusted offsets may also surface struct/zlib/Index errors, which the
# Spark kernels list explicitly.
_DECODERS = [
    (decode_png, (ValueError,)),
    (decode_apng_frames, (ValueError,)),
    (decode_gif_frames, (ValueError, NotImplementedError, IndexError, struct_error)),
    (decode_jpeg, (ValueError, NotImplementedError, IndexError, struct_error)),
    (decode_bmp, (ValueError, NotImplementedError, struct_error, IndexError)),
    (decode_tiff, (TiffError, ValueError, NotImplementedError, struct_error, IndexError, zlib_error)),
    (decode_webp, (ValueError, NotImplementedError, IndexError, struct_error)),
    (decode_wav, (WavError, ValueError, struct_error)),
    (decode_mp4, (Mp4Error, ValueError, struct_error)),
    (decode_sample_table, (Mp4Error, ValueError, struct_error)),
    (probe_image_dims, (ProbeError, ValueError, struct_error)),
    (probe_audio_meta, (ProbeError, ValueError, struct_error)),
    (parse_id3v2, (ValueError,)),
    (parse_flac_tags, (ValueError,)),
    (parse_exif_jpeg, (ExifError, ValueError, struct_error)),
    (strip_gps_jpeg, (ExifError, ValueError, struct_error)),
    (decrypt_pdf, (ValueError, NotImplementedError)),
]


def _payload_corpus() -> list[bytes]:
    rng = np.random.default_rng(20260821)
    out = [b"", b"\x00", b"x" * 3]
    # pure noise at several sizes
    for size in (16, 64, 300, 2048):
        out.append(rng.integers(0, 256, size, dtype=np.uint8).tobytes())
    # valid files of every format, then truncated and bit-flipped
    img = rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
    gray16 = np.full((16, 16), 130, np.uint8)
    valid = [
        encode_png(img),
        encode_apng(
            10, 12,
            [{"rgba": np.zeros((12, 10, 4), np.uint8), "blend": 0},
             {"rgba": np.ones((6, 5, 4), np.uint8), "blend": 1}],
        ),
        encode_jpeg_baseline(gray16),
        insert_exif(
            encode_jpeg_baseline(gray16),
            make_exif_app1(3, "M", "C", "", "", gps=("N", (1, 1, 2, 1, 3, 1), "E", (4, 1, 5, 1, 6, 1))),
        ),
        encode_bmp(img, bits=24),
        encode_mp4_samples(600, [(6, 100)], [10] * 6, 4, sync_every=2),
    ]
    for v in valid:
        out.append(v)
        out.append(v[: len(v) // 2])
        out.append(v[: len(v) - 3])
        for _ in range(4):
            b = bytearray(v)
            for _k in range(3):
                b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
            out.append(bytes(b))
        # magic kept, interior shredded
        b = bytearray(v)
        mid = len(b) // 2
        b[mid : mid + 32] = rng.integers(0, 256, min(32, len(b) - mid), dtype=np.uint8).tobytes()
        out.append(bytes(b))
    return out


_CORPUS = _payload_corpus()


@pytest.mark.parametrize(
    "fn,allowed", _DECODERS, ids=[f[0].__name__ for f in _DECODERS]
)
def test_decoder_survives_hostile_bytes(fn, allowed):
    for payload in _CORPUS:
        try:
            fn(payload)
        except allowed:
            pass
        # anything else propagates and fails the test with its real type


def test_pdf_fragments_never_raise_on_noise():
    # parse_pdf_fragments is additionally wrapped in try/except by the
    # kernel, but the common paths should degrade, not throw, on noise
    for payload in _CORPUS[:7]:
        assert len(parse_pdf_fragments(payload)) == 0
