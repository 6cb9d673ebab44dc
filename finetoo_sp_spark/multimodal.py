"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque
``binary`` column that never leaves the JVM except through Arrow batches
into vectorized kernels; metadata (modality, declared dims, codec) rides
in typed sibling columns so partition pruning / filtering never touches
bytes. Decode / resize / frame-sample are per-batch pandas kernels with
a real schema, real batch shape, and a clearly-marked stub where the
codec library would run (PIL/ffmpeg are not in this container —
BASELINE environment). The deterministic fallback ("fake decode")
hashes the payload into fixed-size pseudo-features so the whole
pipeline, including downstream joins/aggregations, is testable
end-to-end today and swaps to a real codec by replacing one function.

Reference tie-in: the reference treats PDF payloads the same way —
opaque binary siblings of the DXFs routed to a parallel parse path
(binder_test_no_refs/ listing; proto/graph.proto:360-383 BinderConfig).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from struct import error as struct_error
from zlib import error as zlib_error

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16

META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_sha", StringType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    META_SCHEMA.fields
    + [StructField("features", ArrayType(DoubleType()), False)]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload to an (H, W, C) uint8 array, routed by
    magic bytes.

    PNG decodes via the pure-stdlib codec (codecs/png.py: zlib inflate,
    chunk CRCs, all five scanline filters, vectorized de-filter);
    JPEG via codecs/jpeg.py (baseline SOF0/SOF1 AND progressive SOF2,
    Huffman, 4:4:4/4:2:0, restart markers); WebP-lossless via
    codecs/vp8l.py (full VP8L: transforms, color cache, LZ77,
    meta-prefix groups); GIF via codecs/gif.py (LZW, interlace,
    transparency; animated files decode the first frame); BMP and ICO
    (favicons — largest entry, PNG or DIB payload) via codecs/bmp.py.
    Lossy-VP8 WebP and arithmetic-coded JPEG raise
    NotImplementedError — corpus kernels catch and skip, and
    ``fake_features`` remains the deterministic plumbing fallback.
    """
    b = bytes(payload)
    if b.startswith(b"\x89PNG\r\n\x1a\n"):
        from finetoo_sp_spark.codecs.png import decode_png

        return decode_png(b)
    if b.startswith(b"\xff\xd8"):
        from finetoo_sp_spark.codecs.jpeg import decode_jpeg

        return decode_jpeg(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from finetoo_sp_spark.codecs.vp8l import decode_webp

        return decode_webp(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        from finetoo_sp_spark.codecs.gif import decode_gif

        return decode_gif(b)
    if b[:2] == b"BM":
        from finetoo_sp_spark.codecs.bmp import decode_bmp

        return decode_bmp(b)
    if b[:4] == b"\x00\x00\x01\x00":
        from finetoo_sp_spark.codecs.bmp import decode_ico

        return decode_ico(b)
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        from finetoo_sp_spark.codecs.tiff import decode_tiff

        return decode_tiff(b)
    raise NotImplementedError(
        "unsupported image format (PNG, JPEG, and lossless WebP decode "
        "without a codec library); use fake_features (deterministic) "
        "for plumbing tests"
    )


def fake_features(payload: pd.Series, dim: int = FEATURE_DIM) -> pd.Series:
    """Deterministic pseudo-features: sha256(payload) bytes -> dim doubles
    in [0,1). Pure function of the bytes — stable across partitionings."""

    def feat(b: bytes) -> list[float]:
        d = hashlib.sha256(bytes(b)).digest()
        reps = (dim * 4 + len(d) - 1) // len(d)
        raw = (d * reps)[: dim * 4]
        arr = np.frombuffer(raw, dtype=np.uint32)[:dim]
        return (arr / np.float64(2**32)).tolist()

    return payload.map(feat)


def asset_metadata(assets: DataFrame) -> DataFrame:
    """(asset_id, modality, n_bytes, payload_sha) — pure JVM column ops;
    the scan never deserializes payloads into Python."""
    return assets.select(
        "asset_id",
        "modality",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
    )


def extract_features(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Arrow-batched feature extraction over (asset_id, modality, payload).

    Batch shape: one pandas DataFrame per Arrow batch; the kernel is
    vectorized over the batch (hashlib per element is the stub decode —
    a real codec would be vectorized the same way). Output keeps the
    metadata columns so downstream joins need no second scan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payload.map(len).astype("int64"),
                    "payload_sha": payload.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "features": fake_features(payload, dim),
                }
            )

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("channels", LongType(), False),
        StructField("sum_r", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_b", LongType(), False),
    ]
)


def image_stats(assets: DataFrame) -> DataFrame:
    """REAL image decode over the binary column: per asset, the decoded
    dimensions and exact per-channel pixel sums (integer sums, not
    means, so an external oracle reproduces them with no float-rounding
    ambiguity). Arrow-batched mapInPandas; payload bytes cross into
    Python once per batch, the decode routes by magic (PNG / baseline
    JPEG). Grayscale sums repeat the single channel across r/g/b.
    Undecodable payloads (progressive JPEG, corrupt bytes, unknown
    formats) are SKIPPED, never task-fatal — at corpus scale one bad
    payload must not kill a 10^12-row job.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    img = decode_image(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                h, w, ch = img.shape
                sums = img.reshape(-1, ch).sum(axis=0, dtype=np.int64)
                r, g, b = (
                    (sums[0], sums[1], sums[2]) if ch >= 3 else (sums[0], sums[0], sums[0])
                )
                recs.append((asset_id, w, h, ch, int(r), int(g), int(b)))
            yield pd.DataFrame(
                recs,
                columns=["asset_id", "width", "height", "channels", "sum_r", "sum_g", "sum_b"],
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (asset_id, frame_idx) rows for
    frames 0, n, 2n, ... based on a declared frame count column
    ``n_frames`` (decode stubbed; the explode/partition shape is real).
    """
    idx = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
    return assets.select("asset_id", F.explode(idx).alias("frame_idx"))


def resize_images(assets: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbor resize over the REAL decode path: decode the PNG
    payload, remap to an (out_h, out_w) grid with the pure-integer floor
    rule src = (dst * src_dim) // dst_dim, and emit the resized image's
    per-channel integer pixel sums.  The floor rule means an external
    oracle can reproduce the resized grid exactly from the pixel formula
    — no float coordinate ambiguity — which is what makes the resize
    verifiable, not just runnable.

    Arrow-batched mapInPandas like image_stats: payload bytes cross into
    Python once per batch; the index remap is two numpy take() calls.
    Downstream training pipelines consume resized tensors — the sums
    here are the verification surface for the same kernel.
    """
    if out_h <= 0 or out_w <= 0:
        raise ValueError("output dimensions must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    img = decode_image(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                h, w, ch = img.shape
                rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
                cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
                resized = img.take(rows, axis=0).take(cols, axis=1)
                sums = resized.reshape(-1, ch).sum(axis=0, dtype=np.int64)
                r, g, b = (
                    (sums[0], sums[1], sums[2]) if ch >= 3 else (sums[0], sums[0], sums[0])
                )
                recs.append((asset_id, out_w, out_h, ch, int(r), int(g), int(b)))
            yield pd.DataFrame(
                recs,
                columns=["asset_id", "width", "height", "channels", "sum_r", "sum_g", "sum_b"],
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("sample_rate", LongType(), False),
        StructField("channels", LongType(), False),
        StructField("bits", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("duration_ms", LongType(), False),
        StructField("sumsq", LongType(), False),
        StructField("peak", LongType(), False),
    ]
)


AUDIO_PROBE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("container", StringType(), False),
        StructField("sample_rate", LongType(), False),
        StructField("channels", LongType(), False),
        StructField("duration_ms", LongType(), False),
        StructField("bitrate_kbps", LongType(), False),
        StructField("vbr", BooleanType(), False),
    ]
)


def audio_probe(assets: DataFrame) -> DataFrame:
    """Header-only audio metadata over the binary column: codec
    container, sample rate, channels, exact duration and mean bitrate
    WITHOUT decoding any entropy data (codecs/probe.probe_audio_meta —
    MP3 frame-header walk incl. Xing/VBRI VBR detection, Ogg
    Vorbis/Opus id-header + closing granule position, WAV/FLAC header
    math). This is the curation fast path for crawled audio: bucket by
    codec/rate/length and drop sub-second clips BEFORE routing the
    survivors to the sample-exact decode kernels. One Arrow pass,
    O(headers) per asset; unrecognized/truncated payloads SKIP."""
    from finetoo_sp_spark.codecs.probe import ProbeError, probe_audio_meta

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    fmt, rate, ch, dur, kbps, vbr = probe_audio_meta(
                        bytes(payload)
                    )
                except (ProbeError, ValueError):
                    continue
                recs.append((asset_id, fmt, rate, ch, dur, kbps, vbr))
            yield pd.DataFrame(
                recs,
                columns=["asset_id", "container", "sample_rate",
                         "channels", "duration_ms", "bitrate_kbps", "vbr"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=AUDIO_PROBE_SCHEMA
    )


def audio_stats(assets: DataFrame) -> DataFrame:
    """REAL audio decode over the binary column: per asset, the PCM
    header fields plus exact integer energy (sum of squared samples
    across all channels) and peak |amplitude| — integer sums, like
    image_stats, so an external oracle reproduces them with no
    float-rounding ambiguity. duration_ms is integer-exact
    (n_frames * 1000 div rate).

    WAV/PCM decodes via the pure-stdlib codec (codecs/wav.py, numpy
    frombuffer — no per-sample Python); FLAC decodes via codecs/flac.py
    (lossless, so the same sample-exact stats apply), dispatched on the
    ``fLaC`` magic; lossy/compressed audio (MP3/Opus/...) raises inside
    the codec and is SKIPPED, never task-fatal.
    """
    from finetoo_sp_spark.codecs.flac import FlacError, decode_flac
    from finetoo_sp_spark.codecs.wav import WavError, decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    raw = bytes(payload)
                    decode = decode_flac if raw[:4] == b"fLaC" else decode_wav
                    rate, ch, bits, samples = decode(raw)
                except (FlacError, WavError, ValueError):
                    continue
                s64 = samples.astype(np.int64)
                recs.append(
                    (
                        asset_id,
                        rate,
                        ch,
                        bits,
                        samples.shape[0],
                        samples.shape[0] * 1000 // rate,
                        int((s64 * s64).sum()),
                        int(np.abs(s64).max(initial=0)),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id", "sample_rate", "channels", "bits",
                    "n_samples", "duration_ms", "sumsq", "peak",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=AUDIO_STATS_SCHEMA
    )


DHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("dhash", LongType(), False),
    ]
)


def image_dhash(assets: DataFrame) -> DataFrame:
    """(asset_id, dhash: bigint) — 64-bit difference hash over the REAL
    decode path: decode, nearest-neighbor sample to an 8x9 grid with the
    integer floor rule (src = dst*src_dim // dst_dim), integer grayscale
    gray = (r+g+b) // 3, bit (row, col) = gray[row][col] >
    gray[row][col+1], packed at index row*8+col (bit 63 wraps to the
    sign bit, same convention as SimHash fingerprints).

    dHash is the standard perceptual near-dup key for image corpora
    (brightness-shift invariant by construction: a constant luma offset
    flips only comparisons that straddle a wrap). Every step is integer
    arithmetic, so an external oracle can recompute each hash from the
    synthesis pixel formula alone. Arrow-batched mapInPandas; the grid
    sample is two numpy take() calls; undecodable payloads are skipped,
    never task-fatal.
    """
    gh, gw = 8, 9

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    img = decode_image(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                h, w, ch = img.shape
                rows = (np.arange(gh, dtype=np.int64) * h) // gh
                cols = (np.arange(gw, dtype=np.int64) * w) // gw
                grid = img.take(rows, axis=0).take(cols, axis=1).astype(np.int64)
                gray = grid[:, :, :3].sum(axis=2) // 3 if ch >= 3 else grid[:, :, 0]
                bits = (gray[:, :-1] > gray[:, 1:]).astype(np.uint64).reshape(-1)
                dh = int((bits * weights).sum(dtype=np.uint64).astype(np.int64))
                recs.append((asset_id, dh))
            yield pd.DataFrame(recs, columns=["asset_id", "dhash"])

    return assets.select("asset_id", "payload").mapInPandas(run, schema=DHASH_SCHEMA)


def dhash_pairs(
    hashes: DataFrame, max_hamming: int = 7, bucket_cap: int | None = 10_000
) -> DataFrame:
    """(id_a, id_b, hamming) — image near-dup pairs from dHash values by
    pigeonhole banding (identical machinery to text SimHash pairs:
    max_hamming+1 bands guarantee every pair within distance d shares an
    exact band; verify with bit_count(xor); hot buckets salt-split past
    ``bucket_cap``). The decode kernel runs once per image; the pair
    join runs on 8-byte fingerprints only — at 100 TB the image bytes
    never shuffle.
    """
    from finetoo_sp_spark.operators.dedup import _bucket_self_pairs

    nb = max_hamming + 1
    width = 64 // nb
    banded = hashes.select(
        F.col("asset_id").alias("id"),
        F.col("dhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftrightunsigned("dhash", bi * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bits"),
                    )
                    for bi in range(nb)
                ]
            )
        ).alias("bb"),
    ).select("id", "dhash", "bb.band", "bb.bits")
    pairs = _bucket_self_pairs(
        banded, ["band", "bits"], payload_cols=["dhash"], bucket_cap=bucket_cap
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.bit_count(F.col("dhash_a").bitwiseXOR(F.col("dhash_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


VIDEO_META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("major_brand", StringType(), False),
        StructField("timescale", LongType(), False),
        StructField("duration_ticks", LongType(), False),
        StructField("duration_ms", LongType(), False),
        StructField("n_tracks", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("video_codec", StringType(), False),
    ]
)


def video_metadata(assets: DataFrame) -> DataFrame:
    """REAL ISO-BMFF container parse over the binary column: per asset
    the ftyp brand, mvhd timescale/duration (duration_ms integer-exact,
    ticks * 1000 div timescale), track count, and the first video
    track's geometry + sample-entry codec fourcc. This is the metadata a
    curation pipeline filters on (drop sub-second clips, keep avc1/av01,
    bucket by resolution) — frame PAYLOAD decode would need a video
    entropy codec (H.264/AV1) and stays behind the NotImplementedError
    gate. Malformed containers are SKIPPED, never task-fatal.

    Scale: one Arrow batch pass, header-only parse (struct over the
    first few hundred bytes; the mdat payload is never touched), no
    shuffle.
    """
    from finetoo_sp_spark.codecs.mp4 import Mp4Error, decode_mp4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    meta = decode_mp4(bytes(payload))
                except (Mp4Error, ValueError, IndexError, EOFError):
                    continue
                vid = next(
                    (t for t in meta["tracks"] if t["handler"] == "vide"), None
                )
                recs.append(
                    (
                        asset_id,
                        meta["major_brand"],
                        meta["timescale"],
                        meta["duration"],
                        meta["duration"] * 1000 // meta["timescale"],
                        len(meta["tracks"]),
                        vid["width"] if vid else 0,
                        vid["height"] if vid else 0,
                        (vid["codec"] or "") if vid else "",
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id", "major_brand", "timescale", "duration_ticks",
                    "duration_ms", "n_tracks", "width", "height", "video_codec",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=VIDEO_META_SCHEMA
    )


DIMS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("format", StringType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
    ]
)


def image_dimensions(assets: DataFrame) -> DataFrame:
    """Header-only format + dimension probe (codecs/probe.py) across
    PNG/JPEG/GIF/WebP — the pre-decode gate a crawl pipeline filters on
    (drop trackers/icons, route formats, bucket by resolution). Covers
    formats whose full decode is out of scope (GIF, WebP, progressive
    JPEG) because only the header is read; unrecognized payloads are
    SKIPPED, never task-fatal. One Arrow pass, no shuffle."""
    from finetoo_sp_spark.codecs.probe import ProbeError, probe_image_dims

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    fmt, w, h = probe_image_dims(bytes(payload))
                except (ProbeError, ValueError, struct_error):
                    continue
                recs.append((asset_id, fmt, w, h))
            yield pd.DataFrame(recs, columns=["asset_id", "format", "width", "height"])

    return assets.select("asset_id", "payload").mapInPandas(run, schema=DIMS_SCHEMA)


def frame_sample_times(assets: DataFrame, interval_ms: int = 500) -> DataFrame:
    """Time-based video frame sampling driven by the REAL container
    parse: probe each MP4's mvhd duration (video_metadata), then emit
    one (asset_id, sample_idx, ts_ms) row per ``interval_ms`` — the
    work-list a frame-decode stage would map over (the decode itself
    needs an entropy codec and stays stubbed). The explode is bounded
    by duration/interval, stays JVM-side (sequence + explode), and
    partitions by asset like any downstream decode batch would need."""
    meta = video_metadata(assets).select("asset_id", "duration_ms")
    ts = F.explode(
        F.sequence(F.lit(0), F.col("duration_ms"), F.lit(int(interval_ms)))
    ).alias("ts_ms")
    return meta.select("asset_id", ts).select(
        "asset_id",
        (F.col("ts_ms") / F.lit(int(interval_ms))).cast("long").alias("sample_idx"),
        F.col("ts_ms").cast("long").alias("ts_ms"),
    )


GIF_ANIM_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("loop_count", LongType(), False),
        StructField("duration_cs", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("sum_gray", LongType(), False),
    ]
)


def gif_animation_stats(assets: DataFrame) -> DataFrame:
    """REAL animated-GIF decode over the binary column: per asset the
    frame count, NETSCAPE loop count (-1 when absent, 0 = forever),
    total declared duration in centiseconds, logical-screen geometry
    and the exact integer gray sum (R channel) over ALL composited
    frames — so disposal handling (leave / restore-background /
    restore-previous), transparency compositing and local color tables
    are pinned by an external oracle, not just frame 1. Arrow-batched
    mapInPandas like image_stats; undecodable payloads are SKIPPED,
    never task-fatal. Still images are 1-frame animations (loop -1).
    """
    from finetoo_sp_spark.codecs.gif import decode_gif_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    frames, delays, loop = decode_gif_frames(bytes(payload))
                except (ValueError, NotImplementedError, IndexError, struct_error):
                    continue
                sh, sw = frames[0].shape[:2]
                total = sum(int(f[:, :, 0].sum(dtype=np.int64)) for f in frames)
                recs.append(
                    (asset_id, len(frames), loop, sum(delays), sw, sh, total)
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id", "n_frames", "loop_count", "duration_cs",
                    "width", "height", "sum_gray",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema=GIF_ANIM_SCHEMA)


WEBP_ANIM_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("loop_count", LongType(), False),
        StructField("duration_ms", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("sum_gray", LongType(), False),
    ]
)


def webp_animation_stats(assets: DataFrame) -> DataFrame:
    """REAL animated-WebP decode over the binary column — the VP8X/
    ANIM/ANMF twin of gif_animation_stats: per asset the frame count,
    ANIM loop count (-1 for stills, 0 = forever), total declared
    duration in milliseconds, canvas geometry and the exact integer
    gray sum (R channel) over ALL composited frames, so sub-frame
    placement, alpha-blend vs overwrite, and dispose-to-background are
    pinned by an external oracle. Arrow-batched mapInPandas;
    undecodable payloads (lossy VP8, garbage) are SKIPPED, never
    task-fatal."""
    from finetoo_sp_spark.codecs.vp8l import decode_webp_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    frames, durs, loop = decode_webp_frames(bytes(payload))
                except (ValueError, NotImplementedError, IndexError,
                        struct_error):
                    continue
                ch, cw = frames[0].shape[:2]
                total = sum(
                    int(f[:, :, 0].sum(dtype=np.int64)) for f in frames
                )
                recs.append(
                    (asset_id, len(frames), loop, sum(durs), cw, ch, total)
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id", "n_frames", "loop_count", "duration_ms",
                    "width", "height", "sum_gray",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=WEBP_ANIM_SCHEMA
    )


APNG_ANIM_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("loop_count", LongType(), False),
        StructField("duration_ms", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("sum_gray", LongType(), False),
    ]
)


def apng_animation_stats(assets: DataFrame) -> DataFrame:
    """REAL APNG decode over the binary column — the acTL/fcTL/fdAT
    twin of gif_animation_stats and webp_animation_stats: per asset the
    frame count, acTL num_plays (-1 for plain PNGs, 0 = forever), total
    declared duration in milliseconds (floor of delay_num*1000/
    delay_den per frame, den 0 -> 100 per spec), canvas geometry and the
    exact integer gray sum (R channel) over ALL composited frames — so
    dispose none/background/previous, source-vs-over blending, hidden
    default images and fdAT sequence numbering are pinned by an
    external oracle. Arrow-batched mapInPandas; undecodable payloads
    are SKIPPED, never task-fatal."""
    from finetoo_sp_spark.codecs.apng import decode_apng_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    frames, delays, plays = decode_apng_frames(bytes(payload))
                except (ValueError, NotImplementedError, IndexError,
                        struct_error, zlib_error):
                    continue
                ch, cw = frames[0].shape[:2]
                dur = sum(
                    (num * 1000) // (den if den else 100)
                    for num, den in delays
                )
                total = sum(
                    int(f[:, :, 0].sum(dtype=np.int64)) for f in frames
                )
                recs.append(
                    (asset_id, len(frames), plays, dur, cw, ch, total)
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id", "n_frames", "loop_count", "duration_ms",
                    "width", "height", "sum_gray",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=APNG_ANIM_SCHEMA
    )


SAMPLE_TABLE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("sample_idx", LongType(), False),
        StructField("dts_ticks", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("mdat_offset", LongType(), False),
        StructField("is_sync", BooleanType(), False),
    ]
)


def video_sample_table(assets: DataFrame) -> DataFrame:
    """Per-sample fetch work list from the REAL ISO-BMFF sample tables
    (stts/stsz/stsc/stco/co64/stss via codecs.mp4.decode_sample_table):
    one row per video sample with its timestamp, byte length, offset
    into the mdat payload and keyframe flag — exactly what a
    distributed frame extractor joins against byte-range reads before
    any codec work (the decode itself stays behind the documented
    NotImplementedError gate). Arrow-batched mapInPandas; assets
    without a resolvable sample table are SKIPPED, never task-fatal."""
    from finetoo_sp_spark.codecs.mp4 import Mp4Error, decode_sample_table

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    rows = decode_sample_table(bytes(payload))
                except (Mp4Error, ValueError, struct_error, IndexError):
                    continue
                for r in rows:
                    recs.append(
                        (
                            asset_id,
                            r["sample_idx"],
                            r["dts_ticks"],
                            r["size"],
                            r["mdat_offset"],
                            bool(r["is_sync"]),
                        )
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id", "sample_idx", "dts_ticks", "n_bytes",
                    "mdat_offset", "is_sync",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=SAMPLE_TABLE_SCHEMA
    )


EXIF_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("orientation", LongType(), True),
        StructField("make", StringType(), False),
        StructField("model", StringType(), False),
        StructField("dt", StringType(), False),
        StructField("dt_original", StringType(), False),
        StructField("has_gps", BooleanType(), False),
        StructField("gps_lat_micro", LongType(), True),
        StructField("gps_lon_micro", LongType(), True),
    ]
)


def image_exif(assets: DataFrame) -> DataFrame:
    """EXIF camera/orientation/timestamp/GPS metadata per JPEG asset
    (codecs/exif.py): the curation signals real photo corpora filter
    on, with GPS as signed integer micro-degrees. Arrow-batched
    mapInPandas; assets without EXIF yield absent fields, corrupt APP1
    segments are SKIPPED."""
    from finetoo_sp_spark.codecs.exif import ExifError, parse_exif_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    m = parse_exif_jpeg(bytes(payload))
                except (ExifError, struct_error):
                    continue
                recs.append(
                    (
                        asset_id, m["orientation"], m["make"], m["model"],
                        m["datetime"], m["datetime_original"], m["has_gps"],
                        m["gps_lat_micro"], m["gps_lon_micro"],
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id", "orientation", "make", "model", "dt",
                    "dt_original", "has_gps", "gps_lat_micro",
                    "gps_lon_micro",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=EXIF_SCHEMA
    )


REDACT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("had_gps", BooleanType(), False),
        StructField("has_gps_after", BooleanType(), False),
        StructField("orientation", LongType(), True),
        StructField("make", StringType(), False),
        StructField("same_length", BooleanType(), False),
    ]
)


def gps_redaction_report(assets: DataFrame) -> DataFrame:
    """Parse -> scrub -> re-parse in ONE Arrow pass: per asset whether
    GPS existed, whether any survives the in-place scrub (must never),
    that non-GPS EXIF is intact and that the payload length is
    unchanged (the streaming-safe property). The image-side PII gate."""
    from finetoo_sp_spark.codecs.exif import (
        ExifError,
        parse_exif_jpeg,
        strip_gps_jpeg,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                try:
                    before = parse_exif_jpeg(raw)
                    scrubbed = strip_gps_jpeg(raw)
                    after = parse_exif_jpeg(scrubbed)
                except (ExifError, struct_error):
                    continue
                recs.append(
                    (
                        asset_id,
                        before["has_gps"],
                        after["has_gps"],
                        after["orientation"],
                        after["make"],
                        len(scrubbed) == len(raw),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id", "had_gps", "has_gps_after", "orientation",
                    "make", "same_length",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=REDACT_SCHEMA
    )


ORIENTED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("orientation", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("row0_sum", LongType(), False),
        StructField("col0_sum", LongType(), False),
        StructField("total_sum", LongType(), False),
    ]
)


def image_oriented_stats(assets: DataFrame) -> DataFrame:
    """Decode + EXIF AUTO-ORIENTATION in one Arrow pass: the same photo
    bytes can carry any of the 8 orientation tags, and every
    presentation-side op (dHash, thumbnails, crops) must bake the
    rotation in first. Per asset: the oriented geometry, first-row /
    first-column channel-0 sums (together they DISTINGUISH all 8
    transforms — the total sum alone is rotation-invariant) and the
    invariant total. Assets without EXIF orient as 1. Undecodable
    payloads are SKIPPED, never task-fatal."""
    from finetoo_sp_spark.codecs.exif import (
        ExifError,
        apply_orientation,
        parse_exif_jpeg,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                try:
                    img = decode_image(raw)
                    o = parse_exif_jpeg(raw)["orientation"] or 1
                    out = apply_orientation(img, o)
                except (ValueError, NotImplementedError, ExifError):
                    continue
                h, w = out.shape[:2]
                recs.append(
                    (
                        asset_id, o, w, h,
                        int(out[0, :, 0].sum(dtype=np.int64)),
                        int(out[:, 0, 0].sum(dtype=np.int64)),
                        int(out[:, :, 0].sum(dtype=np.int64)),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id", "orientation", "width", "height",
                    "row0_sum", "col0_sum", "total_sum",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=ORIENTED_SCHEMA
    )


ID3_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("id3_version", LongType(), False),
        StructField("title", StringType(), False),
        StructField("artist", StringType(), False),
        StructField("album", StringType(), False),
    ]
)


def audio_id3_meta(assets: DataFrame) -> DataFrame:
    """ID3v2 title/artist/album per audio asset (codecs/probe.py
    parse_id3v2) — the catalog metadata an audio-curation index keys
    on. Arrow-batched mapInPandas; tagless assets report version 0 and
    empty fields, corrupt tags are SKIPPED."""
    from finetoo_sp_spark.codecs.probe import parse_id3v2

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    m = parse_id3v2(bytes(payload))
                except ValueError:
                    continue
                recs.append(
                    (asset_id, m["version"], m["title"], m["artist"], m["album"])
                )
            yield pd.DataFrame(
                recs,
                columns=["asset_id", "id3_version", "title", "artist", "album"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=ID3_SCHEMA
    )


TAGS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("container", StringType(), False),
        StructField("title", StringType(), False),
        StructField("artist", StringType(), False),
        StructField("album", StringType(), False),
    ]
)


def audio_tags(assets: DataFrame) -> DataFrame:
    """Unified catalog tags across audio containers: ID3v2 for MP3
    payloads, VorbisComment for FLAC — one (title, artist, album) row
    per asset regardless of container, the shape an audio-curation
    index actually joins on. Arrow-batched; untagged assets report
    empty fields, corrupt tags are SKIPPED."""
    from finetoo_sp_spark.codecs.flac import parse_flac_tags
    from finetoo_sp_spark.codecs.probe import parse_id3v2

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                try:
                    if raw[:4] == b"fLaC":
                        m = parse_flac_tags(raw)
                        recs.append(
                            (asset_id, "flac", m["title"], m["artist"], m["album"])
                        )
                    else:
                        m = parse_id3v2(raw)
                        recs.append(
                            (asset_id, "mp3", m["title"], m["artist"], m["album"])
                        )
                except ValueError:
                    continue
            yield pd.DataFrame(
                recs,
                columns=["asset_id", "container", "title", "artist", "album"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=TAGS_SCHEMA
    )


PHOTO_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("make", StringType(), False),
        StructField("orientation", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("had_gps", BooleanType(), False),
        StructField("scrub_ok", BooleanType(), False),
    ]
)


def photo_report(assets: DataFrame) -> DataFrame:
    """The photo-ingest pass a responsible image corpus runs per asset,
    in ONE Arrow kernel: decode, read EXIF, apply auto-orientation to
    the geometry, scrub GPS in place and verify the scrub (nothing
    survives, length unchanged). Emits the per-asset facts the curation
    policy and the per-make rollup consume; undecodable or
    corrupt-EXIF assets are SKIPPED."""
    from finetoo_sp_spark.codecs.exif import (
        ExifError,
        apply_orientation,
        parse_exif_jpeg,
        strip_gps_jpeg,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                try:
                    img = decode_image(raw)
                    meta = parse_exif_jpeg(raw)
                    o = meta["orientation"] or 1
                    oriented = apply_orientation(img, o)
                    scrubbed = strip_gps_jpeg(raw)
                    after = parse_exif_jpeg(scrubbed)
                except (ValueError, NotImplementedError, ExifError):
                    continue
                h, w = oriented.shape[:2]
                recs.append(
                    (
                        asset_id, meta["make"], o, w, h, meta["has_gps"],
                        (not after["has_gps"]) and len(scrubbed) == len(raw),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id", "make", "orientation", "width", "height",
                    "had_gps", "scrub_ok",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=PHOTO_SCHEMA
    )
