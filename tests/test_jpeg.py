"""Baseline JPEG codec (codecs/jpeg.py) + multimodal routing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from finetoo_sp_spark.codecs.jpeg import (
    QUANT_LUMA,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg_baseline,
)


def test_flat_block_grayscale_exact_standard_tables():
    """The oracle-backing exactness property: block-flat gray images
    with even offsets from 128 round-trip bit-exactly under the
    STANDARD quant tables (flat block -> DC-only FDCT, DC = 8*(v-128)
    divisible by the DC step 16)."""
    rng = np.random.default_rng(42)
    for _ in range(5):
        bh, bw = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        vals = 128 + 2 * rng.integers(-25, 26, (bh, bw))
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
        out = decode_jpeg(encode_jpeg_baseline(img))
        assert out.shape == (bh * 8, bw * 8, 1)
        assert (out[:, :, 0] == img).all()


def test_lossy_roundtrip_is_close_and_deterministic():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    enc = encode_jpeg_baseline(img)
    assert enc == encode_jpeg_baseline(img)  # byte-deterministic
    out = decode_jpeg(enc)[:, :, 0]
    assert (decode_jpeg(enc)[:, :, 0] == out).all()  # decode-deterministic
    # random noise is JPEG's worst case; bound the damage loosely
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 40


def _independent_idct(coef: np.ndarray) -> np.ndarray:
    """Textbook double-sum IDCT (T.81 A.3.3), written independently of
    the codec's matrix formulation — the cross-check for entropy tests."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1.0 / np.sqrt(2.0) if u == 0 else 1.0
                    cv = 1.0 / np.sqrt(2.0) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4.0
    return out


def test_ac_coefficients_through_entropy_layer():
    """Exercise nonzero ACs, zero runs, and EOB: craft a pixel block
    whose quantized coefficients are KNOWN (build it as the rounded
    IDCT of chosen dequantized coefficients with an all-8 quant table,
    then verify the decoder reproduces clip(round(IDCT(coeffs)))+128
    computed by an independent double-sum IDCT)."""
    q8 = np.full((8, 8), 8, dtype=np.int32)
    coef = np.zeros((8, 8))
    coef[0, 0] = 160.0  # DC
    coef[0, 1] = 48.0   # a few low-freq ACs, exact multiples of 8
    coef[1, 0] = -40.0
    coef[2, 3] = 24.0
    coef[5, 5] = -16.0
    pixels = np.clip(np.round(_independent_idct(coef)) + 128, 0, 255).astype(np.uint8)
    enc = encode_jpeg_baseline(pixels, quant_luma=q8)
    out = decode_jpeg(enc)[:, :, 0]
    # the encoder re-derives coefficients from the ROUNDED pixels, so
    # compare against a full independent model of that same pipeline:
    # FDCT(pixels-128) -> /8 round -> *8 -> IDCT -> round+128+clip
    def fdct_ind(block):
        out_ = np.zeros((8, 8))
        f = block.astype(np.float64) - 128.0
        for u in range(8):
            for v in range(8):
                cu = 1.0 / np.sqrt(2.0) if u == 0 else 1.0
                cv = 1.0 / np.sqrt(2.0) if v == 0 else 1.0
                s = 0.0
                for x in range(8):
                    for y in range(8):
                        s += (
                            f[x, y]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                out_[u, v] = cu * cv * s / 4.0
        return out_
    qc = np.round(fdct_ind(pixels) / 8.0)
    assert qc[0, 1] != 0 and qc[1, 0] != 0  # ACs really exercised
    expected = np.clip(np.round(_independent_idct(qc * 8.0)) + 128, 0, 255)
    assert (out == expected).all()


def test_rgb_flat_closed_form_444_and_420():
    """Flat RGB: chroma is constant so 4:2:0 subsampling is lossless;
    with a DC-step-8 table the whole path reduces to the JFIF color
    equations, computed here independently."""
    q8 = np.full((8, 8), 8, dtype=np.int32)
    for rgb in [(10, 200, 77), (255, 0, 128), (0, 0, 0), (255, 255, 255)]:
        r, g, b = map(float, rgb)
        y = np.clip(round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        cb = np.clip(round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128), 0, 255)
        cr = np.clip(round(0.5 * r - 0.418688 * g - 0.081312 * b + 128), 0, 255)
        exp = (
            np.clip(round(y + 1.402 * (cr - 128)), 0, 255),
            np.clip(round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255),
            np.clip(round(y + 1.772 * (cb - 128)), 0, 255),
        )
        img = np.full((16, 16, 3), rgb, dtype=np.uint8)
        for sub in ("444", "420"):
            out = decode_jpeg(
                encode_jpeg_baseline(img, subsampling=sub, quant_luma=q8, quant_chroma=q8)
            )
            assert out.shape == (16, 16, 3)
            assert (out == out[0, 0]).all(), sub
            assert tuple(out[0, 0]) == exp, (rgb, sub, tuple(out[0, 0]), exp)


def test_restart_markers_roundtrip():
    rng = np.random.default_rng(3)
    vals = 128 + 2 * rng.integers(-20, 21, (3, 5))
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img, restart_interval=2))
    assert (out[:, :, 0] == img).all()


def test_non_multiple_of_8_dims():
    """Edge-replicate padding: odd dims decode back at the declared
    size; the visible region of a flat image stays exact."""
    img = np.full((13, 21), 150, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img))
    assert out.shape == (13, 21, 1)
    assert (out[:, :, 0] == 150).all()


def test_arithmetic_and_malformed_raise():
    # arithmetic-coded progressive (SOF10) stays a clean skip signal
    arith = b"\xff\xd8\xff\xca" + struct.pack(">H", 8) + b"\x08\x00\x10\x00\x10\x01"
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(arith)
    # a truncated SOF2 header with no scan is malformed, not "supported"
    prog_stub = b"\xff\xd8\xff\xc2" + struct.pack(">H", 8) + b"\x08\x00\x10\x00\x10\x01"
    with pytest.raises(ValueError, match="truncated SOF|no scan"):
        decode_jpeg(prog_stub)
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(ValueError):
        decode_jpeg(b"GIF87a not a jpeg")


def test_quant_tables_written_in_zigzag():
    """DQT payloads carry zigzag order per T.81; decoding our own
    stream must recover the natural-order table."""
    img = np.full((8, 8), 130, dtype=np.uint8)
    enc = encode_jpeg_baseline(img)
    i = enc.find(b"\xff\xdb")
    z = np.frombuffer(enc[i + 5 : i + 69], dtype=np.uint8).astype(np.int32)
    nat = np.zeros(64, dtype=np.int32)
    nat[ZIGZAG] = z
    assert (nat.reshape(8, 8) == QUANT_LUMA).all()


def test_16bit_quant_tables_roundtrip():
    """Pq=1 DQT (big-endian 16-bit entries, T.81 B.2.4.1): forced via
    the encoder knob AND auto-escalated when a step exceeds 255; the
    DC-exact flat-block construction stays lossless either way, for
    both baseline and progressive streams."""
    from finetoo_sp_spark.codecs.jpeg import encode_jpeg_progressive

    ql = QUANT_LUMA.copy()
    ql[0, 0] = 8       # DC step divides 8*(v-128) for even v
    ql[7, 7] = 300     # needs 16-bit storage
    vals = (128 + 2 * (((np.arange(2)[:, None] * 7
                         + np.arange(3)[None, :] * 13) % 50) - 25))
    img = np.repeat(np.repeat(vals.astype(np.uint8), 8, 0), 8, 1)
    for enc_fn in (encode_jpeg_baseline, encode_jpeg_progressive):
        enc = enc_fn(img, quant_luma=ql, quant_16bit=True)
        i = enc.find(b"\xff\xdb")
        assert enc[i + 4] >> 4 == 1  # Pq=1 on the wire
        out = decode_jpeg(enc)
        out = out[:, :, 0] if out.ndim == 3 else out
        assert np.array_equal(out, img)
    # auto-escalation without the knob: any entry > 255 forces Pq=1
    enc = encode_jpeg_baseline(img, quant_luma=ql)
    i = enc.find(b"\xff\xdb")
    assert enc[i + 4] >> 4 == 1
    # forced 16-bit storage of an all-small table is also legal
    enc = encode_jpeg_baseline(img, quant_16bit=True)
    out = decode_jpeg(enc)
    out = out[:, :, 0] if out.ndim == 3 else out
    assert out.shape == img.shape


def test_decode_image_routes_jpeg_and_kernel_skips(spark):
    """Magic routing + corpus-kernel resilience: a mixed asset frame of
    PNGs, baseline JPEGs, one progressive JPEG, and one corrupt payload
    yields stats for the decodable assets and SKIPS the rest (no task
    death)."""
    from finetoo_sp_spark.codecs.png import encode_png
    from finetoo_sp_spark.multimodal import decode_image, image_stats

    gray = np.full((16, 16), 140, dtype=np.uint8)
    jpg = encode_jpeg_baseline(gray)
    assert (decode_image(jpg)[:, :, 0] == gray).all()

    png_img = (np.arange(4 * 5 * 3) % 256).astype(np.uint8).reshape(4, 5, 3)
    # truncated progressive header (no scan data): undecodable, skipped
    prog = b"\xff\xd8\xff\xc2" + struct.pack(">H", 8) + b"\x08\x00\x10\x00\x10\x01"
    rows = [
        (0, "image", bytearray(encode_png(png_img))),
        (1, "image", bytearray(jpg)),
        (2, "image", bytearray(prog)),       # truncated: skipped
        (3, "image", bytearray(b"\x89PNG garbage")),  # corrupt: skipped
    ]
    assets = spark.createDataFrame(rows, "asset_id long, modality string, payload binary")
    got = {r["asset_id"]: r for r in image_stats(assets).collect()}
    assert set(got) == {0, 1}
    assert (got[0]["width"], got[0]["height"], got[0]["channels"]) == (5, 4, 3)
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (16, 16, 1)
    assert got[1]["sum_r"] == 140 * 16 * 16


def test_progressive_matches_baseline_pixels_exactly():
    """Successive approximation is lossless over the quantized
    coefficients: once all scans land, a progressive file decodes to
    EXACTLY the baseline pixels for the same input and tables."""
    from finetoo_sp_spark.codecs.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    cases = [
        (np.full((16, 16), 140, dtype=np.uint8), {}),
        (rng.integers(0, 256, (24, 17), dtype=np.uint8), {}),
        (rng.integers(0, 256, (33, 29, 3), dtype=np.uint8), {}),
        (rng.integers(0, 256, (37, 21, 3), dtype=np.uint8), {"subsampling": "420"}),
    ]
    for img, kw in cases:
        b = decode_jpeg(encode_jpeg_baseline(img, **kw))
        p = decode_jpeg(encode_jpeg_progressive(img, **kw))
        assert b.shape == p.shape
        assert (b == p).all(), (img.shape, kw)


def test_progressive_flat_gray_exact_standard_tables():
    """The DC-only closed-form exactness property (flat block, DC a
    multiple of the quant step) holds through the multi-scan path too."""
    from finetoo_sp_spark.codecs.jpeg import encode_jpeg_progressive

    img = np.full((16, 16), 140, dtype=np.uint8)  # 8*(140-128)=96=6*16
    out = decode_jpeg(encode_jpeg_progressive(img))
    assert out.shape == (16, 16, 1)
    assert (out[:, :, 0] == 140).all()


def test_progressive_custom_scan_scripts():
    """Spectral-selection-only, deep successive approximation, and
    chroma-first scripts all reconstruct the baseline pixels (the
    decoder accumulates scans in any legal order)."""
    from finetoo_sp_spark.codecs.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 40), dtype=np.uint8)
    b = decode_jpeg(encode_jpeg_baseline(img))
    scripts = [
        [([0], 0, 0, 0, 0), ([0], 1, 10, 0, 0), ([0], 11, 63, 0, 0)],
        [([0], 0, 0, 0, 3), ([0], 0, 0, 3, 2), ([0], 0, 0, 2, 1),
         ([0], 0, 0, 1, 0), ([0], 1, 63, 0, 3), ([0], 1, 63, 3, 2),
         ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0)],
    ]
    for sc in scripts:
        assert (decode_jpeg(encode_jpeg_progressive(img, scans=sc)) == b).all()
    img3 = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    sc = [([0, 1, 2], 0, 0, 0, 0), ([2], 1, 63, 0, 0),
          ([0], 1, 63, 0, 0), ([1], 1, 63, 0, 0)]
    assert (
        decode_jpeg(encode_jpeg_progressive(img3, scans=sc))
        == decode_jpeg(encode_jpeg_baseline(img3))
    ).all()


def test_progressive_flows_through_image_stats_kernel(spark):
    """Progressive files are no longer skipped: a real SOF2 payload
    yields the same stats row a baseline encoding of the same image
    does."""
    from finetoo_sp_spark.codecs.jpeg import encode_jpeg_progressive
    from finetoo_sp_spark.multimodal import image_stats

    gray = np.full((16, 16), 140, dtype=np.uint8)
    rows = [
        (0, "image", bytearray(encode_jpeg_baseline(gray))),
        (1, "image", bytearray(encode_jpeg_progressive(gray))),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, modality string, payload binary"
    )
    got = {r["asset_id"]: r for r in image_stats(assets).collect()}
    assert set(got) == {0, 1}
    for i in (0, 1):
        assert (got[i]["width"], got[i]["height"], got[i]["channels"]) == (16, 16, 1)
        assert got[i]["sum_r"] == 140 * 16 * 16


def test_progressive_restart_markers():
    """Restart markers inside progressive scans (DC predictor and
    EOB-run state reset at every RSTn boundary, runs never cross it)
    reconstruct the exact baseline pixels."""
    from finetoo_sp_spark.codecs.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(21)
    for img, kw in [
        (rng.integers(0, 256, (24, 24), dtype=np.uint8), {}),
        (rng.integers(0, 256, (32, 32, 3), dtype=np.uint8),
         {"subsampling": "420"}),
        (np.full((32, 16), 140, dtype=np.uint8), {}),
    ]:
        b = decode_jpeg(encode_jpeg_baseline(img, **kw))
        for ri in (1, 2, 3):
            p = decode_jpeg(
                encode_jpeg_progressive(img, restart_interval=ri, **kw)
            )
            assert (b == p).all(), (img.shape, kw, ri)
    # the stream really carries RST markers
    blob = encode_jpeg_progressive(
        rng.integers(0, 256, (24, 24), dtype=np.uint8), restart_interval=2
    )
    assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))


def test_cmyk_roundtrip_and_ycck_path():
    import numpy as np

    from finetoo_sp_spark.codecs.jpeg import decode_jpeg, encode_jpeg_cmyk

    i = 9
    bw, bh = 3, 2
    br = np.arange(bh)[:, None]
    bc = np.arange(bw)[None, :]

    def stored(p):
        return 128 + 2 * (((i + 7 * br + 13 * bc + 17 * p) % 50) - 25)

    cmyk = np.stack(
        [255 - np.repeat(np.repeat(stored(p), 8, 0), 8, 1) for p in range(4)],
        axis=2,
    ).astype(np.uint8)
    s = [np.repeat(np.repeat(stored(p), 8, 0), 8, 1).astype(np.int64) for p in range(4)]
    exp = np.stack(
        [s[0] * s[3] // 255, s[1] * s[3] // 255, s[2] * s[3] // 255], axis=2
    )
    for ri in (0, 2):
        got = decode_jpeg(encode_jpeg_cmyk(cmyk, restart_interval=ri))
        assert got.shape == (16, 24, 3) and (got == exp).all(), ri

    # YCCK (transform 2): flip the APP14 transform byte; with flat
    # Cb=Cr=128 planes the YCbCr equations are identity on Y, so a
    # gray CMY (all planes equal) + K file decodes identically.
    gray = np.stack(
        [255 - np.repeat(np.repeat(stored(0), 8, 0), 8, 1)] * 3
        + [255 - np.repeat(np.repeat(stored(3), 8, 0), 8, 1)],
        axis=2,
    ).astype(np.uint8)
    data = bytearray(encode_jpeg_cmyk(gray))
    j = bytes(data).find(b"Adobe")
    # transform byte is the 12th byte of the Adobe payload
    assert data[j + 11] == 0
    data[j + 11] = 2
    got = decode_jpeg(bytes(data))
    # stored CMY planes equal -> R=G=B... but YCCK routes them through
    # the YCbCr equations: Y=s, Cb=Cr=s -> r = s + 1.402*(s-128) etc.
    # Just assert the path runs and yields the right geometry + dtype.
    assert got.shape == (16, 24, 3) and got.dtype == np.uint8


def test_five_component_rejected():
    import numpy as np
    import pytest

    from finetoo_sp_spark.codecs.jpeg import decode_jpeg, encode_jpeg_cmyk

    data = bytearray(
        encode_jpeg_cmyk(np.full((8, 8, 4), 100, np.uint8))
    )
    with pytest.raises(ValueError):
        # corrupting SOF nc to 5 must not decode as something else
        j = bytes(data).find(b"\xff\xc0")
        data[j + 9] = 5
        decode_jpeg(bytes(data))
