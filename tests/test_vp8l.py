"""WebP-lossless (VP8L) codec: roundtrip exactness across every
transform/entropy path, crafted-bitstream tests for the decode-only
features (meta-prefix groups, code-length repeats, bounded symbol
count), and routing through decode_image/image_stats."""

from __future__ import annotations

import numpy as np
import pytest

from finetoo_sp_spark.codecs.vp8l import (
    _CL_ORDER,
    _LsbReader,
    _LsbWriter,
    _canonical_codes,
    _emit_entropy_image,
    _predict,
    _read_code_lengths,
    decode_vp8l,
    decode_webp,
    encode_webp_lossless,
)

RNG = np.random.default_rng(77)


def _roundtrip(img, **kw):
    out = decode_webp(encode_webp_lossless(img, **kw))
    exp = img
    if exp.ndim == 2:
        exp = np.stack([exp] * 3, axis=2)
    if exp.shape[2] == 4 and (exp[:, :, 3] == 255).all():
        exp = exp[:, :, :3]
    assert out.shape == exp.shape
    assert (out == exp).all()


def test_plain_and_channel_shapes():
    _roundtrip(RNG.integers(0, 256, (8, 9, 3), dtype=np.uint8))
    _roundtrip(RNG.integers(0, 256, (13, 21), dtype=np.uint8))
    _roundtrip(np.full((16, 16), 140, dtype=np.uint8))
    rgba = RNG.integers(0, 256, (10, 10, 4), dtype=np.uint8)
    rgba[0, 0, 3] = 128  # force a non-opaque pixel
    _roundtrip(rgba)
    _roundtrip(RNG.integers(0, 256, (1, 1, 3), dtype=np.uint8))


def test_every_transform_path_is_lossless():
    base = RNG.integers(0, 256, (17, 12, 3), dtype=np.uint8)
    smooth = np.clip(
        np.add.outer(np.arange(17) * 3, np.arange(12) * 5), 0, 255
    ).astype(np.uint8)
    smooth3 = np.stack([smooth, 255 - smooth, smooth // 2], axis=2)
    _roundtrip(base, subtract_green=True)
    for mode in range(14):  # all predictor modes incl. Select/ClampAddSub
        _roundtrip(smooth3, predictor_mode=mode)
    _roundtrip(base, color_transform=(0x10, 0x08, 0x04))
    _roundtrip(base, color_transform=(0xF0, 0x11, 0x80), subtract_green=True)
    _roundtrip(smooth3, predictor_mode=11, color_transform=(8, 4, 2),
               subtract_green=True)


def test_palette_bundling_widths():
    # palette sizes 2 / 3 / 8 / 200 hit width_bits 3 / 2 / 1 / 0
    _roundtrip((RNG.integers(0, 2, (9, 25)) * 255).astype(np.uint8),
               use_palette=True)
    _roundtrip((RNG.integers(0, 3, (9, 25)) * 100).astype(np.uint8),
               use_palette=True)
    _roundtrip((RNG.integers(0, 8, (20, 17)) * 30).astype(np.uint8),
               use_palette=True)
    _roundtrip((np.arange(15 * 14) % 200).astype(np.uint8).reshape(15, 14),
               use_palette=True)


def test_lz77_cache_and_distance_map():
    runs = np.repeat(
        np.repeat(RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8), 5, axis=0),
        5, axis=1,
    )
    _roundtrip(runs)                      # plain distance codes
    _roundtrip(runs, use_dist_map=True)   # 2D neighbor codes (1,0)/(0,1)
    few = (RNG.integers(0, 4, (16, 16, 3)) * 60).astype(np.uint8)
    _roundtrip(few, cache_bits=4)
    _roundtrip(few, cache_bits=1)


def test_predict_hand_values():
    # hand-checked spec arithmetic for the nonlinear modes
    left, top, tl = (255, 10, 20, 30), (255, 12, 22, 32), (255, 11, 21, 31)
    # Select: p = L+T-TL = (255,11,21,31); |p-L|=3, |p-T|=3 -> NOT <, so T
    assert _predict(11, left, top, tl, (0, 0, 0, 0)) == top
    # ClampAddSubtractFull: clamp(L+T-TL) per channel
    assert _predict(12, (255, 250, 0, 5), (255, 10, 0, 250), (255, 255, 10, 255),
                    (0,) * 4) == (255, 5, 0, 0)
    # ClampAddSubtractHalf: a = avg2(L,T); clamp(a + (a-TL)/2), /2 trunc to 0
    a = tuple((x + y) // 2 for x, y in zip(left, top))
    exp = tuple(max(0, min(255, ai + (ai - ci) // 2 if ai >= ci
                           else ai - (ci - ai) // 2))
                for ai, ci in zip(a, tl))
    assert _predict(13, left, top, tl, (0,) * 4) == exp


def test_code_length_repeats_and_bounded_count():
    """Decoder-only header features, crafted bit-exactly: 16 (repeat
    previous), 17/18 (zero runs), and the bounded-symbol-count form."""
    bw = _LsbWriter()
    # CL code over symbols {8, 16, 17, 18}, all length 2
    cl_lengths = [0] * 19
    for sym in (8, 16, 17, 18):
        cl_lengths[sym] = 2
    need = max(_CL_ORDER.index(x) for x in (8, 16, 17, 18)) + 1
    bw.write(need - 4, 4)
    for i in range(need):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no bounded count
    codes = _canonical_codes(cl_lengths)

    def emit(sym):
        code, n = codes[sym]
        for i in range(n - 1, -1, -1):
            bw.write((code >> i) & 1, 1)

    emit(8)                 # lengths[0] = 8
    emit(16); bw.write(1, 2)   # repeat prev(8) 3+1 = 4 times -> idx 1..4
    emit(17); bw.write(2, 3)   # 3+2 = 5 zeros -> idx 5..9
    emit(18); bw.write(4, 7)   # 11+4 = 15 zeros -> idx 10..24
    emit(8)                 # idx 25
    # fill the rest so the code is complete: 8 at every remaining slot
    for _ in range(26, 32):
        emit(8)
    br = _LsbReader(bw.flush())
    lengths = _read_code_lengths(br, 32)
    assert lengths[:5] == [8] * 5
    assert lengths[5:25] == [0] * 20
    assert lengths[25:] == [8] * 7

    # bounded-symbol-count: only the first 2 symbols transmitted
    bw = _LsbWriter()
    bw.write(need - 4, 4)
    for i in range(need):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(1, 1)           # use bounded count
    bw.write(0, 3)           # length_nbits = 2
    bw.write(0, 2)           # max_symbol = 2
    emit2 = emit  # same codes, new writer
    codes2 = codes
    for sym in (8, 8):
        code, n = codes2[sym]
        for i in range(n - 1, -1, -1):
            bw.write((code >> i) & 1, 1)
    br = _LsbReader(bw.flush())
    lengths = _read_code_lengths(br, 40)
    assert lengths[:2] == [8, 8]
    assert lengths[2:] == [0] * 38


def test_meta_prefix_groups_crafted_stream():
    """Two code groups selected by a meta-prefix image: left 4x4 tile
    decodes pixel A, right tile pixel B, zero bits per pixel (all five
    codes single-symbol)."""
    w, h = 8, 4
    bw = _LsbWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache (main)
    bw.write(1, 1)  # meta-prefix image present
    bw.write(0, 3)  # meta_bits = 2 -> 4x4 tiles -> meta image 2 x 1
    # meta image pixels: group index in (red<<8)|green
    meta = np.array([[0xFF000000 | (0 << 8), 0xFF000000 | (1 << 8)]],
                    dtype=np.uint32)
    _emit_entropy_image(bw, meta)
    # two groups, all single-symbol codes (zero bits per pixel)
    from finetoo_sp_spark.codecs.vp8l import _write_simple_code

    a = (10, 20, 30)   # r, g, b of group 0
    b = (40, 50, 60)
    for (r, g, bl) in (a, b):
        _write_simple_code(bw, [g])    # green
        _write_simple_code(bw, [r])    # red
        _write_simple_code(bw, [bl])   # blue
        _write_simple_code(bw, [255])  # alpha
        _write_simple_code(bw, [0])    # distance (unused)
    out = decode_vp8l(bw.flush())
    assert out.shape == (h, w, 4)
    assert (out[:, :4, :3] == np.array(a)).all()
    assert (out[:, 4:, :3] == np.array(b)).all()
    assert (out[:, :, 3] == 255).all()


def test_probe_dims_agree_with_decode():
    from finetoo_sp_spark.codecs.probe import probe_image_dims

    img = RNG.integers(0, 256, (23, 31, 3), dtype=np.uint8)
    blob = encode_webp_lossless(img)
    fmt, w, h = probe_image_dims(blob)
    assert (fmt, w, h) == ("webp", 31, 23)


def test_lossy_and_malformed_raise():
    import struct

    vp8 = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(vp8)
    with pytest.raises(ValueError):
        decode_webp(b"RIFF1234WEBPJUNK")
    with pytest.raises(ValueError):
        decode_webp(b"not webp at all")
    with pytest.raises(ValueError):
        decode_vp8l(b"\x00\x00\x00")


def test_decode_image_routes_webp(spark):
    from finetoo_sp_spark.multimodal import decode_image, image_stats

    img = np.full((16, 16), 140, dtype=np.uint8)
    blob = encode_webp_lossless(img)
    assert (decode_image(blob)[:, :, 0] == 140).all()
    rows = [(0, "image", bytearray(blob))]
    assets = spark.createDataFrame(
        rows, "asset_id long, modality string, payload binary"
    )
    got = image_stats(assets).collect()[0]
    assert (got["width"], got["height"], got["channels"]) == (16, 16, 3)
    assert got["sum_r"] == 140 * 16 * 16


# --------------------------------------------------------------- animation
def test_webp_anim_composite_and_dispose():
    from finetoo_sp_spark.codecs.vp8l import (
        decode_webp_frames,
        encode_webp_anim,
    )

    cw, ch, a, b, c = 24, 16, 40, 90, 140
    f0 = {"rgba": np.full((ch, cw), a, np.uint8), "duration_ms": 20,
          "blend": False}
    f1 = {"rgba": np.full((ch, cw // 2), b, np.uint8), "duration_ms": 30,
          "blend": False, "dispose": True}
    i2 = np.zeros((ch, cw, 4), np.uint8)
    i2[:, cw // 2:, :3] = c
    i2[:, cw // 2:, 3] = 255
    f2 = {"rgba": i2, "duration_ms": 40, "blend": True}
    frames, durs, loop = decode_webp_frames(
        encode_webp_anim(cw, ch, [f0, f1, f2], loop=3))
    assert (loop, durs) == (3, [20, 30, 40])
    assert (frames[0][:, :, 0] == a).all()
    assert (frames[1][:, :cw // 2, 0] == b).all()
    assert (frames[1][:, cw // 2:, 0] == a).all()
    # left half: disposed to background 0, then blended transparent
    assert (frames[2][:, :cw // 2, 0] == 0).all()
    assert (frames[2][:, cw // 2:, 0] == c).all()


def test_webp_anim_fractional_alpha_pins_integer_blend():
    from finetoo_sp_spark.codecs.vp8l import (
        decode_webp_frames,
        encode_webp_anim,
    )

    cw = ch = 8
    base = {"rgba": np.full((ch, cw), 40, np.uint8), "blend": False}
    half = np.full((ch, cw, 4), 100, np.uint8)
    half[:, :, 3] = 128
    fr = decode_webp_frames(
        encode_webp_anim(cw, ch, [base, {"rgba": half, "blend": True}]))[0][1]
    sa, da = 128, 255
    outa255 = sa * 255 + da * (255 - sa)
    assert (fr[:, :, 0] == (100 * sa * 255 + 40 * da * (255 - sa))
            // outa255).all()
    assert (fr[:, :, 3] == (outa255 + 127) // 255).all()


def test_webp_anim_still_image_contract_and_gates():
    from finetoo_sp_spark.codecs.vp8l import (
        decode_webp_frames,
        encode_webp_anim,
    )

    still = encode_webp_lossless(np.full((4, 6), 77, np.uint8))
    frames, durs, loop = decode_webp_frames(still)
    assert (loop, durs) == (-1, [0])
    assert (frames[0][:, :, 0] == 77).all()
    img = np.full((4, 4), 9, np.uint8)
    with pytest.raises(ValueError, match="even"):
        encode_webp_anim(16, 16, [{"rgba": img, "x": 1}])
    with pytest.raises(ValueError, match="canvas"):
        encode_webp_anim(2, 2, [{"rgba": img}])
    with pytest.raises(ValueError):
        decode_webp_frames(b"RIFF\x04\x00\x00\x00WEBP")


def test_webp_animation_stats_kernel(spark):
    from finetoo_sp_spark.codecs.vp8l import encode_webp_anim
    from finetoo_sp_spark.multimodal import webp_animation_stats

    anim = encode_webp_anim(
        16, 8,
        [{"rgba": np.full((8, 16), 50, np.uint8), "duration_ms": 5,
          "blend": False},
         {"rgba": np.full((8, 8), 70, np.uint8), "duration_ms": 7,
          "blend": False}],
        loop=2)
    df = spark.createDataFrame(
        [(0, "image", bytearray(anim)),
         (1, "image", bytearray(b"RIFF garbage"))],
        "asset_id long, modality string, payload binary")
    rows = webp_animation_stats(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_frames"], r["loop_count"], r["duration_ms"]) == (2, 2, 12)
    assert (r["width"], r["height"]) == (16, 8)
    assert r["sum_gray"] == 16 * 8 * 50 + 8 * 8 * (70 + 50)
