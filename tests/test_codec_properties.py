"""Hypothesis property suites for the session-4 codec additions:
every BMP mode round-trips pixel-exact, G.711 decode->encode->decode is
a fixed point, and animated-WebP compositing with binary alpha matches
an independent numpy reference compositor."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from finetoo_sp_spark.codecs.bmp import (
    decode_bmp,
    encode_bmp,
    encode_bmp_bitfields,
)
from finetoo_sp_spark.codecs.wav import (
    ALAW_DECODE,
    ULAW_DECODE,
    decode_wav,
    encode_wav_g711,
    make_wav_g711_codes,
)

_SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

_dims = st.tuples(st.integers(1, 13), st.integers(1, 11))


def _pal_image(seed: int, h: int, w: int, n_colors: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    colors = rng.integers(0, 256, size=(n_colors, 3)).astype(np.uint8)
    return colors[rng.integers(0, n_colors, size=(h, w))]


@_SET
@given(st.integers(0, 10_000), _dims, st.integers(2, 16))
def test_bmp_every_mode_roundtrips(seed, dims, n_colors):
    h, w = dims
    img = _pal_image(seed, h, w, n_colors)
    for enc in (
        encode_bmp(img, bits=24),
        encode_bmp(img, bits=32, top_down=True),
        encode_bmp(img, bits=8),
        encode_bmp(img, bits=4),
        encode_bmp(img, compression="rle8"),
        encode_bmp(img, compression="rle4"),
        encode_bmp_bitfields(img),  # 32-bpp 8-bit masks: lossless
    ):
        assert np.array_equal(decode_bmp(enc), img)


@_SET
@given(st.integers(0, 10_000), _dims)
def test_bmp_1bpp_roundtrips(seed, dims):
    h, w = dims
    img = _pal_image(seed, h, w, 2)
    assert np.array_equal(decode_bmp(encode_bmp(img, bits=1)), img)


@_SET
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
    st.sampled_from(["ulaw", "alaw"]),
)
def test_g711_decode_encode_decode_fixed_point(samples, law):
    s = np.asarray(samples, dtype=np.int64)
    _, _, _, once = decode_wav(encode_wav_g711(s, 8000, law=law))
    _, _, _, twice = decode_wav(encode_wav_g711(once[:, 0], 8000, law=law))
    assert np.array_equal(once, twice)
    # companding error is bounded by the largest G.711 segment step
    assert np.abs(once[:, 0] - s).max() <= 1024


@_SET
@given(st.lists(st.integers(0, 255), min_size=1, max_size=64),
       st.sampled_from(["ulaw", "alaw"]))
def test_g711_codes_decode_via_tables(codes, law):
    table = ULAW_DECODE if law == "ulaw" else ALAW_DECODE
    arr = np.asarray(codes, dtype=np.uint8)
    _, _, _, out = decode_wav(make_wav_g711_codes(arr, 8000, law=law))
    assert np.array_equal(out[:, 0], table[arr])


@_SET
@given(st.integers(0, 10_000), st.integers(1, 4))
def test_webp_anim_matches_reference_compositor(seed, n_frames):
    from finetoo_sp_spark.codecs.vp8l import (
        decode_webp_frames,
        encode_webp_anim,
    )

    rng = np.random.default_rng(seed)
    cw, ch = int(rng.integers(2, 10)) * 2, int(rng.integers(2, 10)) * 2
    bg = tuple(int(v) for v in rng.integers(0, 256, 4))
    frames = []
    for _ in range(n_frames):
        fw = int(rng.integers(1, cw // 2 + 1)) * 2
        fh = int(rng.integers(1, ch // 2 + 1)) * 2
        x = int(rng.integers(0, (cw - fw) // 2 + 1)) * 2
        y = int(rng.integers(0, (ch - fh) // 2 + 1)) * 2
        rgba = rng.integers(0, 256, size=(fh, fw, 4)).astype(np.uint8)
        rgba[:, :, 3] = np.where(rng.random((fh, fw)) < 0.5, 0, 255)
        frames.append({
            "rgba": rgba, "x": x, "y": y,
            "duration_ms": int(rng.integers(0, 100)),
            "blend": bool(rng.integers(0, 2)),
            "dispose": bool(rng.integers(0, 2)),
        })
    got, durs, _loop = decode_webp_frames(
        encode_webp_anim(cw, ch, frames, bg=bg))
    # independent reference compositor (binary alpha only)
    canvas = np.zeros((ch, cw, 4), np.uint8)
    canvas[:, :] = np.array([bg[0], bg[1], bg[2], bg[3]], np.uint8)
    for k, fr in enumerate(frames):
        a = fr["rgba"]
        fh, fw = a.shape[:2]
        x, y = fr["x"], fr["y"]
        region = canvas[y : y + fh, x : x + fw]
        if fr["blend"]:
            opaque = a[:, :, 3] == 255
            # transparent src over transparent dst: result alpha is 0
            # and the spec zeroes the RGB too
            zero_out = (~opaque) & (region[:, :, 3] == 0)
            region[opaque] = a[opaque]
            region[zero_out] = 0
        else:
            region[:, :] = a
        assert np.array_equal(got[k], canvas)
        assert durs[k] == fr["duration_ms"]
        if fr["dispose"]:
            canvas[y : y + fh, x : x + fw] = np.array(bg, np.uint8)


def test_png_palette_depth_matrix_roundtrip():
    import numpy as np

    from finetoo_sp_spark.codecs.png import decode_png, encode_png_palette

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (256, 3), np.uint8)
    for d in (1, 2, 4, 8):
        for ft in (0, 1, 2, 3, 4):
            idx = rng.integers(0, 1 << d, (9, 14), np.uint8)
            got = decode_png(
                encode_png_palette(idx, pal[: 1 << d], depth=d, filter_type=ft)
            )
            assert (got == pal[: 1 << d][idx]).all(), (d, ft)


def test_png_trns_alpha_and_short_trns():
    import numpy as np

    from finetoo_sp_spark.codecs.png import decode_png, encode_png_palette

    rng = np.random.default_rng(12)
    pal = rng.integers(0, 256, (4, 3), np.uint8)
    idx = rng.integers(0, 4, (6, 7), np.uint8)
    # tRNS shorter than the palette: missing entries default opaque
    got = decode_png(
        encode_png_palette(idx, pal, trns=np.array([0, 128], np.uint8), depth=2)
    )
    alpha = np.array([0, 128, 255, 255], np.uint8)
    assert got.shape == (6, 7, 4) and (got[..., 3] == alpha[idx]).all()


def test_png_16bit_high_byte_exact():
    import numpy as np

    from finetoo_sp_spark.codecs.png import decode_png, encode_png_16bit

    rng = np.random.default_rng(13)
    for shape in [(8, 9, 3), (5, 6), (4, 4, 4), (3, 7, 2)]:
        a16 = rng.integers(0, 65536, shape, np.uint16)
        for ft in (0, 2, 4):
            got = decode_png(encode_png_16bit(a16, filter_type=ft))
            want = (a16 >> 8).astype(np.uint8)
            if want.ndim == 2:
                want = want[:, :, None]
            assert (got == want).all(), (shape, ft)


def test_png_adam7_interlace_matrix():
    import numpy as np

    from finetoo_sp_spark.codecs.png import decode_png, encode_png_interlaced

    rng = np.random.default_rng(14)
    # odd/tiny geometries hit every empty-pass branch
    for shape in [(1, 1, 1), (2, 3, 2), (7, 7, 3), (8, 8, 4), (13, 5, 3), (16, 17, 1)]:
        a = rng.integers(0, 256, shape, np.uint8)
        for ft in (0, 3, 4):
            assert (decode_png(encode_png_interlaced(a, ft)) == a).all(), (shape, ft)


def test_png_sub8_gray_scaling():
    import numpy as np

    from finetoo_sp_spark.codecs.png import decode_png, encode_png_gray_sub8

    rng = np.random.default_rng(15)
    for d in (1, 2, 4):
        v = rng.integers(0, 1 << d, (7, 11), np.uint8)
        got = decode_png(encode_png_gray_sub8(v, d))
        assert (got[:, :, 0] == v * (255 // ((1 << d) - 1))).all(), d


def test_png_palette_without_plte_rejected():
    import numpy as np
    import pytest

    from finetoo_sp_spark.codecs.png import decode_png, encode_png_palette

    data = bytearray(
        encode_png_palette(np.zeros((4, 4), np.uint8), np.zeros((2, 3), np.uint8), depth=1)
    )
    i = data.find(b"PLTE")
    data[i : i + 4] = b"pLTx"  # ancillary unknown chunk: palette now missing
    import struct
    import zlib

    payload = bytes(data[i + 4 : i + 4 + 6])
    crc = zlib.crc32(b"pLTx" + payload) & 0xFFFFFFFF
    data[i + 10 : i + 14] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(bytes(data))


def test_wav_24bit_roundtrip_and_sign_extension():
    import numpy as np

    from finetoo_sp_spark.codecs.wav import decode_wav, encode_wav_24bit

    rng = np.random.default_rng(16)
    s = rng.integers(-(1 << 23), 1 << 23, (300, 2))
    rate, ch, bits, out = decode_wav(encode_wav_24bit(s, 44100))
    assert (rate, ch, bits) == (44100, 2, 24)
    assert (out == s).all()
    extremes = np.array([-(1 << 23), (1 << 23) - 1, 0, -1, 1])
    assert (decode_wav(encode_wav_24bit(extremes, 8000))[3][:, 0] == extremes).all()
