"""GIF codec (codecs/gif.py): lossless roundtrips across palette sizes,
interlace, LZW dictionary overflow; transparency; animation = first
frame; routing through decode_image."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from finetoo_sp_spark.codecs.gif import decode_gif, encode_gif

RNG = np.random.default_rng(5)


def _roundtrip(img, **kw):
    out = decode_gif(encode_gif(img, **kw))
    exp = np.stack([img] * 3, axis=2) if img.ndim == 2 else img
    assert out.shape == exp.shape
    assert (out == exp).all()


def test_roundtrip_palette_sizes_and_shapes():
    _roundtrip(np.full((16, 16), 140, np.uint8))
    _roundtrip((RNG.integers(0, 2, (9, 25)) * 255).astype(np.uint8))
    _roundtrip((RNG.integers(0, 8, (20, 17, 3)) * 30).astype(np.uint8))
    _roundtrip((np.arange(32 * 24) % 256).astype(np.uint8).reshape(32, 24))
    _roundtrip(np.full((1, 1), 7, np.uint8))


def test_interlace_four_passes():
    _roundtrip((RNG.integers(0, 16, (23, 13)) * 15).astype(np.uint8),
               interlace=True)
    _roundtrip((RNG.integers(0, 4, (3, 8)) * 80).astype(np.uint8),
               interlace=True)  # fewer rows than passes


def test_lzw_dictionary_overflow_clears():
    # 80x70 with ~250 colors pushes past 4095 dict entries -> CLEAR path
    _roundtrip(RNG.integers(0, 250, (80, 70)).astype(np.uint8))


def test_transparency_yields_alpha():
    img = (RNG.integers(0, 4, (10, 12)) * 50).astype(np.uint8)
    blob = bytearray(encode_gif(img))
    # splice a GIF89a graphic-control extension declaring index 0
    # transparent, right before the image descriptor
    i = blob.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00])
    blob = bytes(blob[:i]) + gce + bytes(blob[i:])
    out = decode_gif(blob)
    assert out.shape == (10, 12, 4)
    idx0 = img == img.reshape(-1)[np.argmax(img.reshape(-1) == img.reshape(-1)[0])]
    # alpha 0 exactly where the first-seen color (palette index 0) sits
    first_color = img.reshape(-1)[0]
    assert ((out[:, :, 3] == 0) == (img == first_color)).all()


def test_animation_first_frame_and_malformed():
    img = (RNG.integers(0, 4, (8, 8)) * 60).astype(np.uint8)
    blob = encode_gif(img)
    # duplicate the image block (crude 2-frame animation)
    i = blob.index(0x2C, 13)
    frame = blob[i:-1]  # image descriptor .. before trailer
    anim = blob[:-1] + frame + b"\x3b"
    out = decode_gif(anim)
    assert (out == np.stack([img] * 3, axis=2)).all()
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 4)
    with pytest.raises(ValueError):
        decode_gif(b"not a gif")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + struct.pack("<HH", 2, 2) + b"\x00\x00\x00\x3b")


def test_probe_dims_agree():
    from finetoo_sp_spark.codecs.probe import probe_image_dims

    img = RNG.integers(0, 16, (23, 31)).astype(np.uint8) * 15
    fmt, w, h = probe_image_dims(encode_gif(img))
    assert (fmt, w, h) == ("gif", 31, 23)


def test_decode_image_routes_gif(spark):
    from finetoo_sp_spark.multimodal import decode_image, image_stats

    img = np.full((16, 16), 140, dtype=np.uint8)
    blob = encode_gif(img)
    assert (decode_image(blob)[:, :, 0] == 140).all()
    assets = spark.createDataFrame(
        [(0, "image", bytearray(blob))],
        "asset_id long, modality string, payload binary",
    )
    got = image_stats(assets).collect()[0]
    assert (got["width"], got["height"], got["channels"]) == (16, 16, 3)
    assert got["sum_r"] == 140 * 16 * 16


# ------------------------------------------------------------- animation


def _anim_pal():
    return np.array(
        [[0, 0, 0], [10, 10, 10], [20, 20, 20], [30, 30, 30], [255, 0, 255]],
        dtype=np.uint8,
    )


def test_gif_anim_disposal_chain():
    """Hand-derived composited canvases for every disposal method:
    4x2 screen, frame0 full=10, frame1 left-half=20, frame2 full with
    left half transparent and right half=30."""
    from finetoo_sp_spark.codecs.gif import decode_gif_frames, encode_gif_anim

    W, H = 4, 2
    pal = _anim_pal()
    f0 = {"idx": np.full((H, W), 1), "delay_cs": 2, "disposal": 1}
    i2 = np.full((H, W), 3)
    i2[:, : W // 2] = 4
    f2 = {"idx": i2, "delay_cs": 4, "disposal": 1, "transparent": 4}
    for disposal, left_val in ((1, 20), (2, 0), (3, 10)):
        f1 = {"idx": np.full((H, W // 2), 2), "delay_cs": 3, "disposal": disposal}
        frames, delays, loop = decode_gif_frames(
            encode_gif_anim(W, H, pal, 0, [f0, f1, f2], loop=5)
        )
        assert len(frames) == 3 and delays == [2, 3, 4] and loop == 5
        assert frames[0][:, :, 0].tolist() == [[10] * 4] * 2
        assert frames[1][:, :2, 0].tolist() == [[20, 20]] * 2
        assert frames[1][:, 2:, 0].tolist() == [[10, 10]] * 2
        # frame 2: left half = canvas after frame1's disposal, right = 30
        assert frames[2][:, :2, 0].tolist() == [[left_val] * 2] * 2
        assert frames[2][:, 2:, 0].tolist() == [[30, 30]] * 2


def test_gif_anim_local_palette_and_plain_fallback():
    from finetoo_sp_spark.codecs.gif import (
        decode_gif_frames,
        encode_gif_anim,
    )

    W, H = 4, 2
    pal = _anim_pal()
    lct = np.array([[0, 0, 0], [0, 0, 0], [77, 77, 77], [0, 0, 0]], np.uint8)
    f0 = {"idx": np.full((H, W), 1), "delay_cs": 1, "disposal": 1}
    f1 = {
        "idx": np.full((H, W // 2), 2),
        "local_palette": lct,
        "delay_cs": 1,
        "disposal": 1,
    }
    frames, _, _ = decode_gif_frames(encode_gif_anim(W, H, pal, 0, [f0, f1]))
    assert frames[1][0, 0, 0] == 77  # LCT wins over GCT for its frame
    # a plain single-frame GIF (no GCE, no NETSCAPE) decodes as a
    # 1-frame animation with loop -1 and the still pixels
    img = (np.arange(6).reshape(2, 3) * 13 % 256).astype(np.uint8)
    fr, dl, lp = decode_gif_frames(encode_gif(img))
    assert len(fr) == 1 and lp == -1 and dl == [0]
    assert (fr[0][:, :, 0] == img).all()


def test_gif_anim_kernel_skips_malformed(spark):
    from finetoo_sp_spark.codecs.gif import encode_gif_anim
    from finetoo_sp_spark.multimodal import gif_animation_stats

    W, H = 4, 2
    pal = _anim_pal()
    good = encode_gif_anim(
        W, H, pal, 0,
        [{"idx": np.full((H, W), 1), "delay_cs": 7, "disposal": 1}],
        loop=2,
    )
    assets = spark.createDataFrame(
        [
            (0, "image", bytearray(good)),
            (1, "image", bytearray(b"GIF89a" + b"\x00" * 6)),  # truncated
            (2, "image", bytearray(b"not a gif at all")),
        ],
        "asset_id long, modality string, payload binary",
    )
    rows = {r["asset_id"]: r.asDict() for r in gif_animation_stats(assets).collect()}
    assert set(rows) == {0}
    assert rows[0]["n_frames"] == 1 and rows[0]["loop_count"] == 2
    assert rows[0]["duration_cs"] == 7
    assert rows[0]["sum_gray"] == 10 * W * H
