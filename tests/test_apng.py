"""APNG codec: dispose/blend semantics, hidden default images, the
integer OVER blend against hand-computed byte fixtures, and rejection
of malformed sequence numbering. Pure-codec tests (no Spark session);
the Spark-side kernel is pinned by the apng_animation_stats oracle."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from finetoo_sp_spark.codecs.apng import (
    decode_apng_frames,
    encode_apng,
)
from finetoo_sp_spark.codecs.png import encode_png


def _solid(h, w, gray, alpha=255):
    a = np.zeros((h, w, 4), np.uint8)
    a[..., :3] = gray
    a[..., 3] = alpha
    return a


def _three_frame(w, h, d1):
    """Canvas a=50, left-half b=120 with dispose d1, then OVER blend of
    a frame whose left half is transparent and right half c=200."""
    f2 = np.zeros((h, w, 4), np.uint8)
    f2[:, w // 2 :, :3] = 200
    f2[:, w // 2 :, 3] = 255
    return encode_apng(
        w,
        h,
        [
            {"rgba": _solid(h, w, 50), "dispose": 0, "blend": 0,
             "delay_num": 2, "delay_den": 100},
            {"rgba": _solid(h, w // 2, 120), "dispose": d1, "blend": 0,
             "delay_num": 3, "delay_den": 100},
            {"rgba": f2, "dispose": 0, "blend": 1,
             "delay_num": 4, "delay_den": 100},
        ],
        num_plays=2,
    )


@pytest.mark.parametrize(
    "d1,expected_left",
    [(0, 120), (1, 0), (2, 50)],  # none / background / previous
)
def test_dispose_branches(d1, expected_left):
    frames, delays, plays = decode_apng_frames(_three_frame(12, 8, d1))
    assert plays == 2
    assert delays == [(2, 100), (3, 100), (4, 100)]
    assert len(frames) == 3
    assert (frames[2][:, :6, 0] == expected_left).all()
    assert (frames[2][:, 6:, 0] == 200).all()


def test_hidden_default_image_excluded_from_animation():
    data = encode_apng(
        12, 8,
        [
            {"rgba": _solid(8, 12, 50), "blend": 0},
            {"rgba": _solid(8, 6, 120), "dispose": 1, "blend": 0},
        ],
        default_image=_solid(8, 12, 7),
    )
    frames, _, _ = decode_apng_frames(data)
    assert len(frames) == 2  # the hidden IDAT is NOT an animation frame
    assert (frames[0][..., 0] == 50).all()  # frame 0 rides in fdAT


def test_first_frame_dispose_previous_downgrades_to_background():
    # Spec: dispose_op PREVIOUS on frame 0 is treated as BACKGROUND.
    data = encode_apng(
        4, 4,
        [
            {"rgba": _solid(4, 4, 90), "dispose": 2, "blend": 0},
            {"rgba": _solid(4, 2, 30), "blend": 1},  # over a cleared canvas
        ],
    )
    frames, _, _ = decode_apng_frames(data)
    # After frame 0 the canvas must be CLEARED (not "restored" to junk):
    # the right half of frame 1 (untouched by its region) is transparent.
    assert (frames[1][:, 2:, 3] == 0).all()
    assert (frames[1][:, :2, 0] == 30).all()


def test_over_blend_hand_fixture():
    # dst gray 100 alpha 255, src gray 200 alpha 128:
    # outA255 = 128*255 + 255*127 = 65025
    # outC = (200*128*255 + 100*255*127 + 32512) // 65025 = 150
    data = encode_apng(
        1, 1,
        [
            {"rgba": _solid(1, 1, 100), "blend": 0},
            {"rgba": _solid(1, 1, 200, alpha=128), "blend": 1},
        ],
    )
    frames, _, _ = decode_apng_frames(data)
    assert frames[1][0, 0, 0] == 150
    assert frames[1][0, 0, 3] == 255
    # src fully transparent leaves dst untouched exactly
    data = encode_apng(
        1, 1,
        [
            {"rgba": _solid(1, 1, 100), "blend": 0},
            {"rgba": _solid(1, 1, 200, alpha=0), "blend": 1},
        ],
    )
    frames, _, _ = decode_apng_frames(data)
    assert frames[1][0, 0, 0] == 100 and frames[1][0, 0, 3] == 255


def test_subregion_offsets_composite_in_place():
    base = _solid(6, 10, 10)
    patch = {"rgba": _solid(2, 3, 240), "x": 4, "y": 1, "blend": 0}
    data = encode_apng(10, 6, [{"rgba": base, "blend": 0}, patch])
    frames, _, _ = decode_apng_frames(data)
    f = frames[1]
    assert (f[1:3, 4:7, 0] == 240).all()
    mask = np.ones((6, 10), bool)
    mask[1:3, 4:7] = False
    assert (f[..., 0][mask] == 10).all()


def test_plain_png_is_single_frame_still():
    frames, delays, plays = decode_apng_frames(
        encode_png(np.full((4, 5, 3), 9, np.uint8))
    )
    assert plays == -1 and len(frames) == 1
    assert (frames[0][..., 0] == 9).all() and (frames[0][..., 3] == 255).all()


def test_bad_fdat_sequence_rejected():
    data = bytearray(_three_frame(12, 8, 0))
    # Corrupt the LAST fdAT's 4-byte sequence field (first payload bytes
    # after the length+type header), recompute the CRC so only the
    # sequencing is wrong.
    idx = data.rfind(b"fdAT")
    start = idx - 4
    (length,) = struct.unpack(">I", data[start : start + 4])
    payload = bytearray(data[idx + 4 : idx + 4 + length])
    payload[:4] = struct.pack(">I", 99)
    crc = zlib.crc32(b"fdAT" + bytes(payload)) & 0xFFFFFFFF
    data[idx + 4 : idx + 4 + length] = payload
    data[idx + 4 + length : idx + 8 + length] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="sequence"):
        decode_apng_frames(bytes(data))


def test_frame_exceeding_canvas_rejected():
    with pytest.raises(ValueError, match="canvas"):
        encode_apng(
            4, 4,
            [
                {"rgba": _solid(4, 4, 1), "blend": 0},
                {"rgba": _solid(4, 4, 2), "x": 2, "blend": 0},
            ],
        )
