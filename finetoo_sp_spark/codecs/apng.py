"""Minimal pure-stdlib APNG codec (Animated PNG, now PNG Third Edition).

Completes the animated-format trio beside GIF (codecs/gif.py) and
animated WebP (codecs/vp8l.py): the third animation container a real
web crawl carries. Implements the `acTL` / `fcTL` / `fdAT` chunk model:

- ``encode_apng`` writes a deterministic animation: IHDR, acTL, then
  either a visible first frame (fcTL + IDAT) or a HIDDEN default image
  (IDAT with no preceding fcTL — excluded from the animation per spec)
  followed by fcTL + fdAT pairs. Sequence numbers are assigned across
  fcTL and fdAT chunks exactly as the spec demands.
- ``decode_apng_frames`` parses + CRC-checks the chunk stream, inflates
  and de-filters each frame region through the SAME vectorized paths as
  the still decoder (codecs/png.py ``defilter_stream``), then composites
  onto the canvas honoring ``dispose_op`` (0 none / 1 background /
  2 previous, with the first-frame dispose-2→1 downgrade) and
  ``blend_op`` (0 source / 1 over).

The OVER blend uses exact integer arithmetic with round-half-up:
    outA255 = sa*255 + da*(255 - sa)            # alpha scaled by 255
    outC    = (sc*sa*255 + dc*da*(255-sa) + outA255//2) // outA255
    outA    = (outA255 + 127) // 255
For sa in {0, 255} this is EXACT (src or dst unchanged), which is what
the contract oracle pins; fractional-alpha cases are pinned by
hand-computed byte fixtures in tests/test_apng.py.

Reference parity: the reference engine has no animation decoding — this
extends the multimodal asset layer the web graft demands (SURVEY.md
"multimodal columns"). Spec: W3C PNG 3rd Edition §4.10 (APNG).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from finetoo_sp_spark.codecs.png import (
    _CHANNELS,
    _MAGIC,
    _chunk,
    defilter_stream,
    filter_stream,
)

_DISPOSE_NONE, _DISPOSE_BACKGROUND, _DISPOSE_PREVIOUS = 0, 1, 2
_BLEND_SOURCE, _BLEND_OVER = 0, 1


def _inflate(blob: bytes) -> bytes:
    try:
        return zlib.decompress(blob)
    except zlib.error as exc:  # corrupt deflate: a decode error, not a crash
        raise ValueError(f"bad frame deflate stream: {exc}") from exc


def _to_rgba(img: np.ndarray) -> np.ndarray:
    """Expand a decoded (H, W, C) region to RGBA (C in 1/2/3/4)."""
    h, w, ch = img.shape
    if ch == 4:
        return img
    if ch == 3:
        return np.concatenate([img, np.full((h, w, 1), 255, np.uint8)], axis=2)
    if ch == 2:  # gray + alpha
        return np.concatenate([np.repeat(img[:, :, :1], 3, axis=2), img[:, :, 1:]], axis=2)
    return np.concatenate(  # grayscale
        [np.repeat(img, 3, axis=2), np.full((h, w, 1), 255, np.uint8)], axis=2
    )


def _blend_over(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """APNG_BLEND_OP_OVER with exact integer math (module docstring)."""
    sa = src[:, :, 3:4].astype(np.int64)
    da = dst[:, :, 3:4].astype(np.int64)
    out_a255 = sa * 255 + da * (255 - sa)
    sc = src[:, :, :3].astype(np.int64)
    dc = dst[:, :, :3].astype(np.int64)
    num = sc * sa * 255 + dc * da * (255 - sa)
    safe = np.maximum(out_a255, 1)
    out_c = np.where(out_a255 == 0, 0, (num + safe // 2) // safe)
    out_a = (out_a255 + 127) // 255
    return np.concatenate([out_c, out_a], axis=2).astype(np.uint8)


def encode_apng(
    canvas_w: int,
    canvas_h: int,
    frames: list[dict],
    num_plays: int = 0,
    default_image: np.ndarray | None = None,
) -> bytes:
    """Encode a deterministic APNG.

    Each frame dict: ``rgba`` (h, w, 4 uint8), optional ``x``/``y``
    offsets, ``delay_num``/``delay_den`` (den 0 → 1/100 s per spec),
    ``dispose`` (0/1/2) and ``blend`` (0/1). When ``default_image`` is
    given (full-canvas array) it becomes a HIDDEN IDAT default image and
    every animation frame rides in fdAT chunks; otherwise frame 0 is the
    IDAT with its fcTL ahead of it."""
    if not frames:
        raise ValueError("APNG needs at least one animation frame")
    ihdr = struct.pack(">IIBBBBB", canvas_w, canvas_h, 8, 6, 0, 0, 0)
    actl = struct.pack(">II", len(frames), num_plays)
    out = [_MAGIC, _chunk(b"IHDR", ihdr), _chunk(b"acTL", actl)]
    seq = 0

    def fctl(fr: dict) -> bytes:
        nonlocal seq
        a = np.asarray(fr["rgba"], dtype=np.uint8)
        payload = struct.pack(
            ">IIIIIHHBB",
            seq,
            a.shape[1],
            a.shape[0],
            int(fr.get("x", 0)),
            int(fr.get("y", 0)),
            int(fr.get("delay_num", 1)),
            int(fr.get("delay_den", 100)),
            int(fr.get("dispose", 0)),
            int(fr.get("blend", 0)),
        )
        seq += 1
        return _chunk(b"fcTL", payload)

    start = 0
    if default_image is not None:
        img = np.asarray(default_image, dtype=np.uint8)
        if img.shape[:2] != (canvas_h, canvas_w):
            raise ValueError("default image must cover the canvas")
        out.append(_chunk(b"IDAT", zlib.compress(filter_stream(img), 6)))
    else:
        f0 = np.asarray(frames[0]["rgba"], dtype=np.uint8)
        if f0.shape[:2] != (canvas_h, canvas_w) or frames[0].get("x") or frames[0].get("y"):
            raise ValueError("visible first frame must cover the canvas")
        out.append(fctl(frames[0]))
        out.append(_chunk(b"IDAT", zlib.compress(filter_stream(f0), 6)))
        start = 1
    for fr in frames[start:]:
        a = np.asarray(fr["rgba"], dtype=np.uint8)
        x, y = int(fr.get("x", 0)), int(fr.get("y", 0))
        if x + a.shape[1] > canvas_w or y + a.shape[0] > canvas_h:
            raise ValueError("frame region exceeds canvas")
        out.append(fctl(fr))
        fdat = struct.pack(">I", seq) + zlib.compress(filter_stream(a), 6)
        seq += 1
        out.append(_chunk(b"fdAT", fdat))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def decode_apng_frames(
    data: bytes,
) -> tuple[list[np.ndarray], list[tuple[int, int]], int]:
    """Decode an APNG to (composited_frames, delays, num_plays).

    ``composited_frames`` are full-canvas RGBA uint8 arrays — one per
    animation frame, AFTER dispose/blend compositing; ``delays`` are the
    raw (delay_num, delay_den) pairs. A plain PNG (no acTL) decodes as a
    single-frame animation with num_plays -1, mirroring the GIF/WebP
    still-image convention. Raises ValueError on CRC mismatch, bad
    sequence numbering, or an unsupported IHDR subset."""
    if not data.startswith(_MAGIC):
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    ch = 0
    num_plays = -1
    animated = False
    ctl_list: list[dict] = []  # fcTL metadata in stream order
    idat = bytearray()
    idat_ctl: dict | None = None  # fcTL that precedes IDAT (None = hidden)
    seen_idat = False
    expect_seq = 0
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(f"truncated {ctype!r} chunk")
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color not in _CHANNELS or interlace != 0 or comp != 0 or filt != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} interlace={interlace})"
                )
            ch = _CHANNELS[color]
        elif ctype == b"acTL":
            if seen_idat:
                raise ValueError("acTL after IDAT")
            _, num_plays = struct.unpack(">II", payload)
            animated = True
        elif ctype == b"fcTL":
            seq, fw, fh, fx, fy, dnum, dden, dispose, blend = struct.unpack(
                ">IIIIIHHBB", payload
            )
            if seq != expect_seq:
                raise ValueError(f"fcTL sequence {seq} != expected {expect_seq}")
            expect_seq += 1
            if dispose > 2 or blend > 1:
                raise ValueError(f"bad fcTL dispose={dispose} blend={blend}")
            ctl = {
                "w": fw, "h": fh, "x": fx, "y": fy,
                "delay": (dnum, dden), "dispose": dispose, "blend": blend,
                "data": bytearray(),
            }
            if not seen_idat:
                idat_ctl = ctl
            ctl_list.append(ctl)
        elif ctype == b"IDAT":
            seen_idat = True
            idat += payload
        elif ctype == b"fdAT":
            (seq,) = struct.unpack(">I", payload[:4])
            if seq != expect_seq:
                raise ValueError(f"fdAT sequence {seq} != expected {expect_seq}")
            expect_seq += 1
            if not ctl_list:
                raise ValueError("fdAT before any fcTL")
            ctl_list[-1]["data"] += payload[4:]
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    if not animated:
        img = _to_rgba(defilter_stream(_inflate(bytes(idat)), w, h, ch))
        return [img], [(0, 100)], -1
    if idat_ctl is not None:
        if (idat_ctl["w"], idat_ctl["h"]) != (w, h) or idat_ctl["x"] or idat_ctl["y"]:
            raise ValueError("visible default frame must cover the canvas")
        idat_ctl["data"] = idat  # IDAT is animation frame 0
    if not ctl_list:
        raise ValueError("acTL present but no fcTL frames")

    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[tuple[int, int]] = []
    for k, ctl in enumerate(ctl_list):
        fw, fh, fx, fy = ctl["w"], ctl["h"], ctl["x"], ctl["y"]
        if fx + fw > w or fy + fh > h:
            raise ValueError("frame region exceeds canvas")
        region = _to_rgba(
            defilter_stream(_inflate(bytes(ctl["data"])), fw, fh, ch)
        )
        dispose = ctl["dispose"]
        if k == 0 and dispose == _DISPOSE_PREVIOUS:
            dispose = _DISPOSE_BACKGROUND  # spec downgrade for frame 0
        saved = canvas[fy : fy + fh, fx : fx + fw].copy() if dispose == _DISPOSE_PREVIOUS else None
        view = canvas[fy : fy + fh, fx : fx + fw]
        if ctl["blend"] == _BLEND_SOURCE:
            canvas[fy : fy + fh, fx : fx + fw] = region
        else:
            canvas[fy : fy + fh, fx : fx + fw] = _blend_over(view, region)
        frames.append(canvas.copy())
        delays.append(ctl["delay"])
        if dispose == _DISPOSE_BACKGROUND:
            canvas[fy : fy + fh, fx : fx + fw] = 0
        elif dispose == _DISPOSE_PREVIOUS:
            canvas[fy : fy + fh, fx : fx + fw] = saved
    return frames, delays, num_plays
