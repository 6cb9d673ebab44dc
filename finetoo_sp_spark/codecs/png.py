"""Minimal pure-stdlib PNG codec (zlib + struct + numpy).

Closes the image-decode stub without a codec library: supports the PNG
subset a synthetic-asset pipeline needs — 8-bit depth, color types 0
(grayscale), 2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlace, all five
scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6). CRCs are
verified on decode. The encoder can write any single filter type per
image, which is how the roundtrip tests exercise every de-filter path.

Scale note: this runs inside Arrow-batched ``mapInPandas`` kernels
(multimodal.image_stats) — per-payload Python cost is the codec itself,
exactly what a PIL/turbojpeg swap-in would cost; the Spark plan shape
(binary column in, typed stats out, no shuffle) is production-real.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (RFC 2083 §4.1.1)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_FOR_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as a PNG, applying the
    same ``filter_type`` (0-4) to every scanline."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in _COLOR_FOR_CHANNELS:
        raise ValueError(f"unsupported channel count {ch}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad filter type {filter_type}")
    flat = a.reshape(h, w * ch).astype(np.int16)  # int16: filter math needs signed
    prev = np.zeros(w * ch, dtype=np.int16)
    lines = []
    for y in range(h):
        raw = flat[y]
        left = np.concatenate([np.zeros(ch, dtype=np.int16), raw[:-ch]])
        up = prev
        up_left = np.concatenate([np.zeros(ch, dtype=np.int16), up[:-ch]])
        if filter_type == 0:
            out = raw
        elif filter_type == 1:
            out = raw - left
        elif filter_type == 2:
            out = raw - up
        elif filter_type == 3:
            out = raw - ((left + up) >> 1)
        else:  # Paeth
            p = left + up - up_left
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - up_left)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, up_left))
            out = raw - pred
        lines.append(bytes([filter_type]) + (out & 0xFF).astype(np.uint8).tobytes())
        prev = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_FOR_CHANNELS[ch], 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG (the subset above) to an (H, W, C) uint8 array.

    Raises ValueError on a non-PNG payload, CRC mismatch, or an
    unsupported feature (16-bit, palette, interlace).
    """
    if not data.startswith(_MAGIC):
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    ch = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
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
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        f = raw[p]
        p += 1
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=p).copy()
        p += stride
        if f == 0:
            pass
        elif f == 1:  # Sub: sequential left-dependency
            for i in range(ch, stride):
                cur[i] = (int(cur[i]) + int(cur[i - ch])) & 0xFF
        elif f == 2:  # Up: vectorized (uint8 add wraps mod 256)
            cur += prev
        elif f == 3:  # Average
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad scanline filter {f}")
        out[y] = cur
        prev = out[y]
    return out.reshape(h, w, ch)
