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


def filter_stream(arr: np.ndarray, filter_type=0) -> bytes:
    """Apply PNG scanline filtering to an (H, W, C) uint8 array and
    return the raw (uncompressed) filtered byte stream — one filter-id
    byte plus ``W*C`` data bytes per row. Shared by the still-image
    encoder and the APNG frame encoder (fdAT carries the same stream).

    ``filter_type`` is either one filter id (0-4) applied to every
    scanline, or a length-H sequence of per-row filter ids (how adaptive
    encoders behave — exercises the decoder's mixed-run grouping)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in _COLOR_FOR_CHANNELS:
        raise ValueError(f"unsupported channel count {ch}")
    row_filters = [filter_type] * h if np.isscalar(filter_type) else list(filter_type)
    if len(row_filters) != h or any(not 0 <= f <= 4 for f in row_filters):
        raise ValueError(f"bad filter type {filter_type}")
    flat = a.reshape(h, w * ch).astype(np.int16)  # int16: filter math needs signed
    prev = np.zeros(w * ch, dtype=np.int16)
    lines = []
    for y in range(h):
        ft = row_filters[y]
        raw = flat[y]
        left = np.concatenate([np.zeros(ch, dtype=np.int16), raw[:-ch]])
        up = prev
        up_left = np.concatenate([np.zeros(ch, dtype=np.int16), up[:-ch]])
        if ft == 0:
            out = raw
        elif ft == 1:
            out = raw - left
        elif ft == 2:
            out = raw - up
        elif ft == 3:
            out = raw - ((left + up) >> 1)
        else:  # Paeth
            p = left + up - up_left
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - up_left)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, up_left))
            out = raw - pred
        lines.append(bytes([ft]) + (out & 0xFF).astype(np.uint8).tobytes())
        prev = raw
    return b"".join(lines)


def encode_png(arr: np.ndarray, filter_type=0) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as a PNG (see
    ``filter_stream`` for the per-row filter_type contract)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_FOR_CHANNELS[ch], 0, 0, 0)
    idat = zlib.compress(filter_stream(a, filter_type), 6)
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
    return defilter_stream(raw, w, h, ch)


def defilter_stream(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filtering on a decompressed byte stream and
    return the (H, W, C) uint8 image. Shared by the still-image decoder
    and the APNG frame decoder (fdAT regions carry the same stream)."""
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = lines[:, 0]
    if filters.max(initial=0) > 4:
        raise ValueError(f"bad scanline filter {int(filters.max())}")
    data = lines[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)

    # Filters 0 (None) and 1 (Sub) never read the previous row, so every
    # such scanline decodes in one batched numpy pass. Sub is a per-channel
    # modular prefix sum: summing raw deltas in int64 then masking &0xFF is
    # exact because addition is associative mod 256.
    none_rows = filters == 0
    out[none_rows] = data[none_rows]
    sub_rows = np.nonzero(filters == 1)[0]
    if sub_rows.size:
        blk = data[sub_rows].reshape(-1, w, ch).astype(np.int64)
        out[sub_rows] = (np.cumsum(blk, axis=1) & 0xFF).reshape(-1, stride)

    # Filters 2/3/4 read the decoded row above; decode maximal same-filter
    # runs in row order. Up runs collapse to a column-wise prefix sum;
    # Average/Paeth runs use an anti-diagonal wavefront (the only
    # dependencies are left / up / up-left, so cells on a diagonal are
    # independent): sequential numpy steps drop from H*W bytes to H+W rows.
    zeros = np.zeros(stride, dtype=np.uint8)
    y = 0
    while y < h:
        ft = int(filters[y])
        if ft <= 1:
            y += 1
            continue
        e = y + 1
        while e < h and filters[e] == ft:
            e += 1
        prev = out[y - 1] if y > 0 else zeros
        if ft == 2:  # Up
            out[y:e] = (
                np.cumsum(data[y:e].astype(np.int64), axis=0) + prev.astype(np.int64)
            ) & 0xFF
        else:  # Average / Paeth wavefront
            out[y:e] = _defilter_wavefront(data[y:e], prev, w, ch, paeth=ft == 4)
        y = e
    return out.reshape(h, w, ch)


def _defilter_wavefront(block: np.ndarray, prev_row: np.ndarray, w: int, ch: int, paeth: bool) -> np.ndarray:
    """Decode a run of Average (3) or Paeth (4) filtered scanlines.

    Cell (y, x) depends on (y, x-1), (y-1, x), (y-1, x-1) only, so all
    cells on an anti-diagonal y + x = d are independent and compute as one
    vectorized numpy step. A zero pad row/column supplies the RFC 2083
    boundary values (left = up-left = 0 at x = 0).
    """
    H = block.shape[0]
    filt = block.reshape(H, w, ch).astype(np.int16)
    # Skewed storage: S[y, y + x] holds decoded pixel (y, x) for rows
    # y = 1..H and pixel columns x = 1..w (x = 0 is the zero pad), so an
    # anti-diagonal d is the plain column slice S[:, d] — a view, not an
    # advanced-indexing gather.
    D = H + w + 1
    S = np.zeros((H + 1, D, ch), dtype=np.int16)
    S[0, 1 : w + 1] = prev_row.reshape(w, ch)
    Fs = np.zeros((H + 1, D, ch), dtype=np.int16)
    for y in range(1, H + 1):
        Fs[y, y + 1 : y + w + 1] = filt[y - 1]
    for d in range(2, H + w + 1):
        ylo = max(1, d - w)
        yhi = min(H, d - 1)
        a = S[ylo : yhi + 1, d - 1]
        b = S[ylo - 1 : yhi, d - 1]
        if paeth:
            c = S[ylo - 1 : yhi, d - 2]
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
        else:
            pred = (a + b) >> 1
        S[ylo : yhi + 1, d] = (Fs[ylo : yhi + 1, d] + pred) & 0xFF
    out = np.empty((H, w * ch), dtype=np.uint8)
    for y in range(1, H + 1):
        out[y - 1] = S[y, y + 1 : y + w + 1].reshape(w * ch)
    return out
