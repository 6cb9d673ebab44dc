"""Pure-stdlib BMP + ICO codec (pixel-exact decode + encoder twins).

BMP (Windows device-independent bitmap) and ICO (favicon container)
round out the lossless image formats: favicons are fetched for nearly
every crawled host, and uncompressed BMPs still appear in legacy
corpora. Both are exactly decodable with numpy alone — no entropy
coding at all — so the per-pixel-exact formula oracles used for
PNG/GIF/VP8L transfer unchanged.

Format per the public Windows BMP spec / MS ICO documentation:

- BMP: 14-byte BITMAPFILEHEADER ('BM', file size, pixel-data offset),
  then BITMAPINFOHEADER (biSize >= 40): width, signed height (negative
  = top-down row order), bit count, compression. Supported here:
  BI_RGB (uncompressed) at 8 bpp (palette), 24 bpp (BGR), 32 bpp
  (BGRX); rows padded to 4-byte boundaries; bottom-up by default.
- ICO: ICONDIR (reserved 0, type 1, count), 16-byte ICONDIRENTRYs
  (width/height bytes where 0 encodes 256, payload size + offset).
  Each payload is either a full PNG stream (modern favicons) or a DIB:
  a BITMAPINFOHEADER whose biHeight is DOUBLED, covering the XOR
  (color) image followed by a 1-bpp AND (transparency) mask, both
  bottom-up with 4-byte row padding. Masked-out pixels decode to
  black (0,0,0) — a fixed, documented rule so stats stay oracle-exact.

Malformed input raises :class:`BmpError`; RLE and bitfield
compressions raise NotImplementedError — corpus kernels skip, not die.
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    pass


def _decode_dib(
    b: bytes, off: int, *, ico_mask: bool = False
) -> np.ndarray:
    """Decode a BITMAPINFOHEADER DIB at ``off``. With ``ico_mask`` the
    stored height is double the visual height and a 1-bpp AND mask
    follows the XOR image (ICO convention)."""
    if off + 40 > len(b):
        raise BmpError("truncated DIB header")
    (size, w, h, planes, bits, comp) = struct.unpack_from("<IiihHI", b, off)
    if size < 40:
        raise BmpError(f"unsupported DIB header size {size}")
    if comp == 1 or comp == 2:
        raise NotImplementedError("RLE-compressed BMP")
    if comp == 3:
        raise NotImplementedError("BI_BITFIELDS BMP")
    if comp != 0:
        raise BmpError(f"unknown BMP compression {comp}")
    top_down = h < 0
    h = abs(h)
    if ico_mask:
        if h % 2:
            raise BmpError("ICO DIB height must be even (XOR + AND)")
        h //= 2
    if w < 1 or h < 1 or w > 1 << 16 or h > 1 << 16:
        raise BmpError("bad BMP dimensions")
    (n_colors,) = struct.unpack_from("<I", b, off + 32)
    pos = off + size
    if bits == 8:
        n_pal = n_colors or 256
        pal_raw = b[pos : pos + 4 * n_pal]
        if len(pal_raw) < 4 * n_pal:
            raise BmpError("truncated BMP palette")
        palette = np.frombuffer(pal_raw, dtype=np.uint8).reshape(-1, 4)
        pos += 4 * n_pal
        stride = (w + 3) & ~3
        raw = b[pos : pos + stride * h]
        if len(raw) < stride * h:
            raise BmpError("truncated BMP pixel data")
        idx = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)[:, :w]
        if int(idx.max(initial=0)) >= n_pal:
            raise BmpError("palette index out of range")
        img = palette[idx][:, :, [2, 1, 0]]  # BGRX -> RGB
        pos += stride * h
    elif bits in (24, 32):
        bpp = bits // 8
        stride = (w * bpp + 3) & ~3
        raw = b[pos : pos + stride * h]
        if len(raw) < stride * h:
            raise BmpError("truncated BMP pixel data")
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
        img = rows[:, : w * bpp].reshape(h, w, bpp)[:, :, [2, 1, 0]]
        pos += stride * h
    else:
        raise NotImplementedError(f"{bits}-bpp BMP")
    if not top_down:
        img = img[::-1]
    if ico_mask:
        mask_stride = ((w + 31) // 32) * 4
        raw = b[pos : pos + mask_stride * h]
        if len(raw) < mask_stride * h:
            raise BmpError("truncated ICO AND mask")
        mbits = np.unpackbits(
            np.frombuffer(raw, dtype=np.uint8).reshape(h, mask_stride),
            axis=1,
        )[:, :w]
        mask = mbits[::-1].astype(bool)  # bottom-up like the XOR image
        img = np.where(mask[:, :, None], 0, img)
    return np.ascontiguousarray(img)


def decode_bmp(b: bytes) -> np.ndarray:
    """BMP file -> (h, w, 3) uint8 RGB array."""
    if len(b) < 54 or b[:2] != b"BM":
        raise BmpError("not a BMP file")
    return _decode_dib(b, 14)


def encode_bmp(
    img: np.ndarray, *, bits: int = 24, top_down: bool = False
) -> bytes:
    """Deterministic BMP encoder twin: 24/32 bpp BI_RGB, or 8 bpp with
    a palette built from the image's unique colors in lexicographic
    RGB order (<= 256 required)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, _ = img.shape
    rows = img if top_down else img[::-1]
    pal_block = b""
    if bits == 8:
        flat = rows.reshape(-1, 3)
        colors = np.unique(flat, axis=0)  # lexicographic: deterministic
        if len(colors) > 256:
            raise ValueError("more than 256 colors for 8-bpp BMP")
        lut = {tuple(c): k for k, c in enumerate(colors)}
        idx = np.array(
            [lut[tuple(p)] for p in flat], dtype=np.uint8
        ).reshape(h, w)
        stride = (w + 3) & ~3
        body = np.zeros((h, stride), dtype=np.uint8)
        body[:, :w] = idx
        pal = np.zeros((len(colors), 4), dtype=np.uint8)
        pal[:, :3] = colors[:, [2, 1, 0]]  # RGB -> BGRX
        pal_block = pal.tobytes()
        n_colors = len(colors)
    elif bits in (24, 32):
        bpp = bits // 8
        stride = (w * bpp + 3) & ~3
        body = np.zeros((h, stride), dtype=np.uint8)
        px = rows[:, :, [2, 1, 0]]  # RGB -> BGR
        if bpp == 4:
            px = np.concatenate(
                [px, np.zeros((h, w, 1), dtype=np.uint8)], axis=2
            )
        body[:, : w * bpp] = px.reshape(h, w * bpp)
        n_colors = 0
    else:
        raise ValueError(f"unsupported encode depth {bits}")
    info = struct.pack(
        "<IiihHIIiiII",
        40, w, -h if top_down else h, 1, bits, 0,
        body.size, 2835, 2835, n_colors, 0,
    )
    offset = 14 + 40 + len(pal_block)
    total = offset + body.size
    hdr = b"BM" + struct.pack("<IHHI", total, 0, 0, offset)
    return hdr + info + pal_block + body.tobytes()


def decode_ico(b: bytes) -> np.ndarray:
    """ICO file -> (h, w, 3) uint8 RGB of the LARGEST entry (the
    favicon curation convention); PNG-payload entries delegate to
    codecs/png.py, DIB entries decode XOR+AND with masked pixels
    forced to black."""
    if len(b) < 6 or b[:4] != b"\x00\x00\x01\x00":
        raise BmpError("not an ICO file")
    (count,) = struct.unpack_from("<H", b, 4)
    if count < 1:
        raise BmpError("empty ICO directory")
    best = None
    for k in range(count):
        off = 6 + 16 * k
        if off + 16 > len(b):
            raise BmpError("truncated ICO directory")
        w = b[off] or 256
        h = b[off + 1] or 256
        size, data_off = struct.unpack_from("<II", b, off + 8)
        if best is None or w * h > best[0]:
            best = (w * h, size, data_off)
    _, size, data_off = best
    payload = b[data_off : data_off + size]
    if len(payload) < size:
        raise BmpError("truncated ICO payload")
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from finetoo_sp_spark.codecs.png import decode_png

        return decode_png(payload)
    return _decode_dib(payload, 0, ico_mask=True)


def encode_ico(
    img: np.ndarray, *, as_png: bool = False, masked: np.ndarray | None = None
) -> bytes:
    """Deterministic single-entry ICO twin: PNG payload or a 24-bpp
    DIB with doubled height and an AND mask (``masked`` is an optional
    (h, w) bool array of transparent pixels; default fully opaque)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    if w > 256 or h > 256:
        raise ValueError("ICO entries cap at 256x256")
    if as_png:
        from finetoo_sp_spark.codecs.png import encode_png

        payload = encode_png(img)
    else:
        rows = img[::-1][:, :, [2, 1, 0]]
        stride = (w * 3 + 3) & ~3
        body = np.zeros((h, stride), dtype=np.uint8)
        body[:, : w * 3] = rows.reshape(h, w * 3)
        mask_stride = ((w + 31) // 32) * 4
        mbits = np.zeros((h, mask_stride * 8), dtype=np.uint8)
        if masked is not None:
            mbits[:, :w] = np.asarray(masked, dtype=np.uint8)[::-1]
        mask_body = np.packbits(mbits, axis=1)[:, :mask_stride]
        info = struct.pack(
            "<IiihHIIiiII",
            40, w, h * 2, 1, 24, 0,
            body.size + mask_body.size, 0, 0, 0, 0,
        )
        payload = info + body.tobytes() + mask_body.tobytes()
    entry = struct.pack(
        "<BBBBHHII",
        0 if w == 256 else w, 0 if h == 256 else h,
        0, 0, 1, 24, len(payload), 6 + 16,
    )
    return b"\x00\x00\x01\x00" + struct.pack("<H", 1) + entry + payload
