"""Pure-stdlib GIF codec (numpy + struct only).

Completes the image-decode seam's format set (PNG, JPEG baseline +
progressive, WebP-lossless, now GIF): probe-only dimensions become real
pixels for dHash / near-dup / image-stats. GIF87a/GIF89a per the public
W3C specification: logical screen descriptor, global/local color
tables, LZW-compressed index streams in 255-byte sub-blocks (variable
code width 3..12 bits, LSB-first, CLEAR/END codes, dictionary growth
one entry per decoded code), 4-pass interlacing, and the GIF89a
graphic-control transparency index. Animated files decode their FIRST
frame (the curation-signal frame); malformed streams raise ValueError.

The encoder is a real LZW compressor (hash-dict, CLEAR on dictionary
overflow) over a palette built from the distinct colors in
first-occurrence order — deterministic and lossless for any image with
<= 256 distinct colors, so fixtures assert decode(encode(x)) == x
bit-exactly and a SQL oracle can recompute stats from the pixel
formula alone.

No code is derived from giflib/PIL; the format is implemented from the
spec text. Scale note: byte-serial Python entropy layer — oracle-corpus
and probe duty; swaps out behind decode_image() like the other codecs.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------- decode


class _SubBlockReader:
    """Concatenated data sub-blocks (len byte + payload, 0 terminates)."""

    def __init__(self, data: bytes, pos: int):
        self.chunks = []
        while True:
            if pos >= len(data):
                raise ValueError("truncated GIF sub-blocks")
            n = data[pos]
            pos += 1
            if n == 0:
                break
            self.chunks.append(data[pos : pos + n])
            if len(self.chunks[-1]) != n:
                raise ValueError("truncated GIF sub-block")
            pos += n
        self.data = b"".join(self.chunks)
        self.end = pos


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, width, prev
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1
        prev = None

    width = min_code_size + 1
    prev: list[int] | None = None
    reset()
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table) or not table[code]:
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table) and (table[code] or code < clear):
            entry = table[code]
            table.append(prev + [entry[0]])
        elif code == len(table):
            entry = prev + [prev[0]]
            table.append(entry)
        else:
            raise ValueError("bad LZW code")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out[:n_pixels]


_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def decode_gif(data: bytes) -> np.ndarray:
    """Decode a GIF to (H, W, 3) RGB or (H, W, 4) RGBA uint8 (alpha kept
    only when a transparent index is declared and used). Animated files
    return the FIRST frame composited onto the logical screen."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh = struct.unpack("<HH", data[6:10])
    packed = data[10]
    gct = None
    pos = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        if len(gct) != n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    transparent = None
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = data[pos + 1]
            if label == 0xF9 and data[pos + 2] >= 4:  # graphic control
                flags = data[pos + 3]
                if flags & 1:
                    transparent = data[pos + 6]
            sub = _SubBlockReader(data, pos + 2)
            pos = sub.end
            continue
        if b0 != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b0:02X}")
        left, top, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
        ipacked = data[pos + 9]
        pos += 10
        table = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image with no color table")
        min_code = data[pos]
        if not 2 <= min_code <= 11:
            raise ValueError("bad LZW minimum code size")
        sub = _SubBlockReader(data, pos + 1)
        pos = sub.end
        idx = np.array(_lzw_decode(sub.data, min_code, w * h), dtype=np.int64)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data underflow")
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF index beyond color table")
        if ipacked & 0x40:  # interlaced: reorder rows
            rows = idx.reshape(h, w)
            out_rows = np.zeros_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, h, step):
                    out_rows[y] = rows[src]
                    src += 1
            idx = out_rows.reshape(-1)
        rgb = table[idx].reshape(h, w, 3)
        # first frame only: composite onto the logical screen (pad if
        # the frame doesn't cover it; uncovered area = index 0 color)
        if (left, top, w, h) != (0, 0, sw, sh):
            base = np.zeros((sh, sw, 3), dtype=np.uint8)
            base[:, :] = table[0]
            base[top : top + h, left : left + w] = rgb
            rgb = base
        if transparent is not None and (idx == transparent).any():
            alpha = np.where(idx.reshape(h, w) == transparent, 0, 255).astype(
                np.uint8
            )
            if (left, top, w, h) != (0, 0, sw, sh):
                a = np.full((sh, sw), 255, dtype=np.uint8)
                a[top : top + h, left : left + w] = alpha
                alpha = a
            return np.concatenate([rgb, alpha[:, :, None]], axis=2)
        return rgb
    raise ValueError("no image data in GIF")


# ---------------------------------------------------------------- encode


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    put(clear, width)
    run: tuple[int, ...] = ()
    for px in indices:
        cand = run + (px,)
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        table[cand] = next_code
        # the DECODER grows its width when its table reaches 1<<width
        # right after adding this entry — mirror that boundary exactly
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            put(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = (px,)
    if run:
        put(table[run], width)
    put(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Deterministic GIF89a encoder for (H, W) grayscale or (H, W, 3)
    RGB uint8 arrays with <= 256 distinct colors (palette in first-
    occurrence order, real LZW compression). Lossless by construction —
    fixtures assert decode(encode(x)) == x."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=2)
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    colors: list[tuple[int, int, int]] = []
    seen: dict[tuple[int, int, int], int] = {}
    idx = np.zeros(h * w, dtype=np.int64)
    for i, px in enumerate(map(tuple, flat)):
        j = seen.get(px)
        if j is None:
            j = seen[px] = len(colors)
            colors.append(px)
        idx[i] = j
    if len(colors) > 256:
        raise ValueError("GIF needs <= 256 distinct colors")
    size_bits = max(1, (len(colors) - 1).bit_length())
    n_table = 1 << size_bits
    min_code = max(2, size_bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (size_bits - 1), 0, 0])  # GCT flag + size, bg, aspect
    for c in colors:
        out += bytes(c)
    out += b"\x00\x00\x00" * (n_table - len(colors))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    if interlace:
        rows = idx.reshape(h, w)
        order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
        idx = rows[order].reshape(-1)
    out += bytes([min_code])
    lzw = _lzw_encode([int(x) for x in idx], min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# ------------------------------------------------------------- animation


def decode_gif_frames(data: bytes):
    """Decode ALL frames of a (possibly animated) GIF.

    Returns (frames, delays_cs, loop_count): frames are the COMPOSITED
    (screen_h, screen_w, 3) RGB uint8 canvases the viewer would show —
    per-frame rects are painted onto the logical screen honoring the
    GIF89a graphic-control disposal methods (0/1 leave, 2 restore to
    the background color, 3 restore to the previous canvas) and the
    transparent index (transparent pixels keep the underlying canvas).
    delays_cs are the per-frame GCE delays in centiseconds; loop_count
    is the NETSCAPE2.0 iteration count (0 = loop forever) or -1 when
    the extension is absent. The initial canvas and disposal-2 fill are
    the global-color-table background entry (black when there is no
    GCT) — the deterministic choice our encoder twin also makes.
    Malformed streams raise ValueError, same contract as decode_gif.
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh = struct.unpack("<HH", data[6:10])
    packed = data[10]
    bg_index = data[11]
    gct = None
    pos = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    bg_color = (
        gct[bg_index] if gct is not None and bg_index < len(gct) else np.zeros(3, np.uint8)
    )
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:, :] = bg_color
    frames: list[np.ndarray] = []
    delays: list[int] = []
    loop_count = -1
    transparent = None
    disposal = 0
    delay = 0
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = data[pos + 1]
            if label == 0xF9 and data[pos + 2] >= 4:  # graphic control
                flags = data[pos + 3]
                disposal = (flags >> 2) & 0x07
                delay = struct.unpack("<H", data[pos + 4 : pos + 6])[0]
                transparent = data[pos + 6] if flags & 1 else None
            sub = _SubBlockReader(data, pos + 2)
            if label == 0xFF and sub.data[:11] == b"NETSCAPE2.0":
                body = sub.data[11:]
                if len(body) >= 3 and body[0] == 1:
                    loop_count = struct.unpack("<H", body[1:3])[0]
            pos = sub.end
            continue
        if b0 != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b0:02X}")
        left, top, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
        ipacked = data[pos + 9]
        pos += 10
        table = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image with no color table")
        min_code = data[pos]
        if not 2 <= min_code <= 11:
            raise ValueError("bad LZW minimum code size")
        sub = _SubBlockReader(data, pos + 1)
        pos = sub.end
        idx = np.array(_lzw_decode(sub.data, min_code, w * h), dtype=np.int64)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data underflow")
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF index beyond color table")
        if ipacked & 0x40:  # interlaced
            rows = idx.reshape(h, w)
            out_rows = np.zeros_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, h, step):
                    out_rows[y] = rows[src]
                    src += 1
            idx = out_rows.reshape(-1)
        if left + w > sw or top + h > sh:
            raise ValueError("GIF frame rect outside logical screen")
        before = canvas.copy()  # disposal-3 restore point
        region = canvas[top : top + h, left : left + w]
        idx2 = idx.reshape(h, w)
        painted = table[idx2]
        if transparent is not None:
            mask = idx2 != transparent
            region[mask] = painted[mask]
        else:
            region[:, :] = painted
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_color
        elif disposal == 3:
            canvas = before
        # disposal 0/1: composited canvas carries forward
        transparent = None
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("no image data in GIF")
    return frames, delays, loop_count


def encode_gif_anim(
    sw: int,
    sh: int,
    palette: np.ndarray,
    bg_index: int,
    frames: list[dict],
    loop: int = 0,
) -> bytes:
    """Deterministic animated-GIF89a writer — the fixture twin of
    decode_gif_frames. ``palette`` is the (N<=256, 3) global color
    table; each frame dict carries left, top, idx ((h, w) int index
    array), delay_cs, disposal (0..3), transparent (index or None) and
    optional local_palette ((M, 3) — written as a per-frame LCT).
    Emits one NETSCAPE2.0 loop block, one GCE per frame, real LZW.
    """
    pal = np.asarray(palette, dtype=np.uint8)
    size_bits = max(1, (len(pal) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (size_bits - 1), bg_index, 0])
    out += pal.tobytes() + b"\x00" * 3 * ((1 << size_bits) - len(pal))
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    for fr in frames:
        idx = np.asarray(fr["idx"], dtype=np.int64)
        h, w = idx.shape
        tr = fr.get("transparent")
        flags = (fr.get("disposal", 0) & 0x07) << 2 | (1 if tr is not None else 0)
        out += b"\x21\xf9\x04" + bytes([flags])
        out += struct.pack("<H", fr.get("delay_cs", 0))
        out += bytes([tr or 0, 0])
        out += b"\x2c" + struct.pack(
            "<HHHH", fr.get("left", 0), fr.get("top", 0), w, h
        )
        lct = fr.get("local_palette")
        if lct is not None:
            lct = np.asarray(lct, dtype=np.uint8)
            lbits = max(1, (len(lct) - 1).bit_length())
            out += bytes([0x80 | (lbits - 1)])
            out += lct.tobytes() + b"\x00" * 3 * ((1 << lbits) - len(lct))
            table_bits = lbits
        else:
            out += b"\x00"
            table_bits = size_bits
        min_code = max(2, table_bits)
        out += bytes([min_code])
        lzw = _lzw_encode([int(x) for x in idx.reshape(-1)], min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
