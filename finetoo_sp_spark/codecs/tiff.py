"""Pure-stdlib TIFF codec (pixel-exact decode subset + encoder twin).

Completes the lossless-raster family (PNG/GIF/VP8L/BMP/ICO): TIFF
still circulates in scanned-document and publishing corpora, and its
baseline profiles are exactly decodable with numpy alone. Format per
the public TIFF 6.0 specification:

- 8-byte header (II/MM byte order + magic 42 + first-IFD offset), a
  chain of IFDs whose 12-byte entries carry (tag, type, count,
  value-or-offset) — values <= 4 bytes are inlined, left-justified.
- Baseline profiles decoded here: bilevel/grayscale (8-bit),
  palette-color (ColorMap of 16-bit channels), and full-color RGB
  (8-bit per sample), striped layout (StripOffsets/StripByteCounts/
  RowsPerStrip), Compression 1 (none) or 32773 (PackBits RLE),
  PhotometricInterpretation 0 (WhiteIsZero) / 1 (BlackIsZero) /
  2 (RGB) / 3 (Palette), both byte orders.
- Compression 8/32946 (Deflate, zlib streams per strip) and
  Compression 5 (LZW, TIFF 6.0 §13): MSB-first code packing, 9->12
  bit widths with the interoperable "early change" convention (the
  width bumps when the NEXT table entry would need it — libtiff's
  default, what real writers emit), ClearCode/EOI handling, optional
  Predictor 2 (horizontal differencing per sample, tag 317) undone
  with a per-row cumulative sum mod 256.
- Out-of-subset features raise: JPEG-in-TIFF compression, tiles,
  planar configuration 2, >8-bit samples — :class:`TiffError` is a
  ValueError so corpus kernels SKIP, never die.

The deterministic encoder twin writes grayscale/RGB, either byte
order, optional PackBits / LZW / Deflate (+predictor), and a chosen
RowsPerStrip — every decode branch is exercisable on purpose for the
formula oracles.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class TiffError(ValueError):
    pass


_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(b: bytes, bo: str, ifd_off: int) -> dict[int, list[int]]:
    if ifd_off + 2 > len(b):
        raise TiffError("truncated IFD offset")
    (n_entries,) = struct.unpack_from(bo + "H", b, ifd_off)
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        if off + 12 > len(b):
            raise TiffError("truncated IFD entry")
        tag, typ, count = struct.unpack_from(bo + "HHI", b, off)
        if typ not in (1, 3, 4):
            continue  # RATIONAL/ASCII tags are irrelevant here
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            voff = off + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", b, off + 8)
            if voff + size > len(b):
                raise TiffError("truncated tag value block")
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(bo + fmt * count, b, voff))
    return tags


def _unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits (TIFF 6.0 §9 / Apple RLE) decode to exactly
    ``expected`` bytes."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:  # copy n+1 literal bytes
            if pos + n + 1 > len(data):
                raise TiffError("truncated PackBits literal run")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise TiffError("truncated PackBits repeat run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) != expected:
        raise TiffError("PackBits output length mismatch")
    return bytes(out)


_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW (6.0 §13): MSB-first bit packing, codes 9->12
    bits wide with early change (width bumps when the next entry to be
    ADDED would overflow the current width), 256=Clear / 257=EOI.
    Stops after ``expected`` bytes (strips may pad)."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise TiffError("truncated LZW strip")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _LZW_CLEAR:
            reset()
            continue
        if code == _LZW_EOI:
            break
        if prev is None:
            if code >= 256:
                raise TiffError("LZW stream must start with a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise TiffError("LZW code beyond table")
        out += entry
        prev = entry
        # early change, with the classic one-entry decoder lag: the
        # encoder has already assigned the entry this code will define
        # on the NEXT read, so the width bumps one entry earlier here
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out[:expected])


def _lzw_encode_tiff(data: bytes) -> bytes:
    """Deterministic TIFF-LZW encoder (the decoder's exact twin):
    leading Clear, greedy longest-match, early width change, periodic
    Clear when the table fills at 4094, trailing EOI."""
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {}
    width = 9

    def reset():
        nonlocal table, width
        table = {bytes([i]): i for i in range(256)}
        width = 9

    reset()
    put(_LZW_CLEAR, width)
    run = b""
    next_code = 258
    for byte in data:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            put(_LZW_CLEAR, width)
            reset()
            next_code = 258
        run = bytes([byte])
    if run:
        put(table[run], width)
    put(_LZW_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode_tiff(b: bytes) -> np.ndarray:
    """TIFF file -> (h, w, 3) uint8 RGB array (first IFD)."""
    if len(b) < 8 or b[:4] not in (b"II*\x00", b"MM\x00*"):
        raise TiffError("not a TIFF file")
    bo = "<" if b[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(bo + "I", b, 4)
    tags = _read_ifd(b, bo, ifd_off)
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as e:
        raise TiffError(f"missing required tag {e}") from e
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8])
    rows_per_strip = tags.get(278, [h])[0]
    planar = tags.get(284, [1])[0]
    predictor = tags.get(317, [1])[0]
    if planar != 1:
        raise TiffError("planar configuration 2 unsupported")
    if comp not in (1, 5, 8, 32773, 32946):
        raise TiffError(f"unsupported TIFF compression {comp}")
    if predictor not in (1, 2):
        raise TiffError(f"unsupported TIFF predictor {predictor}")
    if predictor == 2 and comp not in (5, 8, 32946):
        raise TiffError("predictor 2 needs LZW/Deflate")
    if any(x != 8 for x in bps):
        raise TiffError("only 8-bit samples supported")
    if len(offsets) != len(counts):
        raise TiffError("StripOffsets/StripByteCounts length mismatch")
    if w < 1 or h < 1 or spp not in (1, 3):
        raise TiffError("bad geometry or SamplesPerPixel")

    raw = bytearray()
    remaining_rows = h
    for off, cnt in zip(offsets, counts):
        strip = b[off : off + cnt]
        if len(strip) < cnt:
            raise TiffError("truncated strip")
        n_rows = min(rows_per_strip, remaining_rows)
        expected = n_rows * w * spp
        if comp == 32773:
            raw += _unpackbits(strip, expected)
        elif comp == 5:
            raw += _lzw_decode_tiff(strip, expected)
        elif comp in (8, 32946):  # Adobe deflate / old deflate tag
            try:
                raw += zlib.decompress(strip)[:expected]
            except zlib.error as e:
                raise TiffError(f"bad deflate strip: {e}") from e
        else:
            raw += strip[:expected]
        if comp == 1 and len(strip) < expected:
            raise TiffError("strip shorter than its rows")
        remaining_rows -= n_rows
    if len(raw) != h * w * spp:
        raise TiffError("pixel data length mismatch")
    arr = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:
        # undo horizontal differencing: cumulative sum per row, per
        # sample channel, mod 256
        arr = np.cumsum(arr.astype(np.uint64), axis=1).astype(np.uint8)

    if photo == 2:
        if spp != 3:
            raise TiffError("RGB photometric needs 3 samples")
        return np.ascontiguousarray(arr)
    if photo == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) != 3 * 256:
            raise TiffError("palette TIFF without a 256-entry ColorMap")
        lut = (np.array(cmap, dtype=np.uint32).reshape(3, 256).T >> 8).astype(
            np.uint8
        )
        return np.ascontiguousarray(lut[arr[:, :, 0]])
    if photo in (0, 1):
        gray = arr[:, :, 0]
        if photo == 0:
            gray = 255 - gray
        return np.ascontiguousarray(np.repeat(gray[:, :, None], 3, axis=2))
    raise TiffError(f"unsupported photometric {photo}")


def _packbits(row: bytes) -> bytes:
    """Deterministic PackBits encoder (greedy: runs >= 3 become repeat
    packets, everything else literals — the spec's recommended scheme)."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        j = i  # literal packet: extend until a >=3 run starts or 128 max
        while j < n and j - i < 128:
            if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + row[i:j]
        i = j
    return bytes(out)


def encode_tiff(
    img: np.ndarray,
    *,
    big_endian: bool = False,
    packbits: bool = False,
    lzw: bool = False,
    deflate: bool = False,
    predictor: int = 1,
    rows_per_strip: int = 0,
) -> bytes:
    """Deterministic TIFF encoder twin: grayscale (2-D input) or RGB
    (h, w, 3), striped, Compression 1 / PackBits / LZW (optionally
    with Predictor 2 horizontal differencing), either byte order."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if gray:
        h, w = img.shape
        spp = 1
    else:
        h, w, spp = img.shape
        if spp != 3:
            raise ValueError("RGB input must be (h, w, 3)")
    if packbits + lzw + deflate > 1:
        raise ValueError("choose one compression")
    if predictor == 2 and not (lzw or deflate):
        raise ValueError("predictor 2 needs LZW/Deflate")
    rps = rows_per_strip or h
    bo = ">" if big_endian else "<"
    src = img.reshape(h, w, spp)
    if predictor == 2:
        diffed = src.astype(np.int16)
        diffed[:, 1:] = diffed[:, 1:] - src.astype(np.int16)[:, :-1]
        src = (diffed & 0xFF).astype(np.uint8)
    strips = []
    for top in range(0, h, rps):
        raw = src[top : top + rps].tobytes()
        if packbits:
            strips.append(_packbits(raw))
        elif lzw:
            strips.append(_lzw_encode_tiff(raw))
        elif deflate:
            strips.append(zlib.compress(raw, 6))
        else:
            strips.append(raw)

    # layout: header | strip data | tag-overflow arrays | IFD
    header = (b"MM\x00*" if big_endian else b"II*\x00")
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    if pos % 2:
        pos += 1  # word-align the arrays after the strip data

    def tag(t, typ, vals):
        return (t, typ, vals)

    entries = [
        tag(256, 4, [w]),
        tag(257, 4, [h]),
        tag(258, 3, [8] * spp),
        tag(259, 3, [32773 if packbits else 5 if lzw else 8 if deflate else 1]),
        tag(262, 3, [2 if spp == 3 else 1]),
        tag(273, 4, strip_offsets),
        tag(277, 3, [spp]),
        tag(278, 4, [rps]),
        tag(279, 4, [len(s) for s in strips]),
    ]
    if predictor == 2:
        entries.append(tag(317, 3, [2]))
    overflow = bytearray()
    fixed = []
    for t, typ, vals in entries:
        size = _TYPE_SIZES[typ] * len(vals)
        fmt = {3: "H", 4: "I"}[typ]
        packed = struct.pack(bo + fmt * len(vals), *vals)
        if size <= 4:
            fixed.append((t, typ, len(vals), packed.ljust(4, b"\x00"), None))
        else:
            fixed.append((t, typ, len(vals), None, len(overflow)))
            overflow += packed
    ifd_off = pos + len(overflow)

    out = bytearray(header)
    out += struct.pack(bo + "I", ifd_off)
    for s in strips:
        out += s
    if len(out) % 2:
        out += b"\x00"
    out += overflow
    out += struct.pack(bo + "H", len(fixed))
    for t, typ, count, inline, ov_off in fixed:
        out += struct.pack(bo + "HHI", t, typ, count)
        if inline is not None:
            out += inline
        else:
            out += struct.pack(bo + "I", pos + ov_off)
    out += struct.pack(bo + "I", 0)  # no next IFD
    return bytes(out)
