"""Minimal pure-stdlib JPEG codec (numpy + struct only).

Closes the JPEG half of the image-decode seam without a codec library:
a DCT decoder for baseline (SOF0/SOF1) AND progressive (SOF2) Huffman
files — 8-bit, 1/3/4 components (gray, YCbCr, Adobe CMYK/YCCK with
the inverted-sample convention), arbitrary sampling factors up to
2x2 (4:4:4 / 4:2:2 / 4:2:0), restart markers, multi-scan streams with
spectral selection and successive approximation (T.81 Annex G.2: DC
first/refine, AC first with EOB-run coding, AC refinement with
correction bits) — plus deterministic baseline and progressive
encoders used by tests and datagen. Arithmetic-coded files raise
NotImplementedError with a recognizable message so corpus kernels can
skip, not die.

All tables are the public ISO/IEC 10918-1 (ITU T.81) Annex K defaults;
the zigzag order, Huffman canonical-code construction, byte stuffing,
and the JFIF YCbCr<->RGB equations follow the spec text. No code is
derived from any existing codec implementation.

Exactness property used by the SQL oracle (contract q_multimodal):
a flat 8x8 block of gray value v has a DC-only FDCT (DC = 8*(v-128),
all ACs mathematically zero -> quantize to 0), so when 8*(v-128) is a
multiple of the DC quant step the whole pipeline round-trips the block
bit-exactly — decoded pixels have a closed form DuckDB can recompute
without ever seeing a JPEG.

Scale note: the entropy (Huffman) layer is bit-serial Python — fine
for the synthetic oracle corpus and metadata-sized probes; a real
100 TB image pass would swap this module for a vectorized/native codec
behind the same decode_image() seam (the Spark plan shape — binary in,
typed stats out, no shuffle — is unchanged by that swap).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# Annex K.1 / K.2 default quantization tables (natural row-major order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# zigzag scan: natural index of the k-th zigzag position
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3 default Huffman tables: (BITS[1..16], HUFFVAL)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# 8x8 DCT-II basis matrix A: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
# FDCT of block f is A @ f @ A.T, IDCT of F is A.T @ F @ A.
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


# ---------------------------------------------------------------- huffman


def _canonical_codes(bits, huffval):
    """(value -> (code, length)) per the T.81 canonical algorithm."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_lut(bits, huffval):
    """16-bit peek tables (vals, lens): every index whose high bits
    spell a canonical code maps to that code's value and length, so the
    decoder resolves a symbol with ONE array lookup instead of walking
    up to 16 bits (the entropy layer is the decoder's serial hot path).
    lens == 0 marks an invalid prefix. 128 KiB per table, built once
    per DHT segment with slice fills."""
    vals = np.zeros(1 << 16, dtype=np.uint8)
    lens = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            vals[lo:hi] = huffval[k]
            lens[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return vals, lens


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Buffered bit reader over entropy-coded data with 0xFF00
    unstuffing. At a marker boundary the buffer is topped up with the
    spec's 1-bit padding (T.81 F.1.2.3 pads the tail of each entropy
    segment with 1s); ``padded`` lets the caller distinguish legitimate
    end-of-segment padding from a truncated stream."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.pad_bits = 0  # virtual 1-bits appended past a marker/EOF

    def _ensure(self, n: int) -> None:
        d = self.data
        while self.nbits < n:
            if self.pos < len(d):
                b = d[self.pos]
                if b == 0xFF:
                    nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                    if nxt == 0x00:
                        self.pos += 2
                    else:  # marker: stop consuming, pad with 1-bits
                        self.acc = (self.acc << 8) | 0xFF
                        self.nbits += 8
                        self.pad_bits += 8
                        continue
                else:
                    self.pos += 1
                self.acc = (self.acc << 8) | b
                self.nbits += 8
            else:
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                self.pad_bits += 8

    @property
    def consumed_pad(self) -> bool:
        """True once decoding has actually consumed virtual pad bits
        (peeking past a marker alone does not count — pads sit in the
        LOW bits of the buffer, consumption takes from the top)."""
        return self.nbits < self.pad_bits

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._ensure(n)
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1  # keep the acc a small int
        return v

    def huff(self, lut) -> int:
        vals, lens = lut
        self._ensure(16)
        idx = (self.acc >> (self.nbits - 16)) & 0xFFFF
        ln = lens[idx]
        if ln == 0:
            raise ValueError("bad Huffman code")
        self.nbits -= int(ln)
        self.acc &= (1 << self.nbits) - 1
        return int(vals[idx])

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0
        self.pad_bits = 0

    def at_marker(self) -> int | None:
        """Peek: is the (byte-aligned) stream sitting on a marker?"""
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
            return d[self.pos + 1]
        return None


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend(bits_val: int, ssss: int) -> int:
    """T.81 EXTEND: map the ssss raw bits back to a signed value."""
    if ssss == 0:
        return 0
    if bits_val < (1 << (ssss - 1)):
        return bits_val - (1 << ssss) + 1
    return bits_val


# ---------------------------------------------------------------- encoder


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(n_by, n_bx, 64) quantized zigzag coefficients for an (H8, W8)
    level-shifted float plane whose dims are multiples of 8."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,ijxy,vy->ijuv", _A, blocks, _A)
    q = np.round(coef / qtab).astype(np.int32)
    return q.reshape(h // 8, w // 8, 64)[:, :, ZIGZAG]


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes) -> int:
    dc = int(zz[0])
    diff = dc - pred
    ssss = _category(diff)
    code, ln = dc_codes[ssss]
    w.write(code, ln)
    if ssss:
        w.write(diff if diff > 0 else diff + (1 << ssss) - 1, ssss)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        ssss = _category(v)
        code, ln = ac_codes[(run << 4) | ssss]
        w.write(code, ln)
        w.write(v if v > 0 else v + (1 << ssss) - 1, ssss)
        run = 0
    if last_nz != 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht_payload(cls: int, tid: int, table) -> bytes:
    bits, vals = table
    return bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)


def _dqt_payload(tid: int, table: np.ndarray, force_16bit: bool = False) -> bytes:
    """DQT segment body: Pq=0 (8-bit entries) unless any step exceeds
    255 or ``force_16bit`` asks for Pq=1 (big-endian 16-bit entries,
    ISO 10918-1 B.2.4.1)."""
    z = table.reshape(64)[ZIGZAG].astype(np.int64)
    if force_16bit or int(z.max()) > 255:
        return bytes([0x10 | tid]) + z.astype(">u2").tobytes()
    return bytes([tid]) + bytes(z.astype(np.uint8))


def _quantized_components(arr, subsampling, quant_luma, quant_chroma):
    """Shared front half of both encoders: color transform, subsample,
    MCU-pad (edge replicate), FDCT, quantize. Returns (gray, h, w,
    comps, comp_blocks, ql, qc, mcux, mcuy) where comps is a list of
    (id, hs, vs, tq) and comp_blocks[ci] is (n_by, n_bx, 64) quantized
    zigzag coefficients over the MCU-padded grid."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    ql = QUANT_LUMA if quant_luma is None else np.asarray(quant_luma, dtype=np.int32)
    qc = QUANT_CHROMA if quant_chroma is None else np.asarray(quant_chroma, dtype=np.int32)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if gray:
        comps = [(1, 1, 1, 0)]  # (id, hs, vs, tq)
        planes = [a.astype(np.float64) - 128.0]
        qtabs = [ql]
    else:
        if subsampling == "444":
            ys, xs = 1, 1
        elif subsampling == "420":
            ys, xs = 2, 2
        else:
            raise ValueError(f"unsupported subsampling {subsampling}")
        r = a[:, :, 0].astype(np.float64)
        g = a[:, :, 1].astype(np.float64)
        b = a[:, :, 2].astype(np.float64)
        y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        cb = np.clip(np.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0), 0, 255)
        cr = np.clip(np.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0), 0, 255)
        if xs == 2:  # box-average subsample (pad odd dims by edge repeat)
            cb = _box2(cb)
            cr = _box2(cr)
        comps = [(1, xs, ys, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qtabs = [ql, qc, qc]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # pad each plane (edge replicate) to its MCU-aligned size + FDCT
    comp_blocks = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        ph = mcuy * vs * 8
        pw = mcux * hs * 8
        pl = np.empty((ph, pw))
        sh, sw = plane.shape
        pl[:sh, :sw] = plane
        if sw < pw:
            pl[:sh, sw:] = plane[:, -1:]
        if sh < ph:
            pl[sh:, :] = pl[sh - 1 : sh, :]
        comp_blocks.append(_fdct_quant(pl, qtabs[0] if tq == 0 else qc))
    return gray, h, w, comps, comp_blocks, ql, qc, mcux, mcuy


def encode_jpeg_baseline(
    arr: np.ndarray,
    subsampling: str = "444",
    quant_luma: np.ndarray | None = None,
    quant_chroma: np.ndarray | None = None,
    restart_interval: int = 0,
    quant_16bit: bool = False,
) -> bytes:
    """Deterministic baseline JFIF encoder for (H, W) / (H, W, 1)
    grayscale or (H, W, 3) RGB uint8 arrays. ``subsampling`` is '444'
    or '420' (RGB only). Custom quant tables let tests construct
    provably-lossless paths (e.g. a DC step of 8)."""
    gray, h, w, comps, comp_blocks, ql, qc, mcux, mcuy = _quantized_components(
        arr, subsampling, quant_luma, quant_chroma
    )
    dc_tabs = [_canonical_codes(*HUFF_DC_LUMA), _canonical_codes(*HUFF_DC_CHROMA)]
    ac_tabs = [_canonical_codes(*HUFF_AC_LUMA), _canonical_codes(*HUFF_AC_CHROMA)]

    wtr = _BitWriter()
    preds = [0] * len(comps)
    out_chunks = []
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.flush()
                out_chunks.append(bytes(wtr.buf))
                out_chunks.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                wtr = _BitWriter()
                preds = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                td = 0 if ci == 0 else 1
                for by in range(vs):
                    for bx in range(hs):
                        zz = comp_blocks[ci][my * vs + by, mx * hs + bx]
                        preds[ci] = _encode_block(
                            wtr, zz, preds[ci], dc_tabs[td], ac_tabs[td]
                        )
            mcu_count += 1
    wtr.flush()
    out_chunks.append(bytes(wtr.buf))

    # assemble segments
    head = bytearray(b"\xff\xd8")  # SOI
    head += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    head += _seg(0xDB, _dqt_payload(0, ql, quant_16bit))
    if not gray:
        head += _seg(0xDB, _dqt_payload(1, qc, quant_16bit))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(comps)))
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, hs << 4 | vs, tq])
    head += _seg(0xC0, bytes(sof))
    head += _seg(0xC4, _dht_payload(0, 0, HUFF_DC_LUMA))
    head += _seg(0xC4, _dht_payload(1, 0, HUFF_AC_LUMA))
    if not gray:
        head += _seg(0xC4, _dht_payload(0, 1, HUFF_DC_CHROMA))
        head += _seg(0xC4, _dht_payload(1, 1, HUFF_AC_CHROMA))
    if restart_interval:
        head += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(comps)])
    for ci, (cid, *_rest) in enumerate(comps):
        td = 0 if ci == 0 else 1
        sos += bytes([cid, td << 4 | td])
    sos += bytes([0, 63, 0])
    head += _seg(0xDA, bytes(sos))
    return bytes(head) + b"".join(out_chunks) + b"\xff\xd9"


def _box2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-average downsample with edge-replicate padding to even."""
    h, w = plane.shape
    if h % 2:
        plane = np.vstack([plane, plane[-1:]])
    if w % 2:
        plane = np.hstack([plane, plane[:, -1:]])
    return np.round(
        (plane[0::2, 0::2] + plane[0::2, 1::2] + plane[1::2, 0::2] + plane[1::2, 1::2])
        / 4.0
    )


# ------------------------------------------------- progressive encoder

# Flat Huffman tables for the progressive encoder: every DC category at
# 5 bits (16 of 32 slots used — the all-1-bits code stays unassigned,
# as T.81 C.2 requires) and every possible AC RS byte at 9 bits (256 of
# 512 slots). Deliberately valid-but-naive: fixtures exercise the
# decoder's DHT handling and the EOBn/ZRL/refinement code paths without
# an optimal-table builder; compression ratio is irrelevant for tests.
_FLAT_DC = ([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(16)))
# (DHT BITS entries are single bytes, so one length holds at most 255
# codes: 255 nine-bit codes + one ten-bit code covers all 256 RS bytes.)
_FLAT_AC = (
    [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


def default_progressive_scans(n_components: int) -> list[tuple]:
    """A libjpeg-shaped scan script as (comp_indices, Ss, Se, Ah, Al)
    tuples: interleaved DC first pass at Al=1, luma AC split into a
    coarse low band and the tail (spectral selection), chroma AC
    whole-band, then one successive-approximation refinement pass per
    band and a DC refinement — so every Annex G.2 decode path (DC
    first/refine, AC first with EOB runs, AC refinement with correction
    bits) is exercised by the default script."""
    if n_components == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2),
        ([2], 1, 63, 0, 1),
        ([1], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([2], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([0], 1, 63, 1, 0),
    ]


def _scan_units(scan_cis, comps, h, w, hmax, vmax, mcux, mcuy):
    """Block coding order for one scan, as a list of MCUs, each a list
    of (ci, flat_block_index) into the component's MCU-padded
    (mcuy*vs, mcux*hs) block grid. Interleaved scans walk MCU order
    over the padded grid (T.81 A.2.3); a single-component scan walks
    the component's REAL block grid (ceil of its scaled dims, A.2.2) in
    raster order — the padded columns/rows beyond it are not coded."""
    if len(scan_cis) > 1:
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                u = []
                for ci in scan_cis:
                    _cid, hs, vs, _tq = comps[ci]
                    row_w = mcux * hs
                    for by in range(vs):
                        for bx in range(hs):
                            u.append((ci, (my * vs + by) * row_w + mx * hs + bx))
                units.append(u)
        return units
    ci = scan_cis[0]
    _cid, hs, vs, _tq = comps[ci]
    bw = -(-(-(-(w * hs) // hmax)) // 8)
    bh = -(-(-(-(h * vs) // vmax)) // 8)
    row_w = mcux * hs
    return [[(ci, r * row_w + c)] for r in range(bh) for c in range(bw)]


def _shift_mag(v: int, al: int) -> int:
    """AC point transform: arithmetic shift of the MAGNITUDE (T.81
    G.1.2.2 divides by 2^Al truncating toward zero; two's-complement
    shift would round negatives away from zero)."""
    return -((-v) >> al) if v < 0 else (v >> al)


def _emit_eobrun(wtr: _BitWriter, ac_codes, eobrun: int, corr_bits) -> None:
    """EOBn symbol (r = bit length category, r extra bits) followed by
    any buffered refinement correction bits — the decoder reads those
    inline while consuming EOB-covered blocks, so they ride here."""
    if eobrun:
        r = eobrun.bit_length() - 1
        code, ln = ac_codes[r << 4]
        wtr.write(code, ln)
        if r:
            wtr.write(eobrun - (1 << r), r)
    for b in corr_bits:
        wtr.write(b, 1)


class _RestartEmitter:
    """Byte-aligns the writer and appends an RSTn marker every ``ri``
    coding units (T.81 restart semantics: pad with 1-bits, marker
    modulo-8, entropy state resets at the boundary)."""

    def __init__(self, wtr: _BitWriter, ri: int):
        self.wtr = wtr
        self.ri = ri
        self.n = 0

    def boundary(self, unit_idx: int) -> bool:
        if self.ri and unit_idx and unit_idx % self.ri == 0:
            self.wtr.flush()
            self.wtr.buf += bytes([0xFF, 0xD0 + self.n % 8])
            self.n += 1
            return True
        return False


def _encode_dc_scan(wtr, units, flat, dc_codes, ah: int, al: int,
                    ri: int = 0) -> None:
    preds: dict[int, int] = {}
    rst = _RestartEmitter(wtr, ri)
    for ui, unit in enumerate(units):
        if rst.boundary(ui):
            preds = {}
        for ci, bi in unit:
            dc = int(flat[ci][bi][0])
            if ah == 0:
                v = dc >> al  # arithmetic shift: DC point transform
                diff = v - preds.get(ci, 0)
                preds[ci] = v
                ssss = _category(diff)
                code, ln = dc_codes[ssss]
                wtr.write(code, ln)
                if ssss:
                    wtr.write(diff if diff > 0 else diff + (1 << ssss) - 1, ssss)
            else:
                wtr.write((dc >> al) & 1, 1)


def _encode_ac_first_scan(wtr, blocks, ac_codes, ss, se, al,
                          ri: int = 0) -> None:
    eobrun = 0
    rst = _RestartEmitter(wtr, ri)
    for ui, zz in enumerate(blocks):
        if ri and ui and ui % ri == 0:
            if eobrun:  # a run may not cross a restart boundary
                _emit_eobrun(wtr, ac_codes, eobrun, [])
                eobrun = 0
            rst.boundary(ui)
        band = [_shift_mag(int(zz[k]), al) for k in range(ss, se + 1)]
        last = -1
        for i, v in enumerate(band):
            if v:
                last = i
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                _emit_eobrun(wtr, ac_codes, eobrun, [])
                eobrun = 0
            continue
        if eobrun:
            _emit_eobrun(wtr, ac_codes, eobrun, [])
            eobrun = 0
        run = 0
        for v in band[: last + 1]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                wtr.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_codes[(run << 4) | s]
            wtr.write(code, ln)
            wtr.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last < se - ss:
            eobrun = 1  # this block's tail is end-of-band
    if eobrun:
        _emit_eobrun(wtr, ac_codes, eobrun, [])


def _encode_ac_refine_scan(wtr, blocks, ac_codes, ss, se, al,
                           ri: int = 0) -> None:
    """Correction-bit pass (T.81 G.1.2.3): newly-significant
    coefficients code as run/1 symbols whose runs count only
    ZERO-HISTORY positions; a correction bit for every
    already-significant coefficient walked over follows its covering
    symbol; EOB-covered blocks contribute their correction bits after
    the (deferred) EOBn symbol in block order — exactly the order the
    decoder consumes them."""
    eobrun = 0
    pend: list[int] = []  # correction bits riding the deferred EOBn
    rst = _RestartEmitter(wtr, ri)
    for ui, zz in enumerate(blocks):
        if ri and ui and ui % ri == 0:
            if eobrun:
                _emit_eobrun(wtr, ac_codes, eobrun, pend)
                eobrun, pend = 0, []
            rst.boundary(ui)
        # walk events at this precision: 'c'=history coef (corr bit),
        # 'n'=newly significant (sign), 'z'=still zero
        events: list[tuple] = []
        for k in range(ss, se + 1):
            v = int(zz[k])
            av = -v if v < 0 else v
            if (av >> (al + 1)) != 0:
                events.append(("c", (av >> al) & 1))
            elif (av >> al) == 1:
                events.append(("n", 1 if v > 0 else 0))
            else:
                events.append(("z",))
        last_n = -1
        for i, e in enumerate(events):
            if e[0] == "n":
                last_n = i
        if last_n < 0:  # end-of-band block
            eobrun += 1
            pend.extend(e[1] for e in events if e[0] == "c")
            if eobrun == 0x7FFF:
                _emit_eobrun(wtr, ac_codes, eobrun, pend)
                eobrun, pend = 0, []
            continue
        if eobrun:
            _emit_eobrun(wtr, ac_codes, eobrun, pend)
            eobrun, pend = 0, []
        q: list[tuple] = []  # 'z'/'c' events since the last symbol
        zeros = 0
        for e in events[: last_n + 1]:
            if e[0] == "c":
                q.append(e)
            elif e[0] == "z":
                q.append(e)
                zeros += 1
            else:  # newly significant
                while zeros > 15:
                    # ZRL spans the next 16 zero-history positions; the
                    # correction bits interleaved among them (up to and
                    # including just before the 16th zero) follow it
                    code, ln = ac_codes[0xF0]
                    wtr.write(code, ln)
                    seen = 0
                    while q:
                        t = q[0]
                        if t[0] == "z":
                            seen += 1
                            if seen > 16:
                                break
                            q.pop(0)
                        else:
                            if seen == 16:
                                break
                            wtr.write(q.pop(0)[1], 1)
                    zeros -= 16
                code, ln = ac_codes[(zeros << 4) | 1]
                wtr.write(code, ln)
                wtr.write(e[1], 1)  # sign bit of the +-1<<Al coefficient
                for t in q:
                    if t[0] == "c":
                        wtr.write(t[1], 1)
                q, zeros = [], 0
        tail = events[last_n + 1 :]
        if tail:
            eobrun = 1
            pend = [e[1] for e in tail if e[0] == "c"]
    if eobrun:
        _emit_eobrun(wtr, ac_codes, eobrun, pend)


def encode_jpeg_progressive(
    arr: np.ndarray,
    subsampling: str = "444",
    quant_luma: np.ndarray | None = None,
    quant_chroma: np.ndarray | None = None,
    scans: list[tuple] | None = None,
    restart_interval: int = 0,
    quant_16bit: bool = False,
) -> bytes:
    """Deterministic progressive (SOF2) JFIF encoder: same color /
    subsample / FDCT / quantization front end as the baseline encoder,
    so for identical inputs and tables a progressive file decodes to
    EXACTLY the same pixels as the baseline file once all scans are
    consumed (successive approximation is lossless over the quantized
    coefficients). ``scans`` overrides the default script with
    (comp_indices, Ss, Se, Ah, Al) tuples."""
    gray, h, w, comps, comp_blocks, ql, qc, mcux, mcuy = _quantized_components(
        arr, subsampling, quant_luma, quant_chroma
    )
    flat = [cb.reshape(-1, 64).astype(np.int64) for cb in comp_blocks]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if scans is None:
        scans = default_progressive_scans(len(comps))
    dc_codes = _canonical_codes(*_FLAT_DC)
    ac_codes = _canonical_codes(*_FLAT_AC)

    head = bytearray(b"\xff\xd8")
    head += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    head += _seg(0xDB, _dqt_payload(0, ql, quant_16bit))
    if not gray:
        head += _seg(0xDB, _dqt_payload(1, qc, quant_16bit))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(comps)))
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, hs << 4 | vs, tq])
    head += _seg(0xC2, bytes(sof))  # SOF2: progressive DCT, Huffman
    head += _seg(0xC4, _dht_payload(0, 0, _FLAT_DC))
    head += _seg(0xC4, _dht_payload(1, 0, _FLAT_AC))
    if restart_interval:
        head += _seg(0xDD, struct.pack(">H", restart_interval))

    body = bytearray()
    for cis, ss, se, ah, al in scans:
        if ss == 0 and se != 0:
            raise ValueError("DC scan must have Se=0")
        if ss > 0 and len(cis) != 1:
            raise ValueError("AC scans are single-component")
        if ah not in (0, al + 1):
            raise ValueError("refinement scans must have Ah=Al+1")
        sos = bytearray([len(cis)])
        for ci in cis:
            sos += bytes([comps[ci][0], 0x00])  # DC table 0 / AC table 0
        sos += bytes([ss, se, (ah << 4) | al])
        units = _scan_units(cis, comps, h, w, hmax, vmax, mcux, mcuy)
        wtr = _BitWriter()
        if ss == 0:
            _encode_dc_scan(wtr, units, flat, dc_codes, ah, al,
                            ri=restart_interval)
        else:
            blocks = [flat[u[0][0]][u[0][1]] for u in units]
            if ah == 0:
                _encode_ac_first_scan(wtr, blocks, ac_codes, ss, se, al,
                                      ri=restart_interval)
            else:
                _encode_ac_refine_scan(wtr, blocks, ac_codes, ss, se, al,
                                       ri=restart_interval)
        wtr.flush()
        body += _seg(0xDA, bytes(sos)) + bytes(wtr.buf)
    return bytes(head) + bytes(body) + b"\xff\xd9"


# ---------------------------------------------------------------- decoder


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next segment marker at/after ``pos``: skips
    entropy bytes, stuffed FF00 pairs, FF fill bytes, and stray RSTs."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            m = data[pos + 1]
            if m == 0x00:
                pos += 2
                continue
            if m == 0xFF:
                pos += 1
                continue
            if 0xD0 <= m <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _restart(rdr: _BitReader) -> bool:
    """Byte-align and consume an RST marker at a restart boundary.
    Returns True if a marker was consumed (predictors must reset)."""
    rdr.align()
    m = rdr.at_marker()
    if m is not None and 0xD0 <= m <= 0xD7:
        rdr.pos += 2
        return True
    return False


def _decode_scan_sequential(rdr, units, coefs, tabs, huff, ri, zig) -> None:
    """Baseline scan (interleaved or single-component): full-band
    DC-diff + AC run-length per block."""
    preds: dict[int, int] = {}
    for i, unit in enumerate(units):
        if ri and i and i % ri == 0:
            if _restart(rdr):
                preds = {}
        elif rdr.consumed_pad:
            # 1-bit padding is only legitimate at the tail of an
            # entropy segment; needing it with MCUs left = truncated
            raise ValueError("truncated entropy data")
        for ci, bi in unit:
            dc_t = huff[(0, tabs[ci][0])]
            ac_t = huff[(1, tabs[ci][1])]
            nat = coefs[ci][bi]
            ssss = rdr.huff(dc_t)
            diff = _extend(rdr.bits(ssss), ssss) if ssss else 0
            preds[ci] = preds.get(ci, 0) + diff
            nat[0] = preds[ci]
            k = 1
            while k < 64:
                rs = rdr.huff(ac_t)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC index overflow")
                nat[zig[k]] = _extend(rdr.bits(s), s)
                k += 1


def _decode_scan_dc(rdr, units, coefs, tabs, huff, ri, ah, al) -> None:
    """Progressive DC scan: first pass (Ah=0) is baseline DC diff
    coding of DC>>Al, stored <<Al; refinement appends one bit per block
    at weight 1<<Al (two's-complement OR — correct for negatives)."""
    preds: dict[int, int] = {}
    for i, unit in enumerate(units):
        if ri and i and i % ri == 0 and _restart(rdr):
            preds = {}
        for ci, bi in unit:
            nat = coefs[ci][bi]
            if ah == 0:
                ssss = rdr.huff(huff[(0, tabs[ci][0])])
                diff = _extend(rdr.bits(ssss), ssss) if ssss else 0
                preds[ci] = preds.get(ci, 0) + diff
                nat[0] = preds[ci] << al
            elif rdr.bits(1):
                nat[0] |= 1 << al


def _decode_scan_ac_first(rdr, units, coefs, tabs, huff, ri, ss, se, al, zig) -> None:
    """Progressive AC first pass (Ah=0): run-length coding within the
    spectral band, EOBn symbols carry runs of end-of-band blocks."""
    ci = units[0][0][0] if units else 0
    ac_t = huff[(1, tabs[ci][1])]
    eobrun = 0
    for i, unit in enumerate(units):
        if ri and i and i % ri == 0 and _restart(rdr):
            eobrun = 0
        _ci, bi = unit[0]
        if eobrun:
            eobrun -= 1
            continue
        nat = coefs[_ci][bi]
        k = ss
        while k <= se:
            rs = rdr.huff(ac_t)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += rdr.bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC index overflow")
            nat[zig[k]] = _extend(rdr.bits(s), s) << al
            k += 1


def _decode_scan_ac_refine(rdr, units, coefs, tabs, huff, ri, ss, se, al, zig) -> None:
    """Progressive AC refinement (T.81 G.1.2.3): run/1 symbols place
    newly-significant +-1<<Al coefficients, runs count only
    zero-history positions, and one correction bit is read for every
    already-significant coefficient walked over (also inside
    EOB-covered blocks). An EOBn symbol's run counts the FOLLOWING
    blocks; the block it is read in still refines its own band tail."""
    ci = units[0][0][0] if units else 0
    ac_t = huff[(1, tabs[ci][1])]
    p1 = 1 << al

    def refine_tail(nat, k):
        while k <= se:
            z = zig[k]
            if nat[z] != 0 and rdr.bits(1) and not (nat[z] & p1):
                nat[z] += p1 if nat[z] > 0 else -p1
            k += 1

    eobrun = 0
    for i, unit in enumerate(units):
        if ri and i and i % ri == 0 and _restart(rdr):
            eobrun = 0
        _ci, bi = unit[0]
        nat = coefs[_ci][bi]
        if eobrun > 0:
            refine_tail(nat, ss)
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            rs = rdr.huff(ac_t)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += rdr.bits(r)
                    refine_tail(nat, k)  # this block, NOT in the run
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            elif s == 1:
                val = p1 if rdr.bits(1) else -p1
            else:
                raise ValueError("bad AC refinement symbol")
            while k <= se:
                z = zig[k]
                if nat[z] != 0:
                    # correction bit for an already-significant coef
                    if rdr.bits(1) and not (nat[z] & p1):
                        nat[z] += p1 if nat[z] > 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                nat[zig[k]] = val
            k += 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) JPEG to
    (H, W, 1) grayscale or (H, W, 3) RGB uint8 (4-component Adobe
    CMYK/YCCK composites to RGB via the floor rule s_c*s_k//255).
    Raises ValueError on malformed input and NotImplementedError on
    arithmetic-coded / hierarchical / >8-bit files (so kernels can
    skip)."""
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    comps: list[tuple[int, int, int, int]] = []
    h = w = 0
    progressive = False
    restart_interval = 0
    coefs: list[np.ndarray] | None = None
    hmax = vmax = mcux = mcuy = 0
    saw_scan = False
    adobe_transform: int | None = None
    zig = ZIGZAG

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker framing")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        if pos + 4 > len(data):
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq > 1:
                    raise ValueError(f"bad DQT precision {pq}")
                if pq:  # Pq=1: big-endian 16-bit entries (B.2.4.1)
                    if p + 129 > len(body):
                        raise ValueError("truncated 16-bit DQT")
                    z = np.frombuffer(
                        body[p + 1 : p + 129], dtype=">u2"
                    ).astype(np.int32)
                else:
                    if p + 65 > len(body):
                        raise ValueError("truncated DQT")
                    z = np.frombuffer(
                        body[p + 1 : p + 65], dtype=np.uint8
                    ).astype(np.int32)
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = z
                qtabs[tq] = nat.reshape(8, 8)
                p += 129 if pq else 65
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _decode_lut(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("non-8-bit precision")
            if len(body) < 6 + 3 * nc or h == 0 or w == 0 or nc == 0:
                raise ValueError("truncated SOF segment")
            progressive = marker == 0xC2
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            # natural-order integer coefficients per component, filled
            # across (possibly many) scans and IDCT'd in ONE batched
            # einsum at the end
            coefs = [
                np.zeros((mcuy * vs * mcux * hs, 64), dtype=np.int64)
                for (_c, hs, vs, _t) in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"unsupported SOF marker 0x{marker:02X}")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if coefs is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            order = {cid: i for i, (cid, *_r) in enumerate(comps)}
            scan_cis = []
            tabs: dict[int, tuple[int, int]] = {}
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                if cs not in order:
                    raise ValueError("scan references unknown component")
                scan_cis.append(order[cs])
                tabs[order[cs]] = (tt >> 4, tt & 0xF)
            ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            units = _scan_units(scan_cis, comps, h, w, hmax, vmax, mcux, mcuy)
            rdr = _BitReader(data, pos)
            if not progressive:
                _decode_scan_sequential(
                    rdr, units, coefs, tabs, huff, restart_interval, zig
                )
            elif ss == 0:
                if se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                _decode_scan_dc(
                    rdr, units, coefs, tabs, huff, restart_interval, ah, al
                )
            else:
                if len(scan_cis) != 1:
                    raise ValueError("progressive AC scan must be single-component")
                if ah == 0:
                    _decode_scan_ac_first(
                        rdr, units, coefs, tabs, huff, restart_interval,
                        ss, se, al, zig,
                    )
                else:
                    _decode_scan_ac_refine(
                        rdr, units, coefs, tabs, huff, restart_interval,
                        ss, se, al, zig,
                    )
            saw_scan = True
            pos = _next_marker(data, rdr.pos)
        elif marker == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            adobe_transform = body[11]  # 0 CMYK, 1 YCbCr, 2 YCCK
        # other APPn / COM / DNL: skipped

    if not saw_scan or coefs is None:
        raise ValueError("no scan in JPEG stream")

    # batched dequant + IDCT + raster assembly, then upsample/crop/shift
    full = []
    for ci, ((_cid, hs, vs, tq), cf) in enumerate(zip(comps, coefs)):
        if tq not in qtabs:
            raise ValueError("missing quantization table")
        n_by, n_bx = mcuy * vs, mcux * hs
        deq = cf.astype(np.float64).reshape(n_by, n_bx, 8, 8) * qtabs[tq].astype(
            np.float64
        )
        blocks = _A.T @ deq @ _A  # broadcast matmul: batched BLAS IDCT
        pl = blocks.transpose(0, 2, 1, 3).reshape(n_by * 8, n_bx * 8)
        if hs != hmax or vs != vmax:
            pl = np.repeat(np.repeat(pl, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(pl[:h, :w] + 128.0)
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    if len(full) == 4:
        # Adobe CMYK / YCCK (print-origin images). Per the Adobe
        # convention the stored samples are INVERTED (s = 255 - value);
        # transform 2 (YCCK) additionally routes the inverted CMY
        # through the YCbCr equations. RGB out via the standard naive
        # composite R = s_c * s_k // 255 (floor — integer-exact, which
        # is what the SQL oracle recomputes).
        if adobe_transform == 2:
            y, cb, cr, k = full
            c = y + 1.402 * (cr - 128.0)
            m = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            ye = y + 1.772 * (cb - 128.0)
        else:
            c, m, ye, k = full
        s = [
            np.clip(np.round(p), 0, 255).astype(np.int64) for p in (c, m, ye, k)
        ]
        rgb = np.stack(
            [s[0] * s[3] // 255, s[1] * s[3] // 255, s[2] * s[3] // 255], axis=2
        )
        return rgb.astype(np.uint8)
    if len(full) != 3:
        raise NotImplementedError(f"unsupported component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def encode_jpeg_cmyk(cmyk: np.ndarray, restart_interval: int = 0) -> bytes:
    """Deterministic Adobe-CMYK baseline encoder (fixture twin of the
    4-component decode branch): (H, W, 4) uint8 CMYK in, stored
    INVERTED per the Adobe convention with an APP14 transform-0
    marker, all four components full-resolution with the luminance
    quant + Huffman tables. Print-origin web/PDF images carry exactly
    this shape."""
    a = np.asarray(cmyk, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 4:
        raise ValueError("encode_jpeg_cmyk needs an (H, W, 4) array")
    h, w = a.shape[:2]
    ql = QUANT_LUMA
    mcux, mcuy = -(-w // 8), -(-h // 8)
    comps = [(1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0), (4, 1, 1, 0)]
    comp_blocks = []
    for ci in range(4):
        plane = 255.0 - a[:, :, ci].astype(np.float64)  # Adobe inversion
        ph, pw = mcuy * 8, mcux * 8
        pl = np.empty((ph, pw))
        pl[:h, :w] = plane - 128.0
        if w < pw:
            pl[:h, w:] = pl[:h, w - 1 : w]
        if h < ph:
            pl[h:, :] = pl[h - 1 : h, :]
        comp_blocks.append(_fdct_quant(pl, ql))
    dc = _canonical_codes(*HUFF_DC_LUMA)
    ac = _canonical_codes(*HUFF_AC_LUMA)

    wtr = _BitWriter()
    preds = [0] * 4
    out_chunks = []
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.flush()
                out_chunks.append(bytes(wtr.buf))
                out_chunks.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                wtr = _BitWriter()
                preds = [0] * 4
            for ci in range(4):
                zz = comp_blocks[ci][my, mx]
                preds[ci] = _encode_block(wtr, zz, preds[ci], dc, ac)
            mcu_count += 1
    wtr.flush()
    out_chunks.append(bytes(wtr.buf))

    head = bytearray(b"\xff\xd8")
    head += _seg(0xEE, b"Adobe" + b"\x00\x65\x00\x00\x00\x00" + b"\x00")
    head += _seg(0xDB, _dqt_payload(0, ql))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, 4))
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, hs << 4 | vs, tq])
    head += _seg(0xC0, bytes(sof))
    head += _seg(0xC4, _dht_payload(0, 0, HUFF_DC_LUMA))
    head += _seg(0xC4, _dht_payload(1, 0, HUFF_AC_LUMA))
    if restart_interval:
        head += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([4])
    for cid, *_r in comps:
        sos += bytes([cid, 0])
    sos += bytes([0, 63, 0])
    head += _seg(0xDA, bytes(sos))
    return bytes(head) + b"".join(out_chunks) + b"\xff\xd9"
