"""Header-only image format/dimension probe (PNG, JPEG, GIF, WebP).

Curation pipelines filter crawled images by format and size BEFORE any
decode (drop icons/trackers < 64px, route formats to codecs, bucket by
resolution) — that decision needs only the first few hundred bytes, so
this probe never touches pixel data and costs O(header) per asset even
for formats whose full decode is out of scope (GIF/WebP).

Formats per their public specs:
- PNG (RFC 2083): IHDR width/height, big-endian u32 at bytes 16..24.
- JPEG (ITU T.81): scan marker segments for SOF0/1/2 (baseline /
  extended / progressive); height u16 BE at +5, width at +7.
- GIF (GIF89a spec): 'GIF87a'/'GIF89a', logical-screen w,h LE u16.
- WebP (RIFF container): 'VP8 ' lossy (14-bit w/h after the 0x9D012A
  sync), 'VP8L' lossless (packed 14-bit w-1/h-1 after 0x2F), 'VP8X'
  extended (24-bit LE canvas w-1/h-1).

Like the other codecs, malformed input raises :class:`ProbeError` so
corpus kernels skip rather than die. Deterministic minimal writers for
GIF/WebP live here as fixture twins (PNG/JPEG already have real
encoders in codecs/png.py / codecs/jpeg.py).
"""

from __future__ import annotations

import struct


class ProbeError(ValueError):
    pass


def probe_image_dims(b: bytes) -> tuple[str, int, int]:
    """Return (format, width, height) from the header alone."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        if b[12:16] != b"IHDR":
            raise ProbeError("PNG without leading IHDR")
        w, h = struct.unpack_from(">II", b, 16)
        return "png", w, h
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                raise ProbeError("JPEG marker desync")
            marker = b[pos + 1]
            if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
                pos += 1
                continue
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                if pos + 9 > len(b):
                    raise ProbeError("truncated SOF")
                h, w = struct.unpack_from(">HH", b, pos + 5)
                return "jpeg", w, h
            if marker in (0xD9, 0xDA):  # EOI / SOS: entropy data follows,
                break  # a SOF can no longer appear at marker positions
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # no length field
                pos += 2
                continue
            (seglen,) = struct.unpack_from(">H", b, pos + 2)
            pos += 2 + seglen
        raise ProbeError("JPEG without SOF")
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", b, 6)
        return "gif", w, h
    if len(b) >= 30 and b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        fourcc = b[12:16]
        if fourcc == b"VP8 ":
            if b[23:26] != b"\x9d\x01\x2a":
                raise ProbeError("VP8 sync code missing")
            w = struct.unpack_from("<H", b, 26)[0] & 0x3FFF
            h = struct.unpack_from("<H", b, 28)[0] & 0x3FFF
            return "webp", w, h
        if fourcc == b"VP8L":
            if b[20] != 0x2F:
                raise ProbeError("VP8L signature missing")
            (bits,) = struct.unpack_from("<I", b, 21)
            return "webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
        if fourcc == b"VP8X":
            w = int.from_bytes(b[24:27], "little") + 1
            h = int.from_bytes(b[27:30], "little") + 1
            return "webp", w, h
        raise ProbeError(f"unknown WebP chunk {fourcc!r}")
    raise ProbeError("unrecognized image format")


def encode_gif_header(width: int, height: int) -> bytes:
    """Minimal valid GIF89a: header + logical screen descriptor + trailer."""
    return b"GIF89a" + struct.pack("<HHBBB", width, height, 0, 0, 0) + b"\x3b"


def encode_webp_vp8l_header(width: int, height: int) -> bytes:
    """Minimal WebP/VP8L container: RIFF + VP8L chunk with the packed
    14-bit dimension bits (header-only — no pixel stream follows)."""
    bits = (width - 1) | ((height - 1) << 14)
    payload = b"\x2f" + struct.pack("<I", bits) + b"\x00" * 5
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
