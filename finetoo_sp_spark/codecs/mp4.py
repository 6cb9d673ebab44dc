"""Pure-stdlib ISO-BMFF (MP4) metadata probe (parse + deterministic encoder).

The video leg of the multimodal column: full video DECODE needs entropy
codecs (H.264/AV1) that are out of scope for a stdlib container, but the
metadata a curation pipeline actually filters on — container brand,
movie timescale/duration, per-track handler/codec/geometry — lives in
the plain ISO/IEC 14496-12 box structure and parses exactly with
``struct`` alone. Like codecs/wav.py, anything malformed raises
:class:`Mp4Error` so corpus kernels skip rather than die; frame PAYLOAD
decode stays behind the documented NotImplementedError gate in
multimodal.py.

Box grammar per ISO/IEC 14496-12 §4.2: ``uint32 size, char[4] type``
(size==1 -> uint64 largesize follows); containers nest boxes in their
payload. Parsed here: ftyp (major_brand), moov/mvhd (timescale,
duration; version 0 and 1), moov/trak/tkhd (track_id, width/height as
16.16 fixed point), trak/mdia/hdlr (handler fourcc, e.g. 'vide'/'soun'),
trak/mdia/minf/stbl/stsd (first sample-entry fourcc = codec).
"""

from __future__ import annotations

import struct


class Mp4Error(ValueError):
    pass


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for sibling boxes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", b, pos)
        btype = b[pos + 4 : pos + 8]
        payload = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4Error("truncated largesize box")
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            payload = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < payload - pos or pos + size > end:
            raise Mp4Error(f"bad box size {size} for {btype!r}")
        yield btype, payload, pos + size
        pos += size
    if pos != end:
        raise Mp4Error("trailing bytes that are not a box")


def decode_mp4(b: bytes) -> dict:
    """Parse container metadata.

    Returns {major_brand, timescale, duration, tracks: [{track_id,
    handler, width, height, codec}, ...]}. Raises :class:`Mp4Error` on
    anything that is not a well-formed ISO-BMFF file with ftyp + mvhd.
    """
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise Mp4Error("not an ISO-BMFF file (no leading ftyp)")
    major_brand = None
    timescale = None
    duration = None
    tracks: list[dict] = []

    def walk(start: int, end: int, path: tuple[bytes, ...]) -> None:
        nonlocal major_brand, timescale, duration
        for btype, p0, p1 in _boxes(b, start, end):
            if btype == b"ftyp" and not path:
                if p1 - p0 < 8:
                    raise Mp4Error("short ftyp")
                major_brand = b[p0 : p0 + 4].decode("latin-1")
            elif btype == b"mvhd" and path == (b"moov",):
                version = b[p0]
                if version == 1:
                    timescale, duration = struct.unpack_from(">IQ", b, p0 + 20)
                else:
                    timescale, duration = struct.unpack_from(">II", b, p0 + 12)
            elif btype == b"tkhd" and path[-2:] == (b"moov", b"trak"):
                version = b[p0]
                off = p0 + (4 + 8 + 8 if version == 1 else 4 + 4 + 4)
                (track_id,) = struct.unpack_from(">I", b, off)
                w_fp, h_fp = struct.unpack_from(">II", b, p1 - 8)
                tracks.append(
                    {
                        "track_id": track_id,
                        "handler": None,
                        "width": w_fp >> 16,
                        "height": h_fp >> 16,
                        "codec": None,
                    }
                )
            elif btype == b"hdlr" and path[-2:] == (b"trak", b"mdia"):
                if tracks:
                    tracks[-1]["handler"] = b[p0 + 8 : p0 + 12].decode("latin-1")
            elif btype == b"stsd" and path[-1:] == (b"stbl",):
                (n_entries,) = struct.unpack_from(">I", b, p0 + 4)
                if n_entries > 0 and tracks:
                    tracks[-1]["codec"] = b[p0 + 12 : p0 + 16].decode("latin-1")
            elif btype in _CONTAINERS:
                walk(p0, p1, path + (btype,))

    walk(0, len(b), ())
    if major_brand is None or timescale is None:
        raise Mp4Error("missing ftyp or mvhd")
    return {
        "major_brand": major_brand,
        "timescale": timescale,
        "duration": duration,
        "tracks": tracks,
    }


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def encode_mp4(
    major_brand: str,
    timescale: int,
    duration: int,
    tracks: list[tuple[str, int, int, str]],
    mdat: bytes = b"",
) -> bytes:
    """Deterministic minimal ISO-BMFF writer (test/fixture twin of
    :func:`decode_mp4`). ``tracks``: (handler, width, height, codec)."""
    ftyp = _box(b"ftyp", major_brand.encode("latin-1") + struct.pack(">I", 0) + b"isom")
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", len(tracks) + 1),
    )
    trak_boxes = []
    for idx, (handler, width, height, codec) in enumerate(tracks):
        tkhd = _box(
            b"tkhd",
            struct.pack(">B3x", 0)
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", idx + 1)
            + b"\x00" * 4
            + struct.pack(">I", duration)
            + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),
        )
        hdlr = _box(
            b"hdlr",
            struct.pack(">B3x", 0)
            + struct.pack(">I", 0)
            + handler.encode("latin-1")
            + b"\x00" * 12
            + b"\x00",
        )
        entry = struct.pack(">I", 16) + codec.encode("latin-1") + b"\x00" * 6 + struct.pack(">H", 1)
        stsd = _box(b"stsd", struct.pack(">B3x", 0) + struct.pack(">I", 1) + entry)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", hdlr + minf)
        trak_boxes.append(_box(b"trak", tkhd + mdia))
    moov = _box(b"moov", mvhd + b"".join(trak_boxes))
    return ftyp + moov + _box(b"mdat", mdat)
