"""Audio/image header probes (MP3/Ogg/TIFF) + BMP/ICO codec."""

import numpy as np
import pytest

from finetoo_sp_spark.codecs.bmp import (
    BmpError,
    decode_bmp,
    decode_ico,
    encode_bmp,
    encode_ico,
)
from finetoo_sp_spark.codecs.probe import (
    ProbeError,
    encode_tiff_header,
    make_mp3,
    make_ogg,
    probe_audio_meta,
    probe_image_dims,
)


# ----------------------------------------------------------- audio probe
def test_mp3_cbr_walk():
    b = make_mp3(60, rate_idx=0, bitrate_indices=[9], channels=2)
    assert probe_audio_meta(b) == (
        "mp3", 44100, 2, 60 * 1152 * 1000 // 44100, 128, False)


def test_mp3_vbr_mean_and_flag():
    b = make_mp3(40, rate_idx=1, bitrate_indices=[9, 11], channels=1)
    fmt, rate, ch, dur, kbps, vbr = probe_audio_meta(b)
    assert (rate, ch, kbps, vbr) == (48000, 1, (128 + 192) // 2, True)


def test_mp3_xing_flags_vbr_even_when_cbr():
    b = make_mp3(30, bitrate_indices=[9], xing=True)
    assert probe_audio_meta(b)[5] is True


def test_mp3_id3v2_skip_and_id3v1_tail():
    id3v2 = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 30]) + b"\x00" * 30
    core = make_mp3(12)
    tail = b"TAG" + b"\x00" * 125
    assert probe_audio_meta(id3v2 + core + tail)[3] == \
        probe_audio_meta(core)[3]


def test_mp3_truncated_final_frame_dropped():
    b = make_mp3(10)
    full = probe_audio_meta(b)
    cut = probe_audio_meta(b[:-50])
    assert cut[3] < full[3]  # one fewer frame counted


def test_mp3_mid_stream_garbage_raises():
    b = bytearray(make_mp3(10))
    b[500] = 0x00  # kill a frame sync deep in the stream
    # desync lands at a non-sync byte -> ProbeError (kernel skips)
    with pytest.raises(ProbeError):
        probe_audio_meta(bytes(b[:499] + b"\x12\x34" + b[499:]))


def test_ogg_vorbis_and_opus():
    v = make_ogg("vorbis", 16000, 2, 32000)
    assert probe_audio_meta(v) == ("ogg-vorbis", 16000, 2, 2000, 0, True)
    o = make_ogg("opus", 48000, 1, 48312)
    assert probe_audio_meta(o) == ("ogg-opus", 48000, 1, 1000, 0, True)


def test_wav_flac_delegation():
    from finetoo_sp_spark.codecs.flac import encode_flac
    from finetoo_sp_spark.codecs.wav import encode_wav

    s = np.full(800, 1000, dtype=np.int16)
    assert probe_audio_meta(encode_wav(s, 8000))[:4] == ("wav", 8000, 1, 100)
    f = encode_flac(s[:, None].astype(int), 8000)
    assert probe_audio_meta(f)[:4] == ("flac", 8000, 1, 100)


def test_audio_probe_gates():
    for bad in (b"", b"\x00" * 40, b"OggS" + b"\x00" * 10):
        with pytest.raises(ProbeError):
            probe_audio_meta(bad)


# ----------------------------------------------------- image dim probes
def test_tiff_dims_both_orders():
    assert probe_image_dims(encode_tiff_header(640, 480)) == ("tiff", 640, 480)
    assert probe_image_dims(
        encode_tiff_header(31, 17, big_endian=True)) == ("tiff", 31, 17)


def test_bmp_ico_dims():
    img = np.zeros((20, 30, 3), dtype=np.uint8)
    assert probe_image_dims(encode_bmp(img)) == ("bmp", 30, 20)
    assert probe_image_dims(
        encode_bmp(img, top_down=True)) == ("bmp", 30, 20)
    big = np.zeros((256, 256, 3), dtype=np.uint8)
    assert probe_image_dims(encode_ico(big, as_png=True)) == ("ico", 256, 256)


# ------------------------------------------------------------ BMP codec
@pytest.mark.parametrize("bits,top_down", [(24, False), (24, True),
                                           (32, False), (32, True)])
def test_bmp_roundtrip(bits, top_down):
    rng = np.random.default_rng(bits + top_down)
    img = rng.integers(0, 256, size=(21, 13, 3)).astype(np.uint8)
    assert np.array_equal(
        decode_bmp(encode_bmp(img, bits=bits, top_down=top_down)), img)


def test_bmp_palette_roundtrip():
    rng = np.random.default_rng(9)
    colors = rng.integers(0, 256, size=(5, 3)).astype(np.uint8)
    img = colors[rng.integers(0, 5, size=(19, 23))]
    assert np.array_equal(decode_bmp(encode_bmp(img, bits=8)), img)


def test_bmp_row_padding_edge():
    # widths 1..4 hit every 4-byte padding remainder
    for w in range(1, 5):
        img = np.arange(w * 3 * 3).reshape(3, w, 3).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_gates():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    enc = encode_bmp(img)
    with pytest.raises(BmpError):
        decode_bmp(enc[:40])
    with pytest.raises(BmpError):
        decode_bmp(b"PK" + enc[2:])
    bad = bytearray(enc)
    bad[30] = 1  # biCompression = BI_RLE8 but 24 bpp: malformed
    with pytest.raises(BmpError):
        decode_bmp(bytes(bad))
    bad[30] = 4  # BI_JPEG whose "stream" is raw pixels: malformed
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))
    bad[30] = 6  # unknown compression id
    with pytest.raises(BmpError):
        decode_bmp(bytes(bad))


def test_bmp_embedded_jpeg_and_png_streams():
    """BI_PNG / BI_JPEG: the pixel data is a whole embedded stream."""
    import struct

    from finetoo_sp_spark.codecs.jpeg import encode_jpeg_baseline
    from finetoo_sp_spark.codecs.png import encode_png

    def wrap(stream, w, h, comp):
        info = struct.pack("<IiihHIIiiII", 40, w, h, 1, 0, comp,
                           len(stream), 0, 0, 0, 0)
        off = 14 + 40
        return (b"BM" + struct.pack("<IHHI", off + len(stream), 0, 0, off)
                + info + stream)

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(12, 10, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp(wrap(encode_png(img), 10, 12, 5)), img)
    # DC-exact flat-block grayscale JPEG: lossless by construction
    vals = (128 + 2 * (((np.arange(2)[:, None] * 7
                         + np.arange(2)[None, :] * 13) % 50) - 25))
    g = np.repeat(np.repeat(vals.astype(np.uint8), 8, 0), 8, 1)
    out = decode_bmp(wrap(encode_jpeg_baseline(g), 16, 16, 4))
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


_PAL16 = np.array(
    [10, 40, 90, 130, 200, 250, 17, 33, 77, 99, 111, 123, 140, 160,
     180, 220], dtype=np.uint8)


def _pal_img(seed: int, shape=(11, 13), n=16) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = _PAL16[:n][rng.integers(0, n, size=shape)]
    return np.repeat(img[:, :, None], 3, axis=2)


@pytest.mark.parametrize("compression", ["rle8", "rle4"])
def test_bmp_rle_roundtrip(compression):
    img = _pal_img(3)
    assert np.array_equal(
        decode_bmp(encode_bmp(img, compression=compression)), img)


@pytest.mark.parametrize("bits,n", [(1, 2), (4, 16)])
def test_bmp_low_bpp_roundtrip(bits, n):
    # widths 1..5 sweep the sub-byte packing + 4-byte padding edges
    for w in range(1, 6):
        img = _pal_img(bits * 7 + w, shape=(5, w), n=n)
        assert np.array_equal(decode_bmp(encode_bmp(img, bits=bits)), img)


def test_bmp_rle_absolute_and_delta_hand_fixture():
    """Hand-assembled RLE8 stream: absolute mode (0,3,...) with word
    padding, a delta (0,2,dx,dy) whose skipped pixels decode to
    palette index 0, encoded runs, EOL, EOB."""
    import struct

    # palette: index0=black, 1=red, 2=green, 3=blue (BGRX order on disk)
    pal = bytes([0, 0, 0, 0, 0, 0, 255, 0, 0, 255, 0, 0, 255, 0, 0, 0])
    stream = bytes([
        2, 1,             # run: 2x index1 at (0,0)  [stored row 0 = bottom]
        0, 3, 2, 3, 2, 0,  # absolute: indices 2,3,2 (+1 pad byte)
        0, 0,             # EOL
        0, 2, 1, 1,       # delta: skip to x=1 on stored row 2
        1, 3,             # run: 1x index3
        0, 0,             # EOL (ends stored row 2)
        0, 1,             # EOB (stored row 3 left all index0)
    ])
    w, h = 5, 4
    info = struct.pack("<IiihHIIiiII", 40, w, h, 1, 8, 1,
                       len(stream), 0, 0, 4, 0)
    off = 14 + 40 + len(pal)
    blob = (b"BM" + struct.pack("<IHHI", off + len(stream), 0, 0, off)
            + info + pal + stream)
    out = decode_bmp(blob)
    rgb = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   dtype=np.uint8)
    exp_idx = np.zeros((h, w), dtype=int)   # visual (top-down) order
    exp_idx[h - 1] = [1, 1, 2, 3, 2]        # stored row 0 = bottom
    # stored row 1 skipped entirely by the delta -> all index 0
    exp_idx[h - 3, 1] = 3                   # stored row 2, x=1
    assert np.array_equal(out, rgb[exp_idx])


def test_bmp_bitfields_roundtrip_and_16bpp_rescale():
    from finetoo_sp_spark.codecs.bmp import encode_bmp_bitfields

    img = _pal_img(11)
    # 32-bpp 8-bit masks in RGBA byte order: lossless
    assert np.array_equal(decode_bmp(encode_bmp_bitfields(img)), img)
    # 16-bpp 565: decode equals the documented integer rescale of the
    # quantized channel values
    masks = (0xF800, 0x07E0, 0x001F)
    out = decode_bmp(encode_bmp_bitfields(img, bits=16, masks=masks))
    exp = np.zeros_like(img)
    for ch, mask in enumerate(masks):
        shift = (mask & -mask).bit_length() - 1
        mx = mask >> shift
        q = (img[:, :, ch].astype(np.uint32) * mx + 127) // 255
        exp[:, :, ch] = ((q * 255 + mx // 2) // mx).astype(np.uint8)
    assert np.array_equal(out, exp)


def test_bmp_16bpp_bi_rgb_defaults_to_555():
    import struct

    from finetoo_sp_spark.codecs.bmp import encode_bmp_bitfields

    masks = (0x7C00, 0x03E0, 0x001F)
    img = _pal_img(13)
    enc = encode_bmp_bitfields(img, bits=16, masks=masks)
    expected = decode_bmp(enc)
    # strip the mask DWORDs + flip biCompression to BI_RGB
    raw = bytearray(enc[: 14 + 40] + enc[14 + 40 + 12:])
    struct.pack_into("<I", raw, 14 + 16, 0)
    struct.pack_into("<I", raw, 10, 14 + 40)
    struct.pack_into("<I", raw, 2, len(raw))
    assert np.array_equal(decode_bmp(bytes(raw)), expected)


# ------------------------------------------------------------ ICO codec
def test_ico_dib_mask_rule():
    rng = np.random.default_rng(4)
    img = rng.integers(1, 256, size=(16, 16, 3)).astype(np.uint8)
    mask = np.zeros((16, 16), dtype=bool)
    mask[0, :8] = True
    dec = decode_ico(encode_ico(img, masked=mask))
    assert np.array_equal(dec, np.where(mask[:, :, None], 0, img))


def test_ico_png_payload_and_largest_entry():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(48, 48, 3)).astype(np.uint8)
    assert np.array_equal(decode_ico(encode_ico(img, as_png=True)), img)


def test_ico_gates():
    with pytest.raises(BmpError):
        decode_ico(b"\x00\x00\x01\x00\x00\x00")
    with pytest.raises(BmpError):
        decode_ico(b"\x00\x00\x02\x00\x01\x00" + b"\x00" * 16)


# ------------------------------------------------------- Spark kernels
def test_image_stats_decodes_bmp_and_ico(spark):
    from finetoo_sp_spark.multimodal import image_stats

    img = (np.arange(8 * 8 * 3) % 256).reshape(8, 8, 3).astype(np.uint8)
    df = spark.createDataFrame(
        [(0, "image", bytearray(encode_bmp(img))),
         (1, "image", bytearray(encode_ico(img))),
         (2, "image", bytearray(b"BM truncated"))],
        "asset_id long, modality string, payload binary",
    )
    rows = {r["asset_id"]: r for r in image_stats(df).collect()}
    assert set(rows) == {0, 1}
    for aid in (0, 1):
        assert rows[aid]["sum_r"] == int(img[:, :, 0].astype(int).sum())


def test_audio_probe_kernel_skips_garbage(spark):
    from finetoo_sp_spark.multimodal import audio_probe

    df = spark.createDataFrame(
        [(0, "audio", bytearray(make_mp3(20))),
         (1, "audio", bytearray(b"not audio at all"))],
        "asset_id long, modality string, payload binary",
    )
    rows = audio_probe(df).collect()
    assert [r["asset_id"] for r in rows] == [0]
    assert rows[0]["container"] == "mp3"


def test_id3v2_parse_matrix():
    import pytest

    from finetoo_sp_spark.codecs.probe import make_id3v2, make_mp3, parse_id3v2

    for ver in (3, 4):
        for enc in (0, 1, 3):
            tag = make_id3v2("Tötle", "Artist 5", "Al bum", version=ver, encoding=enc)
            got = parse_id3v2(tag + make_mp3(3))
            assert got == {
                "version": ver, "title": "Tötle",
                "artist": "Artist 5", "album": "Al bum",
            }, (ver, enc)
    assert parse_id3v2(make_id3v2("only title") + b"\xff\xfb")["artist"] == ""
    assert parse_id3v2(make_mp3(2))["version"] == 0
    with pytest.raises(ValueError, match="ID3v2.2"):
        parse_id3v2(b"ID3\x02\x00\x00\x00\x00\x00\x00")
    # frame overrunning the declared tag size must raise, not over-read
    tag = bytearray(make_id3v2("x", version=3))
    tag[14:18] = (1 << 20).to_bytes(4, "big")  # TIT2 frame size blown up
    with pytest.raises(ValueError, match="overruns"):
        parse_id3v2(bytes(tag) + make_mp3(2))


def test_probe_audio_meta_still_skips_id3():
    from finetoo_sp_spark.codecs.probe import make_id3v2, make_mp3, probe_audio_meta

    plain = probe_audio_meta(make_mp3(5))
    tagged = probe_audio_meta(make_id3v2("T", "A", version=4) + make_mp3(5))
    assert plain == tagged  # duration math unchanged by the tag
