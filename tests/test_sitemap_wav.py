"""Sitemap parsing + WAV codec — hand-pinned fixtures."""

import numpy as np
import pytest
from pyspark.sql import Row

from finetoo_sp_spark.codecs.wav import WavError, decode_wav, encode_wav
from finetoo_sp_spark.sources.sitemap import index_entries, parse_sitemaps

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://h.example.com/a</loc>
    <lastmod>2026-03-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://h.example.com/b</loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
  <url><loc>https://h.example.com/c</loc><lastmod>not-a-date</lastmod></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://h.example.com/sitemap-1.xml</loc></sitemap>
  <sitemap><loc>https://h.example.com/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_fields(spark):
    df = spark.createDataFrame([Row(host="h", sitemap_xml=SITEMAP)])
    rows = {r["loc"]: r for r in parse_sitemaps(df).collect()}
    # entry with no <loc> is dropped; the other three survive
    assert set(rows) == {
        "https://h.example.com/a",
        "https://h.example.com/b",
        "https://h.example.com/c",
    }
    a = rows["https://h.example.com/a"]
    assert str(a["lastmod"]) == "2026-03-05"
    assert a["changefreq"] == "daily"
    assert a["priority_ppm"] == 800000
    b = rows["https://h.example.com/b"]
    assert b["lastmod"] is None and b["changefreq"] is None and b["priority_ppm"] is None
    # unparseable lastmod -> NULL (try-cast), row survives
    assert rows["https://h.example.com/c"]["lastmod"] is None


def test_index_entries(spark):
    df = spark.createDataFrame([Row(host="h", sitemap_xml=INDEX)])
    locs = sorted(r["sitemap_loc"] for r in index_entries(df).collect())
    assert locs == [
        "https://h.example.com/sitemap-1.xml",
        "https://h.example.com/sitemap-2.xml",
    ]
    # a urlset body yields no index entries and vice versa
    df2 = spark.createDataFrame([Row(host="h", sitemap_xml=SITEMAP)])
    assert index_entries(df2).count() == 0
    assert parse_sitemaps(df).count() == 0


def test_sitemap_narrow_plan(spark):
    df = spark.createDataFrame([Row(host="h", sitemap_xml=SITEMAP)])
    plan = parse_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- WAV codec ----------------------------------------------------------


def test_wav_roundtrip_mono():
    s = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int16)
    rate, ch, bits, out = decode_wav(encode_wav(s, 44100))
    assert (rate, ch, bits) == (44100, 1, 16)
    assert out[:, 0].tolist() == s.astype(np.int32).tolist()


def test_wav_roundtrip_stereo():
    s = np.arange(20, dtype=np.int16).reshape(10, 2) * 100
    rate, ch, bits, out = decode_wav(encode_wav(s, 8000))
    assert (rate, ch) == (8000, 2)
    assert out.shape == (10, 2)
    assert (out == s.astype(np.int32)).all()


def test_wav_8bit_centering():
    import struct

    pcm = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm + b"\x00"  # pad byte
    b = b"RIFF" + struct.pack("<I", len(body)) + body
    _, _, bits, out = decode_wav(b)
    assert bits == 8
    assert out[:, 0].tolist() == [-128, 0, 127]


def test_wav_rejects_non_pcm_and_truncated():
    s = np.zeros(4, dtype=np.int16)
    good = encode_wav(s, 8000)
    with pytest.raises(WavError):
        decode_wav(good[:-3])  # truncated data chunk
    with pytest.raises(WavError):
        decode_wav(b"RIFF\x00\x00\x00\x00AIFF")
    # non-PCM audio_format
    bad = bytearray(good)
    bad[20] = 85  # audio_format = 0x55 (MP3)
    with pytest.raises(WavError):
        decode_wav(bytes(bad))


def test_audio_stats_skips_bad_payloads(spark):
    from finetoo_sp_spark.multimodal import audio_stats

    good = encode_wav(np.full(8, 5, dtype=np.int16), 8000)
    df = spark.createDataFrame(
        [Row(asset_id=0, payload=bytearray(good)),
         Row(asset_id=1, payload=bytearray(b"ID3\x04garbage-mp3"))]
    )
    rows = audio_stats(df).collect()
    assert len(rows) == 1 and rows[0]["asset_id"] == 0
    assert rows[0]["sumsq"] == 8 * 25 and rows[0]["peak"] == 5
