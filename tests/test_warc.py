"""WARC source (sources/warc.py): format roundtrip + the full
Common-Crawl-shaped path (WARC archives -> pages -> extraction kernel ->
byte-identical text)."""

from __future__ import annotations

import datetime as dt
import gzip

from pyspark.sql import functions as F

from finetoo_sp_spark.sources.warc import make_warc, parse_warc, read_warc_pages


def test_warc_format_roundtrip_plain_and_gzip():
    recs = [
        ("https://a.example.com/1", dt.datetime(2024, 1, 1, 0, 0, 5), b"<html>one</html>"),
        ("https://b.example.com/2", dt.datetime(2024, 1, 2, 3, 4, 5), b"payload \xc3\xa9"),
    ]
    for gz in (False, True):
        parsed = parse_warc(make_warc(recs, gzip_members=gz))
        assert parsed == recs, f"gzip_members={gz}"


def test_warc_parser_tolerates_garbage():
    good = make_warc([("https://x/1", dt.datetime(2024, 1, 1), b"ok")])
    assert parse_warc(b"\x00garbage" + good)[0][2] == b"ok"
    assert parse_warc(b"not a warc at all") == []
    assert parse_warc(b"\x1f\x8b truncated gzip") == []
    # record with corrupt length header is skipped, later records survive
    broken = good.replace(b"Content-Length: ", b"Content-Length: x", 1) + good
    assert len(parse_warc(broken)) == 1


def test_warc_to_extraction_byte_identical(spark, tmp_path):
    """The north-rule input path end to end: pages land as gzip WARC
    archives, read via binaryFile + the Arrow parse kernel, and the
    extraction output is byte-identical to the expectation."""
    from finetoo_sp_spark.datagen import gen_pages
    from finetoo_sp_spark.extraction.extract import extract_pages

    pages = gen_pages(spark, 60, partitions=3).select("url", "html", "expected_text")
    rows = pages.collect()  # 60 rows: fixture assembly only
    d = tmp_path / "warc"
    d.mkdir()
    for i in range(3):
        recs = [
            (r["url"], dt.datetime(2024, 1, 1, 0, 0, j), bytes(r["html"]))
            for j, r in enumerate(rows[i * 20 : (i + 1) * 20])
        ]
        (d / f"part-{i}.warc.gz").write_bytes(make_warc(recs, gzip_members=True))

    warc_pages = read_warc_pages(spark, str(d))
    assert warc_pages.count() == 60
    out = extract_pages(warc_pages)
    joined = out.join(pages.select("url", "expected_text"), "url")
    assert joined.count() == 60
    assert joined.filter(F.col("text") != F.col("expected_text")).count() == 0


def test_gzip_members_are_individually_decompressible():
    """Common-Crawl invariant: each record is its own gzip member, so a
    byte-range fetch of one member decompresses standalone."""
    recs = [
        ("https://x/1", dt.datetime(2024, 1, 1), b"first"),
        ("https://x/2", dt.datetime(2024, 1, 1), b"second"),
    ]
    blob = make_warc(recs, gzip_members=True)
    # find the second member's start (gzip magic) and decompress it alone
    second = blob.find(b"\x1f\x8b", 2)
    assert second > 0
    alone = parse_warc(gzip.decompress(blob[second:]))
    assert alone == [recs[1]]


def test_wat_roundtrip_hostile_title(spark, tmp_path):
    # Titles with embedded CRLF decoys and JSON-hostile chars survive
    # byte-exactly (Content-Length binds the body; to_json escapes).
    from pyspark.sql import functions as F

    from finetoo_sp_spark.operators.sinks import write_wat
    from finetoo_sp_spark.sources.warc import read_wat_meta

    rows = [
        ("https://a/1", 'ti"tle \\ with WARC/1.0 decoy', ["https://t/1", "https://t/2"]),
        ("https://a/2", "", []),
    ]
    df = spark.createDataFrame(rows, "url string, title string, links array<string>")
    out = str(tmp_path / "wat")
    write_wat(df, out)
    back = read_wat_meta(spark, out + "/*.txt")
    meta = "$['Envelope']['Payload-Metadata']['HTTP-Response-Metadata']['HTML-Metadata']"
    got = {
        r["url"]: (r["t"], r["n"])
        for r in back.select(
            "url",
            F.get_json_object("wat_json", meta + "['Head']['Title']").alias("t"),
            F.json_array_length(F.get_json_object("wat_json", meta + "['Links']")).alias("n"),
        ).collect()
    }
    assert got["https://a/1"] == ('ti"tle \\ with WARC/1.0 decoy', 2)
    assert got["https://a/2"][1] in (0, None)  # empty links list
    # Header URI matches the envelope URI.
    env = {
        r["url"]: r["e"]
        for r in back.select(
            "url",
            F.get_json_object(
                "wat_json", "$['Envelope']['WARC-Header-Metadata']['WARC-Target-URI']"
            ).alias("e"),
        ).collect()
    }
    assert env == {u: u for u in env}


def test_warc_record_content_type_uses_semicolon_parameter():
    # ISO 28500 / WARC 1.0: the record Content-Type parameter separator
    # is a semicolon ('application/http;msgtype=response'); a colon
    # makes archives malformed for warcio/CC tooling.
    from finetoo_sp_spark.sources.warc import make_warc_http

    blob = make_warc([("https://x/1", dt.datetime(2024, 1, 1), b"ok")])
    assert b"Content-Type: application/http;msgtype=response" in blob
    assert b"http:msgtype" not in blob
    blob2 = make_warc_http(
        [("https://x/1", dt.datetime(2024, 1, 1), b"ok", "text/html")]
    )
    assert b"Content-Type: application/http;msgtype=response" in blob2
    assert b"http:msgtype" not in blob2
