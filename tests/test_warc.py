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


def test_warc_revisit_roundtrip_and_resolution(spark, tmp_path):
    """IIPC identical-payload-digest revisits: the revisit record stores
    only pointers; read_warc_resolved joins it back to the original
    capture's payload and validates the stored digest."""
    import hashlib

    from finetoo_sp_spark.sources.warc import (
        make_warc_mixed,
        parse_warc,
        parse_warc_revisits,
        read_warc_resolved,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t1 = dt.datetime(2024, 1, 2, 0, 0, 0)
    payload = b"<html>original</html>"
    good = "sha256:" + hashlib.sha256(payload).hexdigest()
    bad = "sha256:" + hashlib.sha256(payload + b"!").hexdigest()
    recs = [
        ("response", "https://a/1", t0, payload),
        ("revisit", "https://a/1b", t1, "https://a/1", t0, good),
        ("revisit", "https://a/1c", t1, "https://a/1", t0, bad),
        ("revisit", "https://a/1d", t1, "https://gone/x", t0, good),
    ]
    for gz in (False, True):
        blob = make_warc_mixed(recs, gzip_members=gz)
        # response reader never sees revisits; revisit reader never
        # sees responses
        assert [u for u, _, _ in parse_warc(blob)] == ["https://a/1"]
        revs = parse_warc_revisits(blob)
        assert [(r[0], r[2], r[4]) for r in revs] == [
            ("https://a/1b", "https://a/1", good),
            ("https://a/1c", "https://a/1", bad),
            ("https://a/1d", "https://gone/x", good),
        ]
        assert all(r[1] == t1 and r[3] == t0 for r in revs)

    d = tmp_path / "warc"
    d.mkdir()
    (d / "f.warc.gz").write_bytes(make_warc_mixed(recs, gzip_members=True))
    got = {
        r["url"]: (bytes(r["html"]), r["is_revisit"], r["digest_ok"])
        for r in read_warc_resolved(spark, str(d)).collect()
    }
    # unresolvable revisit (original not in corpus) is dropped
    assert set(got) == {"https://a/1", "https://a/1b", "https://a/1c"}
    assert got["https://a/1"] == (payload, False, True)
    assert got["https://a/1b"] == (payload, True, True)
    assert got["https://a/1c"] == (payload, True, False)


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
