"""CDX index + random access over gzip-member WARC archives.

Common Crawl's access layer is not "read every archive": it is the cdx
index — one line per capture, keyed by (SURT url key, 14-digit
timestamp) and pointing at (filename, byte offset, byte length) of a
SINGLE gzip member inside a .warc.gz, so one HTTP range request (or one
file slice) yields one record without touching the rest of the ~1 GB
archive. This module builds that index Spark-side and proves the
offsets by fetching every record back through them.

Public-knowledge basis only: ISO 28500 (WARC), RFC 1952 (gzip members
are concatenable and each carries its own trailer, so member bounds are
recoverable by streaming inflate), the Internet Archive's SURT
(Sort-friendly URI Reordering Transform, as in webarchive-commons /
pywb), and Common Crawl's published cc-index layout. The C++ reference
(src/finetoo/) has no web-archive random-access layer; this extends the
engine the same way cc-index extends Common Crawl.

Spark shape: the INDEX BUILD is embarrassingly parallel per archive
file (binaryFile source -> one task per .warc.gz; a crawl is ~64k
files, far more than any cluster's cores), and the member scan within a
file is a single streaming inflate pass — O(bytes), no seeks. The SURT
key and digest are JVM-side column expressions (lower / regexp /
split / reverse / sha2), so the Python kernel only finds member bounds
and parses headers. LOOKUPS then never scan: filter on surt_key ranges
(the index is written sorted, so parquet zone maps prune), join to the
archive bytes, slice-decompress one member.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from finetoo_sp_spark.sources.warc import parse_warc

_CHUNK = 1 << 16


def gzip_member_spans(data: bytes) -> list[tuple[int, int]]:
    """(offset, length) of every complete gzip member in ``data``.

    RFC 1952 members are self-delimiting: a streaming inflate reaches
    end-of-member at the trailer, and whatever it did not consume is
    the next member. One pass, O(len(data)); a truncated or corrupt
    tail yields the members before it (tolerant, like parse_warc)."""
    spans: list[tuple[int, int]] = []
    pos, n = 0, len(data)
    while pos < n:
        if data[pos : pos + 2] != b"\x1f\x8b":
            break
        d = zlib.decompressobj(wbits=31)
        cur = pos
        try:
            while not d.eof and cur < n:
                d.decompress(data[cur : cur + _CHUNK])
                cur += _CHUNK
        except zlib.error:
            break
        if not d.eof:
            break
        end = min(cur, n) - len(d.unused_data)
        spans.append((pos, end - pos))
        pos = end
    return spans


def fetch_warc_record(data: bytes, offset: int, length: int):
    """Random access: decompress ONLY ``data[offset:offset+length]``
    (one gzip member) and parse the single WARC record inside it.
    Returns (url, warc_ts, payload) or None — this is the consumer side
    of the cdx contract, and what proves an index entry's offsets."""
    try:
        raw = gzip.decompress(bytes(data[offset : offset + length]))
    except OSError:
        return None
    recs = parse_warc(raw)
    return recs[0] if recs else None


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key as a pure
    JVM-side column expression: lowercase; scheme and fragment dropped;
    default ports :80/:443 dropped; leading www[0-9]*. dropped; host
    labels reversed and comma-joined; ')' + path (default '/'); query
    parameters '&'-sorted. 'https://www.X.Example.com/a?b=2&a=1' ->
    'com,example,x)/a?a=1&b=2' — captures of one page cluster under one
    key regardless of surface spelling, which is what makes the cdx
    sortable/mergeable at crawl scale."""
    u = F.lower(url)
    u = F.regexp_replace(u, "^[a-z][a-z0-9+.-]*://", "")
    u = F.regexp_replace(u, "#.*", "")
    hostport = F.regexp_extract(u, "^([^/?]*)", 1)
    pathq = F.regexp_replace(u, "^[^/?]*", "")
    host = F.regexp_replace(hostport, ":(80|443)$", "")
    host = F.regexp_replace(host, "^www[0-9]*\\.", "")
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    path = F.regexp_replace(pathq, "\\?.*", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.when(
        F.instr(pathq, "?") > 0, F.regexp_replace(pathq, "^[^?]*\\?", "")
    ).otherwise(F.lit(""))
    qsorted = F.array_join(F.sort_array(F.split(qs, "&")), "&")
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(qsorted == "", F.lit("")).otherwise(F.concat(F.lit("?"), qsorted)),
    )


CDX_ENTRY_SCHEMA = (
    "filename string, offset long, length long, rec_seq long,"
    " url string, warc_ts timestamp, html binary"
)


def read_cdx_entries(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory of gzip-member WARCs into per-record index rows
    (filename, offset, length, rec_seq, url, warc_ts, html). rec_seq is
    the record's ordinal within its file by offset. Every row's payload
    is obtained by fetch_warc_record over its OWN (offset, length)
    slice — the scan that builds the index simultaneously exercises the
    random-access path it promises, so a wrong offset cannot produce a
    right payload."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                name = str(p).rsplit("/", 1)[-1]
                data = bytes(blob)
                for seq, (off, ln) in enumerate(gzip_member_spans(data)):
                    rec = fetch_warc_record(data, off, ln)
                    if rec is None:
                        continue
                    url, ts, payload = rec
                    rows.append((name, off, ln, seq, url, ts, payload))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "filename", "offset", "length", "rec_seq",
                        "url", "warc_ts", "html",
                    ],
                )

    return files.mapInPandas(run, schema=CDX_ENTRY_SCHEMA)


ZIPNUM_BLOCK_SCHEMA = (
    "filename string, block_no long, offset long, length long,"
    " n_lines long, first_key string, last_key string, block_sha string"
)


def pack_zipnum(lines: list[str], block_size: int = 3000) -> tuple[bytes, list]:
    """Pack SORTED cdx lines into the ZipNum layout: consecutive blocks
    of ``block_size`` lines, each block gzip-compressed as its own
    member (deterministic mtime=0) and concatenated. Returns (bytes,
    cluster entries) where each cluster entry is (first_key_of_block,
    block_no, offset, length) — the rows of Common Crawl's cluster.idx,
    the tiny secondary index that makes a ~300 GB cdx binary-searchable:
    find the last cluster entry <= your key, range-read ONE block,
    scan <= block_size lines."""
    out = io.BytesIO()
    cluster = []
    for bno in range(0, len(lines), block_size):
        chunk = lines[bno : bno + block_size]
        blob = gzip.compress(("\n".join(chunk) + "\n").encode("utf-8"), mtime=0)
        cluster.append((chunk[0].split(" ", 1)[0], bno // block_size, out.tell(), len(blob)))
        out.write(blob)
    return out.getvalue(), cluster


def zipnum_lookup(data: bytes, cluster: list, key: str) -> list[str]:
    """Consumer side of the two-level index: binary-search the cluster
    entries for the block that can contain ``key``, slice-decompress
    ONLY that member, return its matching lines. O(log blocks) compares
    + one block decode regardless of index size."""
    import bisect

    firsts = [c[0] for c in cluster]
    i = bisect.bisect_right(firsts, key) - 1
    if i < 0:
        return []
    _, _, off, ln = cluster[i]
    text = gzip.decompress(data[off : off + ln]).decode("utf-8")
    return [l for l in text.splitlines() if l.split(" ", 1)[0] == key]


def read_zipnum_blocks(spark: SparkSession, path: str) -> DataFrame:
    """Scan ZipNum part files back into per-block stats (filename,
    block_no, offset, length, n_lines, first_key, last_key, block_sha).
    Each block is decoded from its OWN member slice (fetch path =
    verification path, as in read_cdx_entries); block_sha is sha256 of
    the decompressed block text, so the packing is value-checkable."""
    import hashlib

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                name = str(p).rsplit("/", 1)[-1]
                data = bytes(blob)
                for bno, (off, ln) in enumerate(gzip_member_spans(data)):
                    try:
                        raw = gzip.decompress(data[off : off + ln])
                    except OSError:
                        continue
                    lines = raw.decode("utf-8").splitlines()
                    if not lines:
                        continue
                    rows.append(
                        (
                            name, bno, off, ln, len(lines),
                            lines[0].split(" ", 1)[0],
                            lines[-1].split(" ", 1)[0],
                            hashlib.sha256(raw).hexdigest(),
                        )
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "filename", "block_no", "offset", "length",
                        "n_lines", "first_key", "last_key", "block_sha",
                    ],
                )

    return files.mapInPandas(run, schema=ZIPNUM_BLOCK_SCHEMA)


def build_cdx(spark: SparkSession, path: str) -> DataFrame:
    """The cdx table itself: (surt_key, ts14, url, filename, offset,
    length, digest), sorted by (surt_key, ts14) like Common Crawl's
    cc-index so range filters prune and merges are k-way. digest is
    sha256 of the decoded payload (JVM-side sha2)."""
    e = read_cdx_entries(spark, path)
    return e.select(
        surt_key(F.col("url")).alias("surt_key"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("ts14"),
        "url",
        "filename",
        "offset",
        "length",
        F.sha2("html", 256).alias("digest"),
    ).orderBy("surt_key", "ts14")
