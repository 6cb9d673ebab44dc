"""WARC source: read Common-Crawl-style web archives into the pages table.

The north rule's corpus is "Common-Crawl-style web pages"; the container
those actually arrive in is WARC (ISO 28500): a sequence of records,
each a header block (``WARC/1.0`` + name:value lines, notably
WARC-Target-URI / WARC-Date / Content-Length) and a body of exactly
Content-Length bytes, separated by CRLF CRLF. Common Crawl ships them
as ~1 GB gzip files where EVERY record is its own gzip member, so a
stream can be decompressed record-at-a-time; Python's zlib handles
concatenated members natively.

Spark shape: ``spark.read.format("binaryFile")`` turns a WARC directory
into (path, content) rows — one file per task, which is exactly how
Common Crawl is processed at scale (the unit of parallelism is the
archive file; a crawl is ~64k files, far more than any cluster's
cores). The parser is an Arrow-batched ``mapInPandas`` kernel emitting
the input_hint pages schema (url, warc_ts, html:binary); response
records only, HTTP headers stripped from the payload.

A deterministic writer (``make_warc``) exists so fixtures and oracle
queries can build real archives from the driver tables — parity with
datagen's role for HTML.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import re
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"


def make_warc(
    records: list[tuple[str, dt.datetime, bytes]], gzip_members: bool = False
) -> bytes:
    """Build a WARC file from (url, warc_date, payload) response records.
    ``gzip_members=True`` writes the Common-Crawl layout (one gzip
    member per record)."""
    out = io.BytesIO()
    for url, ts, payload in records:
        http = (
            b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: text/html" + _CRLF
            + f"Content-Length: {len(payload)}".encode() + _CRLF
            + _CRLF
            + payload
        )
        header = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + f"WARC-Target-URI: {url}".encode() + _CRLF
            + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}".encode() + _CRLF
            + b"Content-Type: application/http;msgtype=response" + _CRLF
            + f"Content-Length: {len(http)}".encode() + _CRLF
            + _CRLF
        )
        rec = header + http + _CRLF + _CRLF
        out.write(gzip.compress(rec) if gzip_members else rec)
    return out.getvalue()


def parse_warc(
    data: bytes, types: tuple[bytes, ...] = (b"response",)
) -> list[tuple[str, dt.datetime | None, bytes]]:
    """(url, warc_ts, payload) for every record whose WARC-Type is in
    ``types``. Tolerant: malformed records are skipped, never raised —
    a corrupt archive must cost its records, not the task. The HTTP
    envelope is stripped for ``response`` records only; ``conversion``
    (WET) bodies are taken verbatim."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)  # handles concatenated members
        except OSError:
            return []
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = data.find(_CRLF + _CRLF, start)
        if head_end < 0:
            break
        headers = {}
        for line in data[start:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            pos = head_end + 4
            continue
        body = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        rec_type = headers.get(b"warc-type")
        if rec_type not in types:
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts = None
        raw_ts = headers.get(b"warc-date", b"").decode("ascii", "replace")
        try:
            ts = dt.datetime.strptime(raw_ts, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            pass
        # strip the HTTP response envelope (and undo its transfer /
        # content encodings) if present
        payload = _strip_http(body) if rec_type == b"response" else body
        if url:
            out.append((url, ts, payload))
    return out


def _dechunk(body: bytes) -> "bytes | None":
    """Decode an RFC 9112 chunked transfer coding: hex-size CRLF data
    CRLF ... 0 CRLF [trailers] CRLF. Chunk extensions (';ext=...') are
    ignored per spec; trailers are dropped. Returns None on malformed
    framing so callers can fall back to the raw bytes (a WARC must
    never lose a record to a bad origin)."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            return None
        size_tok = body[pos:eol].split(b";")[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return None
        pos = eol + 2
        if size == 0:
            return bytes(out)
        chunk = body[pos : pos + size]
        if len(chunk) < size or body[pos + size : pos + size + 2] != _CRLF:
            return None
        out += chunk
        pos += size + 2


def _decode_http_body(payload: bytes, transfer_enc: str, content_enc: str) -> bytes:
    """WARC response records store the HTTP message as it crossed the
    wire (ISO 28500 §6.3.2), so chunked framing and compressed
    representations arrive verbatim — warcio/CC tooling decodes both
    layers and so do we: Transfer-Encoding first (transport framing),
    then Content-Encoding (representation). Tolerant: undecodable
    bodies pass through raw rather than costing the record."""
    if "chunked" in transfer_enc:
        decoded = _dechunk(payload)
        if decoded is not None:
            payload = decoded
    ce = content_enc.strip()
    if ce in ("gzip", "x-gzip"):
        try:
            payload = gzip.decompress(payload)
        except OSError:
            pass
    elif ce == "deflate":
        try:
            payload = zlib.decompress(payload)
        except zlib.error:
            try:
                payload = zlib.decompress(payload, -15)  # raw-deflate origins
            except zlib.error:
                pass
    return payload


def _strip_http(body: bytes) -> bytes:
    """Strip the HTTP response envelope and undo its transfer /
    content encodings (see _decode_http_body). Bodies that do not start
    with an HTTP status line are returned untouched."""
    if body[:5] != b"HTTP/":
        return body
    sep = body.find(_CRLF + _CRLF)
    if sep < 0:
        return body
    te = ce = ""
    for line in body[:sep].split(_CRLF)[1:]:
        k, _, v = line.partition(b":")
        hk = k.strip().lower()
        if hk == b"transfer-encoding":
            te = v.strip().decode("ascii", "replace").lower()
        elif hk == b"content-encoding":
            ce = v.strip().decode("ascii", "replace").lower()
    return _decode_http_body(body[sep + 4 :], te, ce)


def _chunk_encode(payload: bytes, size: int = 1000) -> bytes:
    """Deterministic chunked transfer coding (fixed chunk size) for the
    writer side — fixtures exercise multi-chunk bodies without any
    content-dependent framing choices."""
    out = bytearray()
    for i in range(0, len(payload), size):
        part = payload[i : i + size]
        out += f"{len(part):x}".encode() + _CRLF + part + _CRLF
    out += b"0" + _CRLF + _CRLF
    return bytes(out)


def make_warc_transfer(
    records: list[tuple[str, "dt.datetime", bytes, str]],
) -> bytes:
    """make_warc variant exercising on-wire HTTP encodings: records are
    (url, ts, payload, mode) with mode in {'plain', 'chunked', 'gzip',
    'chunked+gzip'}. 'gzip' applies Content-Encoding (deterministic
    mtime=0) and 'chunked' wraps the (possibly compressed) body in
    Transfer-Encoding framing — the layering real origins produce and
    parse_warc/_strip_http must undo."""
    out = io.BytesIO()
    for url, ts, payload, mode in records:
        body = payload
        extra = b""
        if "gzip" in mode:
            body = gzip.compress(body, mtime=0)
            extra += b"Content-Encoding: gzip" + _CRLF
        if "chunked" in mode:
            body = _chunk_encode(body)
            extra += b"Transfer-Encoding: chunked" + _CRLF
        http = (
            b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: text/html" + _CRLF
            + extra
            + f"Content-Length: {len(body)}".encode() + _CRLF
            + _CRLF
            + body
        )
        header = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + f"WARC-Target-URI: {url}".encode() + _CRLF
            + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}".encode() + _CRLF
            + b"Content-Type: application/http;msgtype=response" + _CRLF
            + f"Content-Length: {len(http)}".encode() + _CRLF
            + _CRLF
        )
        out.write(header + http + _CRLF + _CRLF)
    return out.getvalue()


PAGES_FROM_WARC_SCHEMA = "url string, warc_ts timestamp, html binary"


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC directory/glob -> pages(url, warc_ts, html). One archive
    file per task (binaryFile source); the parse is an Arrow-batched
    kernel, bytes never leave the JVM except as the per-file blob."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                rows.extend(parse_warc(bytes(blob)))
            if rows:
                yield pd.DataFrame(rows, columns=["url", "warc_ts", "html"])

    return files.select("content").mapInPandas(run, schema=PAGES_FROM_WARC_SCHEMA)


WET_SCHEMA = "url string, warc_ts timestamp, text string"


def read_wet_text(spark: SparkSession, path: str) -> DataFrame:
    """WET directory/glob -> (url, warc_ts, text): the read twin of
    operators/sinks.write_wet. Same shape as read_warc_pages (one file
    per task via binaryFile, Arrow-batched parse) but keeps
    ``conversion`` records and decodes bodies as UTF-8 text."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for url, ts, payload in parse_warc(
                    bytes(blob), types=(b"conversion",)
                ):
                    rows.append((url, ts, payload.decode("utf-8", "replace")))
            if rows:
                yield pd.DataFrame(rows, columns=["url", "warc_ts", "text"])

    return files.select("content").mapInPandas(run, schema=WET_SCHEMA)


def read_wat_meta(spark: SparkSession, path: str) -> DataFrame:
    """WAT ingest: binaryFile -> metadata records -> (url, wat_json).
    The JSON envelope stays a string column for JVM-side lifts
    (get_json_object / json_array_length) downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for url, _ts, payload in parse_warc(
                    bytes(content), types=(b"metadata",)
                ):
                    rows.append((url, payload.decode("utf-8", "replace")))
            yield pd.DataFrame(rows, columns=["url", "wat_json"])

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInPandas(run, schema="url string, wat_json string")
    )


def make_warc_http(
    records: list[tuple[str, "dt.datetime", bytes, str]],
) -> bytes:
    """make_warc variant with a per-record HTTP Content-Type (the
    transport charset carrier): records are (url, ts, payload,
    content_type)."""
    out = io.BytesIO()
    for url, ts, payload, ctype in records:
        http = (
            b"HTTP/1.1 200 OK" + _CRLF
            + f"Content-Type: {ctype}".encode() + _CRLF
            + f"Content-Length: {len(payload)}".encode() + _CRLF
            + _CRLF
            + payload
        )
        header = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + f"WARC-Target-URI: {url}".encode() + _CRLF
            + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}".encode() + _CRLF
            + b"Content-Type: application/http;msgtype=response" + _CRLF
            + f"Content-Length: {len(http)}".encode() + _CRLF
            + _CRLF
        )
        out.write(header + http + _CRLF + _CRLF)
    return out.getvalue()


_CHARSET_PARAM = re.compile(rb"charset\s*=\s*\"?\s*([A-Za-z0-9_.:\-]+)", re.I)


def parse_warc_http(
    data: bytes,
) -> list[tuple[str, "dt.datetime | None", bytes, str, str]]:
    """Like parse_warc(response) but keeps the transport layer:
    (url, warc_ts, payload, http_charset_label, x_robots). The charset
    label is the raw charset parameter of the HTTP Content-Type header
    ('' when the header carries none) — the WHATWG layer that outranks
    in-document meta declarations; x_robots is the lowercased
    X-Robots-Tag header value ('' when absent) — the transport-layer
    robots/opt-out signal beside the meta robots tag."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except OSError:
            return []
    out = []
    pos, n = 0, len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = data.find(_CRLF + _CRLF, start)
        if head_end < 0:
            break
        headers = {}
        for line in data[start:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            pos = head_end + 4
            continue
        body = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts = None
        try:
            ts = dt.datetime.strptime(
                headers.get(b"warc-date", b"").decode("ascii", "replace"),
                "%Y-%m-%dT%H:%M:%SZ",
            )
        except ValueError:
            pass
        payload, label, x_robots, te, ce = body, "", "", "", ""
        if body[:5] == b"HTTP/":
            sep = body.find(_CRLF + _CRLF)
            if sep >= 0:
                http_head, payload = body[:sep], body[sep + 4 :]
                for line in http_head.split(_CRLF)[1:]:
                    k, _, v = line.partition(b":")
                    hk = k.strip().lower()
                    if hk == b"content-type":
                        m = _CHARSET_PARAM.search(v)
                        if m:
                            label = m.group(1).decode("ascii", "replace").lower()
                    elif hk == b"x-robots-tag":
                        # Origins/CDNs commonly emit SEVERAL X-Robots-Tag
                        # headers (e.g. 'noindex' + 'noai' on separate
                        # lines); RFC 9110 §5.3 says repeated field lines
                        # are equivalent to one comma-joined list, so
                        # accumulate rather than overwrite — dropping
                        # earlier lines would under-block opted-out pages.
                        tok = v.strip().decode("utf-8", "replace").lower()
                        x_robots = f"{x_robots}, {tok}" if x_robots else tok
                    elif hk == b"transfer-encoding":
                        te = v.strip().decode("ascii", "replace").lower()
                    elif hk == b"content-encoding":
                        ce = v.strip().decode("ascii", "replace").lower()
                payload = _decode_http_body(payload, te, ce)
        if url:
            out.append((url, ts, payload, label, x_robots))
    return out


def read_warc_pages_http(spark: SparkSession, path: str) -> DataFrame:
    """(url, warc_ts, html, http_charset, x_robots) — the pages table
    plus the transport-layer signals: the charset label feeds
    extraction/charset.py's full WHATWG priority chain (BOM > HTTP >
    meta > default), x_robots feeds the compliance gate
    (extraction/compliance.with_http_compliance)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parse_warc_http(bytes(content)))
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "http_charset", "x_robots"],
            )

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInPandas(
            run,
            schema=(
                "url string, warc_ts timestamp, html binary,"
                " http_charset string, x_robots string"
            ),
        )
    )


# --- revisit records (crawl-time dedup, IIPC identical-payload-digest) ----

_REVISIT_PROFILE = b"http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"


def make_warc_mixed(records: list[tuple], gzip_members: bool = False) -> bytes:
    """WARC writer with revisit support (ISO 28500 + the IIPC
    identical-payload-digest profile — how Common Crawl dedups repeat
    captures at crawl time without storing the payload twice). Records
    are either ('response', url, ts, payload) or ('revisit', url, ts,
    refers_url, refers_ts, digest): a revisit stores ONLY the HTTP
    headers plus WARC-Refers-To-Target-URI / WARC-Refers-To-Date /
    WARC-Payload-Digest pointers to the original capture."""
    out = io.BytesIO()
    for rec in records:
        kind = rec[0]
        if kind == "response":
            _, url, ts, payload = rec
            http = (
                b"HTTP/1.1 200 OK" + _CRLF
                + b"Content-Type: text/html" + _CRLF
                + f"Content-Length: {len(payload)}".encode() + _CRLF
                + _CRLF
                + payload
            )
            extra = b""
        else:
            _, url, ts, refers_url, refers_ts, digest = rec
            http = (
                b"HTTP/1.1 200 OK" + _CRLF
                + b"Content-Length: 0" + _CRLF
                + _CRLF
            )
            extra = (
                b"WARC-Profile: " + _REVISIT_PROFILE + _CRLF
                + f"WARC-Refers-To-Target-URI: {refers_url}".encode() + _CRLF
                + f"WARC-Refers-To-Date: {refers_ts.strftime('%Y-%m-%dT%H:%M:%SZ')}".encode() + _CRLF
                + f"WARC-Payload-Digest: {digest}".encode() + _CRLF
            )
        header = (
            b"WARC/1.0" + _CRLF
            + f"WARC-Type: {'response' if kind == 'response' else 'revisit'}".encode() + _CRLF
            + f"WARC-Target-URI: {url}".encode() + _CRLF
            + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}".encode() + _CRLF
            + extra
            + b"Content-Type: application/http;msgtype=response" + _CRLF
            + f"Content-Length: {len(http)}".encode() + _CRLF
            + _CRLF
        )
        rec_bytes = header + http + _CRLF + _CRLF
        out.write(gzip.compress(rec_bytes, mtime=0) if gzip_members else rec_bytes)
    return out.getvalue()


def parse_warc_revisits(
    data: bytes,
) -> list[tuple[str, "dt.datetime | None", str, "dt.datetime | None", str]]:
    """(url, warc_ts, refers_url, refers_ts, payload_digest) for every
    revisit record. Same tolerant single-pass walk as parse_warc."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except OSError:
            return []
    out = []
    pos, n = 0, len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = data.find(_CRLF + _CRLF, start)
        if head_end < 0:
            break
        headers = {}
        for line in data[start:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            pos = head_end + 4
            continue
        pos = head_end + 4 + length
        if headers.get(b"warc-type") != b"revisit":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")

        def _ts(raw: bytes):
            try:
                return dt.datetime.strptime(
                    raw.decode("ascii", "replace"), "%Y-%m-%dT%H:%M:%SZ"
                )
            except ValueError:
                return None

        if url:
            out.append(
                (
                    url,
                    _ts(headers.get(b"warc-date", b"")),
                    headers.get(b"warc-refers-to-target-uri", b"").decode(
                        "utf-8", "replace"
                    ),
                    _ts(headers.get(b"warc-refers-to-date", b"")),
                    headers.get(b"warc-payload-digest", b"").decode(
                        "ascii", "replace"
                    ),
                )
            )
    return out


def read_warc_revisits(spark: SparkSession, path: str) -> DataFrame:
    """WARC directory -> revisit pointer rows (url, warc_ts, refers_url,
    refers_ts, digest). Same binaryFile + Arrow-kernel shape as
    read_warc_pages."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                rows.extend(parse_warc_revisits(bytes(blob)))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["url", "warc_ts", "refers_url", "refers_ts", "digest"],
                )

    return files.select("content").mapInPandas(
        run,
        schema=(
            "url string, warc_ts timestamp, refers_url string,"
            " refers_ts timestamp, digest string"
        ),
    )


def read_warc_resolved(spark: SparkSession, path: str) -> DataFrame:
    """The dedup-aware pages view: response records pass through;
    revisit records are RESOLVED to their original capture's payload by
    an equi-join on (refers_url, refers_ts), and the stored
    WARC-Payload-Digest is checked against the resolved bytes
    (digest_ok). Unresolvable revisits (original not in this path) are
    dropped — at crawl scale the join key is (url, ts), so resolution
    shuffles both sides once and never moves payloads for responses.

    Output: (url, warc_ts, html, is_revisit, digest_ok)."""
    resp = read_warc_pages(spark, path)
    rev = read_warc_revisits(spark, path)
    originals = resp.select(
        F.col("url").alias("refers_url"),
        F.col("warc_ts").alias("refers_ts"),
        F.col("html").alias("orig_html"),
    )
    resolved = (
        rev.join(originals, ["refers_url", "refers_ts"], "inner")
        .select(
            "url",
            "warc_ts",
            F.col("orig_html").alias("html"),
            F.lit(True).alias("is_revisit"),
            (
                F.regexp_replace("digest", "^sha256:", "")
                == F.sha2("orig_html", 256)
            ).alias("digest_ok"),
        )
    )
    plain = resp.select(
        "url",
        "warc_ts",
        "html",
        F.lit(False).alias("is_revisit"),
        F.lit(True).alias("digest_ok"),
    )
    return plain.unionByName(resolved)
