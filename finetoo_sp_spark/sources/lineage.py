"""Per-partition lineage manifests + checkpoint resume.

North-rule requirement: "writes extracted rows back with per-partition
lineage manifests and extraction-rate metrics so any failed partition range
can be resumed from checkpoint without recompute."

Design (scale-sane — no driver-side per-bucket loops):

1. every row gets a deterministic ``bucket = pmod(xxhash64(url), B)``;
2. output is written ``partitionBy("bucket")`` (idempotent per-bucket
   dynamic overwrite — a re-run of a bucket replaces exactly that bucket);
3. a *manifest* table (one row per bucket: input_count, output_count,
   content checksum, status='committed') is computed as a single
   ``groupBy(bucket)`` aggregation over the just-written data and appended
   atomically per bucket (one file per bucket under ``_manifests/``);
4. resume = anti-join the full bucket domain against committed manifest
   buckets, re-run only the missing buckets' rows.

The checksum is an order-independent 64-bit fold (``bit_xor`` of
``xxhash64(url, text)``) so it is partition-order-proof — the
same determinism discipline the reference needs for block hashes
(reference: src/graph/block_analyzer.cc:22-30 sorted-by-handle hashing).

On a real cluster the output table would be Iceberg
(``df.writeTo(...).append()`` with atomic snapshot commits); in this
sandbox we use the parquet directory layout + per-bucket manifest files,
which gives the same resume semantics (a bucket is committed iff its
manifest file exists).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finetoo_sp_spark.extraction.extract import extract_pages, url_salt

MANIFEST_DIRNAME = "_manifests"


def _row_hash(hash_mode: str):
    """Per-row 64-bit hash of (url, text) for the checksum fold.

    'sha' mode is DuckDB-reproducible (sha256-derived 60-bit over
    url || \\x01 || text) so the manifest checksum itself can sit under a
    value oracle; production uses xxhash64.
    """
    if hash_mode == "sha":
        return F.conv(
            F.substring(F.sha2(F.concat_ws("\x01", "url", "text"), 256), 1, 15), 16, 10
        ).cast("long")
    return F.xxhash64("url", "text")


def _manifest_frame(
    result: DataFrame, input_counts: DataFrame, hash_mode: str = "xxhash64"
) -> DataFrame:
    """One row per bucket: counts + order-independent content checksum.

    ``result`` must already carry ``row_hash`` / ``text_chars`` columns
    (stamped by :func:`write_with_manifests` before the write, or
    recomputed from text by the strict verify path)."""
    out = result.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("output_count"),
        # XOR-fold of row hashes -> order/partition independent, no overflow
        F.bit_xor("row_hash").alias("content_checksum"),
        F.sum("text_chars").alias("output_chars"),
    )
    return (
        input_counts.join(out, "bucket", "left")
        .select(
            "bucket",
            "input_count",
            F.coalesce("output_count", F.lit(0)).alias("output_count"),
            F.coalesce("content_checksum", F.lit(0)).alias("content_checksum"),
            F.coalesce("output_chars", F.lit(0)).alias("output_chars"),
            F.lit("committed").alias("status"),
        )
    )


def read_manifests(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = os.path.join(out_dir, MANIFEST_DIRNAME)
    if not os.path.isdir(path):  # cheap driver-side check, no Spark job
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def write_with_manifests(
    result: DataFrame,
    out_dir: str,
    input_counts: DataFrame | None = None,
    n_buckets: int | None = None,
    hash_mode: str = "xxhash64",
    verify_content: bool = False,
) -> None:
    """Write a bucketed result + its manifest rows.

    ``result`` must carry a ``bucket`` column; ``input_counts`` is
    (bucket, input_count) computed from the *input* side (cheap parquet
    count — computing it from ``result`` would re-run the extraction).

    Scale discipline:
    - ``repartition(n_buckets, bucket)`` right before the write so each
      task emits ~one bucket -> ~n_buckets output files total, instead of
      tasks x buckets tiny files whose commit serializes on the driver;
      this shuffle moves *extracted* text (much smaller than raw html)
      and IS the hash(url) anti-skew salt of the north rule.
    - dynamic partition overwrite: re-running a bucket (after a failure)
      replaces exactly that bucket's files, never duplicates.
    - manifests land under ``out_dir/_manifests`` only after the data
      commit succeeds (manifest presence == commit marker per bucket).
      Per-row lineage stats (``row_hash``, ``text_chars``) are stamped
      as output columns BEFORE the write — the Iceberg discipline:
      manifest stats are computed at commit time from the rows being
      committed, then the manifest aggregation reads back ONLY those
      slim columns from disk (parquet column pruning — the text bytes
      are decompressed once, not twice). ``verify_content=True``
      switches to the strict audit that re-hashes the text actually on
      disk (catches silent data-file corruption beyond parquet's own
      page checksums, at the cost of a full second text scan).
    """
    spark = result.sparkSession
    data_path = os.path.join(out_dir, "data")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    result = result.withColumn("row_hash", _row_hash(hash_mode)).withColumn(
        "text_chars", F.length("text")
    )
    if n_buckets:
        result = result.repartition(n_buckets, "bucket")
    result.write.mode("overwrite").partitionBy("bucket").parquet(data_path)

    if verify_content:
        written = (
            spark.read.parquet(data_path)
            .drop("row_hash", "text_chars")
            .withColumn("row_hash", _row_hash(hash_mode))
            .withColumn("text_chars", F.length("text"))
        )
    else:
        written = spark.read.parquet(data_path).select(
            "bucket", "row_hash", "text_chars"
        )
    if input_counts is None:
        # extraction is row-preserving (one output row per page), so the
        # written data doubles as the input-count source when the caller
        # didn't supply an independent one (unit-test path).
        input_counts = written.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("input_count")
        )
    else:
        written = written.join(
            F.broadcast(input_counts.select("bucket")), "bucket", "left_semi"
        )
    manifest = _manifest_frame(written, input_counts, hash_mode=hash_mode)
    # without this repartition AQE coalesces the tiny manifest frame to ONE
    # task that then creates every bucket=* directory serially (seconds of
    # hidden serial time); 32-way spreads the filesystem work
    manifest.repartition(32, "bucket").write.mode("append").partitionBy(
        "bucket"
    ).parquet(os.path.join(out_dir, MANIFEST_DIRNAME))


def run_resumable_extraction(
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 256,
    keep_cols: list[str] | None = None,
    strict_input_counts: bool = False,
    pre_partition: bool = False,
    hash_mode: str = "xxhash64",
    extractor=None,
) -> dict:
    """Extract ``pages`` -> ``out_dir``, skipping buckets already committed.

    ``strict_input_counts``: compute per-bucket input counts from the
    *input* side as an independent cross-check against output counts (one
    extra url-only scan + tiny shuffle). Off by default: the kernel is
    row-preserving (exactly one output row per page), so output counts
    are the input counts; the fresh-run row total still comes from the
    parquet metadata count (no data scan, catches dropped-partition bugs).

    Salting: the ``hash(url)`` bucket id is the shuffle key for the
    pre-write ``repartition(n_buckets, bucket)`` (inside
    write_with_manifests), so host-level skew never concentrates in an
    output partition. ``pre_partition=True`` additionally shuffles the
    *raw* pages onto the bucket layout before the UDF — use when the
    input file layout itself is host-clustered (e.g. WARC files grouped
    by crawl host) so that UDF task sizes equalize; it costs a
    raw-byte shuffle, so leave off for byte-balanced input splits.
    ``n_buckets`` should be >= 4x total executor cores; it is also the
    resume granularity.

    Returns a metrics dict (extraction-rate metrics manifest): buckets
    total/committed/processed, rows in/out, phase timings.
    """
    import time

    spark = pages.sparkSession
    phases: dict[str, float] = {}
    t = time.time()
    pages_b = pages.withColumn("bucket", url_salt(n_buckets, hash_mode=hash_mode))

    committed = read_manifests(spark, out_dir)
    input_counts = None
    if committed is not None:
        done = committed.select("bucket").distinct()
        todo = pages_b.join(F.broadcast(done), "bucket", "left_anti")  # resume
        n_done = done.count()
        # resume path is rare + partial: always count the remaining input
        input_counts = (
            todo.groupBy("bucket").agg(F.count(F.lit(1)).alias("input_count")).cache()
        )
        n_in = int(
            (input_counts.agg(F.sum("input_count").alias("n")).collect()[0]["n"]) or 0
        )
    else:
        todo = pages_b
        n_done = 0
        if strict_input_counts:
            input_counts = (
                todo.groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("input_count"))
                .cache()
            )
            n_in = int(
                (input_counts.agg(F.sum("input_count").alias("n")).collect()[0]["n"])
                or 0
            )
        else:
            n_in = pages.count()  # parquet metadata count: no data scan
    phases["plan_and_count"] = round(time.time() - t, 2)
    if n_in == 0:
        if input_counts is not None:
            input_counts.unpersist()
        return {
            "buckets_total": n_buckets,
            "buckets_committed_before": n_done,
            "buckets_processed": 0,
            "rows_in": 0,
            "rows_out": 0,
            "phases": phases,
        }

    t = time.time()
    if pre_partition:
        todo = todo.repartition(n_buckets, "bucket")
    # extractor is pluggable (same signature as extract_pages): pass
    # extraction.pdf.extract_pages_any for mixed HTML/PDF corpora
    extracted = (extractor or extract_pages)(
        todo, repartition_buckets=None, keep_cols=(keep_cols or []) + ["bucket"]
    )
    write_with_manifests(
        extracted,
        out_dir,
        input_counts,
        n_buckets=None if pre_partition else n_buckets,
        hash_mode=hash_mode,
    )
    phases["extract_write_manifest"] = round(time.time() - t, 2)

    t = time.time()
    man = read_manifests(spark, out_dir)
    agg = man.agg(
        F.countDistinct("bucket").alias("b"),
        F.sum("output_count").alias("o"),
    ).collect()[0]
    phases["final_audit"] = round(time.time() - t, 2)
    if input_counts is not None:
        input_counts.unpersist()
    return {
        "buckets_total": n_buckets,
        "buckets_committed_before": n_done,
        "buckets_processed": int(agg["b"]) - n_done,
        "rows_in": n_in,
        "rows_out": int(agg["o"]),
        "phases": phases,
    }
