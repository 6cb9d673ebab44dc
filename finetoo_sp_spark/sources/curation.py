"""Resumable lineage for the dedup/curation capstone.

VERDICT r02 #9: at 10^12 rows a crashed curation job must not be a full
recompute. Resume granularity follows the data-flow shape, which is NOT
the extraction pipeline's embarrassingly-parallel one:

- **pairs phase** (shingle inverted index -> candidate self-join ->
  verified Jaccard pairs) is a GLOBAL join: an output bucket cannot be
  recomputed without re-running the whole join, so its checkpoint is
  all-or-nothing — the pair set is materialized bucketed by
  hash(id_a) under ``<out>/pairs`` and a ``_PHASE_COMPLETE`` marker
  (written only after the data + manifests commit) makes it reusable.
  On resume the join — the expensive part at scale — is skipped
  entirely and pairs stream back from parquet.
- **survivors phase** (quality gate + connected components ->
  materialized surviving corpus) resumes PER BUCKET exactly like
  extraction: survivors are written partitionBy(bucket =
  pmod(xxhash64(id), B)) with per-bucket manifests; a re-run anti-joins
  committed buckets and rewrites only the missing ones (dynamic
  partition overwrite keeps it idempotent). The keep-list itself is
  recomputed on resume — it is id-sized (tiny next to the corpus text
  that per-bucket resume avoids re-shuffling) and a pure function of
  the checkpointed pairs, so the resumed output is byte-identical.

Same manifest/checksum discipline as sources/lineage.py (bit_xor of
row hashes: order- and partition-independent).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finetoo_sp_spark.sources.lineage import MANIFEST_DIRNAME, read_manifests

PAIRS_MARKER = "_PHASE_COMPLETE"


def _sha60(col):
    return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")


def _bucket_of(col: str, n_buckets: int, hash_mode: str):
    """Bucket id for resume partitioning. 'sha' mode hashes the id's
    string form so DuckDB reproduces it exactly (the manifest-oracle
    mode, as in sources/lineage.py); production uses xxhash64."""
    if hash_mode == "sha":
        return F.pmod(_sha60(F.col(col).cast("string")), F.lit(n_buckets)).cast("int")
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def _checksum_of(key_cols: list[str], hash_mode: str):
    cols = [F.col(c).cast("string") for c in key_cols]
    if hash_mode == "sha":
        return F.bit_xor(_sha60(F.concat_ws("\x01", *cols)))
    return F.bit_xor(F.xxhash64(*key_cols))


def _write_bucketed(
    df: DataFrame,
    out_dir: str,
    key_cols: list[str],
    n_buckets: int,
    exclude_buckets: DataFrame | None = None,
    hash_mode: str = "xxhash64",
) -> None:
    """Generic bucketed write + per-bucket manifests (counts + xor-fold
    checksum over ``key_cols``); manifests land only after the data
    commit, so manifest presence == bucket committed.
    ``exclude_buckets``: buckets already committed in a prior run —
    their data is untouched by the dynamic overwrite and their manifest
    rows must not be appended twice."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    data = df.repartition(n_buckets, "bucket")
    data.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(out_dir, "data")
    )
    written = spark.read.parquet(os.path.join(out_dir, "data"))
    if exclude_buckets is not None:
        written = written.join(F.broadcast(exclude_buckets), "bucket", "left_anti")
    manifest = written.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("output_count"),
        _checksum_of(key_cols, hash_mode).alias("content_checksum"),
        F.lit("committed").alias("status"),
    )
    manifest.repartition(32, "bucket").write.mode("append").partitionBy("bucket").parquet(
        os.path.join(out_dir, MANIFEST_DIRNAME)
    )


def run_resumable_curation(
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 100,
    n_buckets: int = 32,
    hash_mode: str = "xxhash64",
) -> dict:
    """Quality gate + near-dup clustering + survivor materialization,
    resumable from the two checkpoints described in the module
    docstring. Returns a metrics dict (phase timings, rows, reuse
    flags) — the curation twin of run_resumable_extraction's manifest.
    """
    from finetoo_sp_spark.operators import textstats as ts
    from finetoo_sp_spark.operators.components import dedup_keep_list
    from finetoo_sp_spark.operators.dedup import ngram_jaccard_pairs

    spark = docs.sparkSession
    phases: dict[str, float] = {}
    pairs_dir = os.path.join(out_dir, "pairs")
    surv_dir = os.path.join(out_dir, "survivors")
    marker = os.path.join(pairs_dir, PAIRS_MARKER)

    # --- phase 1: candidate pairs (all-or-nothing checkpoint) ----------
    t = time.time()
    pairs_reused = os.path.exists(marker)
    if pairs_reused:
        pairs = spark.read.parquet(os.path.join(pairs_dir, "data")).drop("bucket")
    else:
        fresh = ngram_jaccard_pairs(
            docs, id_col, text_col, n=n, threshold=threshold, max_df=max_df
        ).withColumn("bucket", _bucket_of("id_a", n_buckets, hash_mode))
        _write_bucketed(fresh, pairs_dir, ["id_a", "id_b"], n_buckets, hash_mode=hash_mode)
        n_pairs = spark.read.parquet(os.path.join(pairs_dir, "data")).count()
        with open(marker, "w") as f:  # commit marker AFTER data+manifests
            json.dump({"n_pairs": n_pairs, "threshold": threshold, "n": n}, f)
        pairs = spark.read.parquet(os.path.join(pairs_dir, "data")).drop("bucket")
    phases["pairs"] = round(time.time() - t, 2)

    # --- phase 2: survivors (per-bucket resumable, like extraction) ----
    t = time.time()
    committed = read_manifests(spark, surv_dir)
    done_buckets = committed.select("bucket").distinct() if committed is not None else None
    n_done = done_buckets.count() if done_buckets is not None else 0

    quality = ts.quality_scores(docs, id_col, text_col).filter(F.col("keep")).select("id")
    keep = dedup_keep_list(pairs, docs.select(F.col(id_col).alias("id"))).filter(
        F.col("keep")
    )
    survivors = (
        docs.withColumnRenamed(id_col, "id")
        .join(quality, "id", "left_semi")
        .join(keep.select("id"), "id", "left_semi")
        .withColumn("bucket", _bucket_of("id", n_buckets, hash_mode))
    )
    todo = survivors
    if done_buckets is not None:
        todo = survivors.join(F.broadcast(done_buckets), "bucket", "left_anti")
    # empty-todo fast path: count the manifest (tiny), not the corpus
    if n_done < n_buckets:
        _write_bucketed(
            todo, surv_dir, ["id"], n_buckets,
            exclude_buckets=done_buckets, hash_mode=hash_mode,
        )
    phases["survivors"] = round(time.time() - t, 2)

    man = read_manifests(spark, surv_dir)
    agg = man.agg(
        F.countDistinct("bucket").alias("b"), F.sum("output_count").alias("o")
    ).collect()[0]
    return {
        "pairs_reused": pairs_reused,
        "buckets_total": n_buckets,
        "buckets_committed_before": n_done,
        "buckets_processed": int(agg["b"] or 0) - n_done,
        "rows_out": int(agg["o"] or 0),
        "phases": phases,
    }
