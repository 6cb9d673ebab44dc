"""Stateful streaming operator: state persists across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finetoo_sp_spark.datagen import gen_pages
from finetoo_sp_spark.streaming.stateful import host_crawl_state


def test_state_accumulates_across_batches(spark, tmp_path):
    d = str(tmp_path / "pages")
    gen_pages(spark, 120, partitions=3).write.mode("overwrite").parquet(d)

    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)  # force 3 micro-batches
        .parquet(d)
    )
    q = (
        host_crawl_state(stream)
        .writeStream.format("memory")
        .queryName("host_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    updates = spark.sql("SELECT * FROM host_state").toPandas()
    # final per-host totals = max over update rows (totals only grow)
    final = updates.groupby("host")[["total_pages", "total_bytes"]].max()
    expected = (
        spark.read.parquet(d)
        .select(
            F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host"),
            F.length("html").alias("n_bytes"),
        )
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_bytes").alias("b"))
        .toPandas()
        .set_index("host")
    )
    assert final["total_pages"].sum() == 120
    for host, row in expected.iterrows():
        assert final.loc[host, "total_pages"] == row["n"]
        assert final.loc[host, "total_bytes"] == row["b"]
    # hosts spanning multiple micro-batches prove state carried over
    assert (updates.groupby("host")["batches_seen"].max() > 1).any()


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    """A content hash first seen in batch 1 must be dropped when it
    reappears in batch 3 — dedup state carries across micro-batches."""
    d = str(tmp_path / "dup_pages")
    base = gen_pages(spark, 60, partitions=1).select("url", "text")
    # file 1: docs 0-59; file 2: same texts under other urls (all dups);
    # file 3: docs 60-119 (fresh) — maxFilesPerTrigger=1 -> 3 batches
    base.write.mode("overwrite").parquet(d)
    base.select(F.concat(F.lit("https://mirror.example.com/"), "url").alias("url"), "text").write.mode(
        "append"
    ).parquet(d)
    gen_pages(spark, 120, partitions=1).filter("page_id >= 60").select(
        "url", "text"
    ).write.mode("append").parquet(d)

    from finetoo_sp_spark.streaming.dedup import stream_exact_dedup

    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        stream_exact_dedup(stream, n_shards=8)
        .writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.sql("SELECT * FROM stream_dedup").toPandas()
    # 120 distinct texts total; the 60 mirrored dups must be dropped
    assert len(out) == 120
    assert out["content_sha"].nunique() == 120
    assert not out["url"].str.startswith("https://mirror.").any() or (
        # a mirror url may only survive if its batch arrived first —
        # with this file order the originals always precede the mirrors
        False
    )
