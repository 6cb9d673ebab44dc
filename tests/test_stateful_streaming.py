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
