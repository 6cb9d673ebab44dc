"""Catalog seam: parquet fallback semantics (Iceberg runtime absent here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from finetoo_sp_spark.sources.catalog import iceberg_available, read_table, write_table


def test_iceberg_not_configured(spark):
    assert iceberg_available(spark) is False


def test_parquet_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    write_table(df, p, mode="replace")
    assert read_table(spark, p).count() == 2


def test_overwrite_partitions_replaces_only_touched(spark, tmp_path):
    p = str(tmp_path / "t2")
    df = spark.createDataFrame([(1, 0, "x"), (2, 1, "y")], ["k", "part", "v"])
    write_table(df, p, mode="replace", partition_by=["part"])
    # second write touches only part=1; part=0 must survive
    df2 = spark.createDataFrame([(3, 1, "z")], ["k", "part", "v"])
    write_table(df2, p, mode="overwrite_partitions", partition_by=["part"])
    got = {(r["k"], r["part"]) for r in read_table(spark, p).collect()}
    assert got == {(1, 0), (3, 1)}
