"""Connected-components dedup clustering tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finetoo_sp_spark.operators.components import (
    connected_components,
    dedup_keep_list,
)


def _cc(spark, edges):
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {r["id"]: r["component"] for r in connected_components(pairs).collect()}


def test_two_chains_merge(spark):
    # chain 1-2-3-4 and separate pair 10-11
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_transitive_via_hub(spark):
    # star: 5 is hub; all collapse to min=1
    got = _cc(spark, [(5, 1), (5, 7), (5, 9), (9, 20)])
    assert set(got.values()) == {1}
    assert got[20] == 1


def test_long_path_converges(spark):
    edges = [(i, i + 1) for i in range(0, 40)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_partition_order_independence(spark):
    edges = [(3, 9), (9, 27), (1, 2), (27, 81)]
    a = _cc(spark, edges)
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"]).repartition(7)
    b = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert a == b


def test_keep_list_covers_all_ids(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    all_ids = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    keep = {r["id"]: r["keep"] for r in dedup_keep_list(pairs, all_ids).collect()}
    assert keep == {0: True, 1: True, 2: False, 3: False, 4: True, 5: True}


def test_end_to_end_with_minhash(spark):
    """Near-dup pairs from MinHash -> clusters: exact dups + near dup
    collapse into one keep-id."""
    from finetoo_sp_spark.operators.dedup import minhash_lsh_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight again"),
        (2, "the quick brown fox jumps over the lazy dog tonight again"),
        (3, "the quick brown fox jumps over the lazy cat tonight again"),
        (4, "completely unrelated text about spark shuffles and buckets"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3)
    keep = {
        r["id"]: r["keep"]
        for r in dedup_keep_list(
            pairs, docs.select(F.col("doc_id").alias("id"))
        ).collect()
    }
    assert keep[1] is True and keep[2] is False and keep[4] is True
