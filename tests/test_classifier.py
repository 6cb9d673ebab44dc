"""Hashed linear quality classifier (operators/classifier.py)."""

import pytest

from pyspark.sql import functions as F

from finetoo_sp_spark.operators.classifier import hashed_linear_scores
from finetoo_sp_spark.operators.importance import _bucket


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "good clean prose"),
        (2, "spam spam spam"),
        (3, "good spam"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _weights_for(spark, n_buckets, mapping):
    """(bucket, w) table assigning a weight to each feature string;
    every other bucket is absent (-> weighs 0 via the left join)."""
    feats = spark.createDataFrame(
        list(mapping.items()), "feat string, w long"
    )
    return feats.select(_bucket(F.col("feat"), n_buckets).alias("bucket"), "w")


def test_trained_weights_gate_documents(spark, corpus):
    n_buckets = 1 << 16
    weights = _weights_for(spark, n_buckets, {"good": 100, "spam": -100})
    out = hashed_linear_scores(
        corpus, "doc_id", "text", weights=weights, n_buckets=n_buckets
    )
    rows = {r["id"]: r for r in out.collect()}
    # doc 1: feats = 3 unigrams + 2 bigrams = 5 instances; only 'good'
    # carries weight -> margin +100, score_fp = 100*65536 div 5
    assert rows[1]["n_feats"] == 5
    assert rows[1]["score_fp"] == (100 * 65536) // 5 and rows[1]["keep"] is True
    # doc 2: margin = 3 * -100 over 5 instances -> dropped (exact value)
    assert rows[2]["score_fp"] == -(300 * 65536) // 5 and rows[2]["keep"] is False
    # doc 3: +100 -100 = 0 margin -> score 0 -> kept at threshold 0
    assert rows[3]["score_fp"] == 0 and rows[3]["keep"] is True


def test_default_weights_deterministic_and_partition_invariant(spark, corpus):
    a = hashed_linear_scores(corpus, "doc_id", "text").collect()
    b = hashed_linear_scores(corpus.repartition(5), "doc_id", "text").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every doc scored exactly once
    assert len(a) == 3


def test_threshold_shifts_keep_boundary(spark, corpus):
    n_buckets = 1 << 16
    weights = _weights_for(spark, n_buckets, {"good": 100, "spam": -100})
    strict = hashed_linear_scores(
        corpus, "doc_id", "text", weights=weights, n_buckets=n_buckets,
        threshold_fp=1,
    )
    rows = {r["id"]: r["keep"] for r in strict.collect()}
    assert rows == {1: True, 2: False, 3: False}  # tie at 0 now drops
