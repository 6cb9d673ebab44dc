"""Exact-substring (duplicated k-token window) dedup — hand-built cases.

The contract queries (dedup_window_stats / dedup_window_removal) prove
oracle agreement on the planted-template corpus; these tests pin the
semantics on corpora small enough to verify by hand, including the
keeper rule and the short-doc edge.
"""

import pytest
from pyspark.sql import Row

from finetoo_sp_spark.operators.substrdedup import (
    remove_duplicate_windows,
    window_dup_stats,
)

K = 4  # small k so hand-built docs stay readable


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_stats_planted_duplicate(spark):
    # docs 0 and 1 share the 4-token run "w x y z"; doc 2 is unique
    df = _docs(
        spark,
        [
            "a b w x y z c d",
            "p q r w x y z",
            "unique words only here nothing shared",
        ],
    )
    out = {
        r["id"]: r
        for r in window_dup_stats(df, k=K, hash_mode="sha").collect()
    }
    # doc 0: 8 tokens -> 5 windows, exactly one duplicated ("w x y z" at 2)
    assert out[0]["n_windows"] == 5
    assert out[0]["n_dup_windows"] == 1
    assert out[0]["dup_tokens"] == K
    assert out[0]["dup_token_ppm"] == K * 1_000_000 // 8
    # doc 1: 7 tokens -> 4 windows, one duplicated (at 3)
    assert out[1]["n_dup_windows"] == 1
    assert out[1]["dup_tokens"] == K
    # doc 2: nothing duplicated
    assert out[2]["n_dup_windows"] == 0
    assert out[2]["dup_tokens"] == 0


def test_stats_overlap_union_not_double_counted(spark):
    # "a b c d e" duplicated in full across both docs: doc sizes 5 and 6.
    # doc 1's windows at starts 0 and 1 are BOTH duplicated and overlap;
    # union coverage is 5 tokens, not 8.
    df = _docs(spark, ["x a b c d e", "a b c d e y"])
    out = {
        r["id"]: r
        for r in window_dup_stats(df, k=K, hash_mode="sha").collect()
    }
    # shared windows: "a b c d" and "b c d e" (each in both docs)
    assert out[0]["n_dup_windows"] == 2
    assert out[0]["dup_tokens"] == 5  # starts 1,2 -> [1,6) = 5 tokens
    assert out[1]["dup_tokens"] == 5  # starts 0,1 -> [0,5)


def test_short_doc_has_no_windows(spark):
    df = _docs(spark, ["one two three", "one two three"])  # 3 < k
    out = window_dup_stats(df, k=K, hash_mode="sha").collect()
    assert all(r["n_windows"] == 0 and r["dup_tokens"] == 0 for r in out)
    # removal must preserve short docs verbatim (normalized)
    rem = {r["id"]: r for r in remove_duplicate_windows(df, k=K, hash_mode="sha").collect()}
    assert rem[0]["clean_text"] == "one two three"
    assert rem[0]["n_removed_tokens"] == 0


def test_removal_keeps_canonical_occurrence(spark):
    # identical docs: keeper = min (doc_id, start) -> doc 0 keeps its
    # text, doc 1 loses every token (all its windows are non-keeper)
    df = _docs(spark, ["a b c d e f", "a b c d e f"])
    rem = {
        r["id"]: r
        for r in remove_duplicate_windows(df, k=K, hash_mode="sha").collect()
    }
    assert rem[0]["clean_text"] == "a b c d e f"
    assert rem[0]["n_removed_tokens"] == 0
    assert rem[1]["clean_text"] == ""
    assert rem[1]["n_removed_tokens"] == 6


def test_removal_surviving_context(spark):
    # duplicated middle run, unique prefix/suffix survive in order
    df = _docs(spark, ["pre1 pre2 w x y z post1", "w x y z"])
    rem = {
        r["id"]: r
        for r in remove_duplicate_windows(df, k=K, hash_mode="sha").collect()
    }
    # doc 0 is the keeper (min doc_id): untouched
    assert rem[0]["clean_text"] == "pre1 pre2 w x y z post1"
    assert rem[1]["clean_text"] == ""


def test_normalization_matches_dedup_family(spark):
    # mixed case + whitespace runs canonicalize before windowing, so
    # "A  b C" and "a b c" share windows
    df = _docs(spark, ["A  b C d", "a b c d"])
    out = window_dup_stats(df, k=K, hash_mode="sha").collect()
    assert all(r["n_dup_windows"] == 1 for r in out)


@pytest.mark.parametrize("hash_mode", ["sha", "xxhash64"])
def test_hash_modes_agree_on_counts(spark, hash_mode):
    df = _docs(spark, ["a b c d e", "z a b c d e", "q r s t"])
    out = {
        r["id"]: r["n_dup_windows"]
        for r in window_dup_stats(df, k=K, hash_mode=hash_mode).collect()
    }
    assert out == {0: 2, 1: 2, 2: 0}
