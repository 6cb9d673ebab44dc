"""BPE apply kernel (hand-pinned merge semantics) + corpus_report
composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from finetoo_sp_spark.operators.report import corpus_report
from finetoo_sp_spark.operators.tokenize import (
    DEFAULT_MERGES,
    bpe_token_counts,
    encode_word,
)


def _ranks(merges):
    return {p: i for i, p in enumerate(merges)}


def test_encode_word_hand_pinned():
    r = _ranks(DEFAULT_MERGES)
    assert encode_word("ab", r) == ["ab"]
    assert encode_word("abab", r) == ["abab"]
    # ceil(3/2): left-to-right pairing leaves the odd trailing 'ab'
    assert encode_word("ababab", r) == ["abab", "ab"]
    assert encode_word("cde", r) == ["cde"]
    assert encode_word("cdecde", r) == ["cde", "cde"]
    assert encode_word("xyz", r) == ["x", "y", "z"]
    assert encode_word("", r) == []


def test_encode_word_rank_priority_and_overlap():
    # lowest rank wins even when a later-rank pair appears first
    r = _ranks([("b", "c"), ("a", "b")])
    assert encode_word("abc", r) == ["a", "bc"]
    # overlapping occurrences merge left-to-right: aaa -> [aa, a]
    r2 = _ranks([("a", "a")])
    assert encode_word("aaa", r2) == ["aa", "a"]
    assert encode_word("aaaa", r2) == ["aa", "aa"]


def test_bpe_token_counts_distributed(spark):
    df = spark.createDataFrame(
        [(1, "abab cde xyz"), (2, "ab ab ab"), (3, "ababab cdecde")],
        "doc_id long, text string",
    )
    out = {r.id: (r.n_words, r.n_tokens) for r in bpe_token_counts(df, "doc_id", "text").collect()}
    assert out == {1: (3, 1 + 1 + 3), 2: (3, 3), 3: (2, 2 + 2)}


def test_bpe_vocab_collapse_plan(spark):
    """The kernel runs over the DISTINCT word set and joins back
    broadcast — the corpus never reaches Python."""
    df = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    plan = (
        bpe_token_counts(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan and "BroadcastHashJoin" in plan


def test_corpus_report_values(spark):
    long_doc = " ".join(f"w{i}ord" for i in range(120))
    short_doc = "too short"
    rows = [(i, long_doc if i % 2 == 0 else short_doc, "s0") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = corpus_report(df, "doc_id", "text", "source").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 10 and r.n_keep == 5 and r.kept_frac_ppm == 500000
    assert r.total_kept_words == 5 * 120
    # all kept docs have 120 words: p50 = p90 = the bucket lower bound
    # for 120 (octave base 64, sub (120-64)*16//64 = 14 -> lo 64+56 = 120)
    assert r.p50_words == 120 and r.p90_words == 120
