"""Mojibake repair + unicode cleanup (operators/normalize.py)."""

import duckdb

from finetoo_sp_spark.operators.normalize import (
    MOJIBAKE_TABLE,
    _mojibake,
    normalize_text,
    oracle_sql_chain,
)


def test_repair_table_is_derived_correctly():
    # the classic artifact: one curly apostrophe -> 3 chars via CP1252
    assert _mojibake("’") == "â€™"
    # the right-double-quote artifact carries the raw C1 control 0x9D
    assert _mojibake("”") == "â€\x9d"
    # longest-first ordering so digraphs never shadow trigraphs
    lens = [len(b) for b, _ in MOJIBAKE_TABLE]
    assert lens == sorted(lens, reverse=True)


def test_repair_fold_and_strip(spark):
    rows = [
        (1, "it" + _mojibake("’") + "s caf" + _mojibake("é") + " time"),
        (2, "a b​c"),       # NBSP -> space, zero-width removed
        (3, "plain ascii"),
        (4, "curly “quote”"),  # already-proper curly -> folded
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["id"]: (r["text"], r["changed"]) for r in normalize_text(df, "doc_id", "text").collect()}
    assert got[1] == ("it's café time", True)
    assert got[2] == ("a bc", True)
    assert got[3] == ("plain ascii", False)
    assert got[4] == ('curly "quote"', True)


def test_fold_quotes_off_keeps_proper_typography(spark):
    df = spark.createDataFrame([(1, "a’b")], "doc_id int, text string")
    out = normalize_text(df, "doc_id", "text", fold_quotes=False).collect()[0]
    assert out["text"] == "a’b" and out["changed"] is False


def test_oracle_chain_is_byte_identical(spark):
    texts = [
        "it" + _mojibake("’") + "s caf" + _mojibake("é"),
        "w x​y “z” " + _mojibake("…"),
        "untouched",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    spark_out = {
        r["id"]: r["text"] for r in normalize_text(df, "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{s}')" for i, s in enumerate(texts))
        + ") v(i, text)"
    )
    duck_out = dict(
        con.execute(f"SELECT i, {oracle_sql_chain('text')} FROM t").fetchall()
    )
    assert spark_out == duck_out
