"""Driver-contract smoke: every queries() entry runs and matches its
DuckDB oracle at sf0.001 (same compare as the driver: row count + sorted
columns + canonical value multiset). The full sf0.01 sweep lives in
tools/verify_contract.py; this keeps the gate inside pytest."""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# cheap-but-representative subset for pytest (full set in tools/verify_contract.py)
SUBSET = [
    "extract_main_text",
    "extract_block_stats",
    "q1_pricing_summary",
    "match_customer",
    "filter_customers",
    "compare_acctbal",
    "traverse_placed",
    "join_placed",
    "group_by_priority",
    "top_k_orders",
    "divergence_parts",
    "session_stats",
    "dedup_exact",
    "token_counts",
    "lang_id",
    "multimodal_metadata",
]


def canon(val):
    if isinstance(val, float):
        return "NaN" if math.isnan(val) else f"{val:.6f}"
    if isinstance(val, bool):
        return str(bool(val)).lower()
    if hasattr(val, "isoformat"):
        try:
            return val.isoformat(sep=" ").replace("+00:00", "")
        except TypeError:
            return val.isoformat() + " 00:00:00"
    if isinstance(val, (bytes, bytearray)):
        return val.hex()
    return str(val)


def sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], sorted(
        "|".join(canon(r[i]) for i in order) for r in rows
    )


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, oracle_con, name):
    from finetoo_sp_spark import contract

    sdf = contract.queries()[name](spark, sf_dir)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = oracle_con.execute(contract.oracle_sql()[name])
    ocols, orows = [d[0] for d in res.description], res.fetchall()
    sn, sv = sig(scols, srows)
    on, ov = sig(ocols, orows)
    assert len(srows) == len(orows)
    assert sn == on
    assert sv == ov


def test_all_queries_have_impl_and_rows_only_flagged():
    from finetoo_sp_spark import contract

    qs, oracles = contract.queries(), contract.oracle_sql()
    assert set(oracles) <= set(qs)
    # round 2: every registered query carries a full DuckDB value oracle
    # (the formerly rows-only ops gained portable-hash / serialized forms)
    assert set(qs) == set(oracles)
    assert "__BLOCK_DIVERGENCE_ORACLE__" not in oracles.values()


def test_entry_smoke(spark):
    import __spark_entry__ as em

    df = em.entry(spark)
    assert df.count() > 0
    assert "url" in df.columns and "text" in df.columns


def test_every_oracle_parses_in_duckdb():
    """EXPLAIN-only parse of all 155 oracle twins against the sf0.001
    views — catches SQL drift in seconds without the full value sweep."""
    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    bad = []
    for name, sql in e.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            bad.append((name, str(ex).splitlines()[0]))
    assert not bad, bad
