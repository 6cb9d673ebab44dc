"""Redirect resolution by pointer jumping: hand-built chains/cycles."""

from finetoo_sp_spark.operators.redirects import resolve_redirects


def _run(spark, edges, rounds=6):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["url"]: (r["final_url"], r["hops"], r["is_loop"])
        for r in resolve_redirects(df, max_rounds=rounds).collect()
    }


def test_chains_cycles_and_feeders(spark):
    # 10-hop chain c0->...->c10, a 3-cycle, and a feeder into the cycle.
    edges = [(f"c{i}", f"c{i + 1}") for i in range(10)]
    edges += [("x", "y"), ("y", "z"), ("z", "x"), ("feeder", "x")]
    got = _run(spark, edges)
    for i in range(10):
        assert got[f"c{i}"] == ("c10", 10 - i, False)
    for n in ("x", "y", "z", "feeder"):
        assert got[n] == (None, None, True)
    assert "c10" not in got  # terminals have no row: they're not sources


def test_exact_power_of_two_boundary(spark):
    # max_rounds=2 resolves chains up to 4 hops; a 5-hop chain is
    # (documented) flagged as unresolved/loop at that budget.
    edges = [(f"n{i}", f"n{i + 1}") for i in range(5)]
    got4 = _run(spark, edges, rounds=2)
    assert got4["n1"] == ("n5", 4, False)  # exactly 4 hops: resolved
    assert got4["n0"] == (None, None, True)  # 5 hops: over budget
    got8 = _run(spark, edges, rounds=3)
    assert got8["n0"] == ("n5", 5, False)


def test_self_loop_and_duplicate_edges(spark):
    # A self-redirect is a 1-cycle; duplicate (src, dst) rows collapse
    # (dropDuplicates on src keeps the relation a function).
    edges = [("s", "s"), ("a", "b"), ("a", "b")]
    got = _run(spark, edges)
    assert got["s"] == (None, None, True)
    assert got["a"] == ("b", 1, False)
