"""TrustRank operator vs an independent pure-Python twin, plus the
spam-demotion property the operator exists for."""

from finetoo_sp_spark.operators.trustrank import (
    DAMP_NUM,
    SCALE,
    trustrank_fixed_point,
)


def _twin(edges, seeds, iterations):
    edges = sorted(set(edges))
    nodes = sorted({u for e in edges for u in e})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base_unit = (100 - DAMP_NUM) * SCALE // 100
    base = {n: (base_unit if n in seeds else 0) for n in nodes}
    trust = {n: (base[n] * 100) // (100 - DAMP_NUM) for n in nodes}
    for _ in range(iterations):
        s = {}
        for u, v in edges:
            s[v] = s.get(v, 0) + trust[u] // deg[u]
        trust = {n: base[n] + (DAMP_NUM * s.get(n, 0)) // 100 for n in nodes}
    return trust


def _run(spark, edges, seeds, iterations):
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in seeds], "id string")
    rows = trustrank_fixed_point(e, s, iterations=iterations).collect()
    return {r["id"]: r["trust_fp"] for r in rows}


def test_trustrank_matches_twin(spark):
    edges = [
        ("good", "a"), ("good", "b"), ("a", "b"), ("b", "a"),
        ("spam1", "spam2"), ("spam2", "spam1"), ("spam1", "a"),
        ("good", "a"),  # duplicate edge collapses
    ]
    seeds = {"good"}
    for it in (1, 5):
        assert _run(spark, edges, seeds, it) == _twin(edges, seeds, it)


def test_trustrank_demotes_spam_farm(spark):
    # A link farm pumping each other's PageRank gets ~zero trust when
    # no seed path reaches it; the seed neighborhood keeps trust.
    edges = (
        [("seed", f"p{i}") for i in range(3)]
        + [(f"p{i}", f"p{(i + 1) % 3}") for i in range(3)]
        + [(f"farm{i}", f"farm{j}") for i in range(4) for j in range(4) if i != j]
    )
    got = _run(spark, edges, {"seed"}, 5)
    assert got == _twin(edges, {"seed"}, 5)
    assert all(got[f"farm{i}"] == 0 for i in range(4))
    assert min(got[f"p{i}"] for i in range(3)) > 0
    # Seeds absent from the graph contribute nothing and don't crash.
    got2 = _run(spark, edges, {"seed", "not-in-graph"}, 2)
    assert got2 == _twin(edges, {"seed"}, 2)
