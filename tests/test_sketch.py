"""Cardinality sketches: merge laws (the distributed-combine proof),
partition invariance, exact-branch behavior, and estimate accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from finetoo_sp_spark.operators.sketch import (
    hll_estimate_py,
    hll_registers,
    kmv_distinct,
)


def _keys(spark, lo, hi, grp="g"):
    return spark.range(lo, hi).select(
        F.lit(grp).alias("grp"), F.concat(F.lit("key-"), F.col("id")).alias("k")
    )


def test_hll_merge_is_elementwise_max(spark):
    """registers(A UNION B) == per-bucket max(registers(A), registers(B))
    — the associative combine that lets 1000 executors sketch shards
    independently and merge driver-side (or in a reduce)."""
    a = _keys(spark, 0, 3000)
    b = _keys(spark, 2000, 6000)  # overlapping
    whole = hll_registers(a.union(b), "k", "grp", p=8)
    ra = hll_registers(a, "k", "grp", p=8)
    rb = hll_registers(b, "k", "grp", p=8)
    merged = (
        ra.union(rb)
        .groupBy("grp", "bucket")
        .agg(F.max("register").alias("register"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_hll_estimate_accuracy_and_partition_invariance(spark):
    n = 10000
    df = _keys(spark, 0, n)
    regs = hll_registers(df, "k", "grp", p=12).collect()
    est = hll_estimate_py([(r.bucket, r.register) for r in regs], p=12)
    assert abs(est - n) / n < 0.06, est
    regs2 = hll_registers(df.repartition(13), "k", "grp", p=12).collect()
    assert sorted(map(tuple, regs)) == sorted(map(tuple, regs2))


def test_hll_duplicates_are_idempotent(spark):
    once = hll_registers(_keys(spark, 0, 500), "k", "grp", p=8)
    thrice = hll_registers(
        _keys(spark, 0, 500).union(_keys(spark, 0, 500)).union(_keys(spark, 0, 500)),
        "k",
        "grp",
        p=8,
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, thrice.collect()))


def test_kmv_exact_below_k(spark):
    out = kmv_distinct(_keys(spark, 0, 40), "k", "grp", k=64).collect()
    assert len(out) == 1 and out[0].n_kept == 40 and out[0].est_distinct == 40


def test_kmv_estimate_accuracy(spark):
    n = 5000
    out = kmv_distinct(_keys(spark, 0, n), "k", "grp", k=256).collect()[0]
    assert out.n_kept == 256
    assert abs(out.est_distinct - n) / n < 0.25, out.est_distinct


def test_kmv_merge_by_union_and_recut(spark):
    """Union the two kept sets and re-cut to k: equals the sketch of the
    union — the distributed combine for KMV."""
    a = _keys(spark, 0, 3000)
    b = _keys(spark, 2000, 6000)
    k = 128
    whole = kmv_distinct(a.union(b), "k", "grp", k=k).collect()[0]
    # simulate the combine from each side's kept hashes
    from finetoo_sp_spark.operators.dedup import sha60

    kept = lambda df: [  # noqa: E731
        r.h
        for r in df.select(sha60("k").alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
        .collect()
    ]
    union_kept = sorted(set(kept(a)) | set(kept(b)))[:k]
    assert whole.n_kept == k and whole.kth_hash == union_kept[-1]


def test_kmv_groups_are_independent(spark):
    df = _keys(spark, 0, 100, "g1").union(_keys(spark, 0, 30, "g2"))
    rows = {r.grp: r for r in kmv_distinct(df, "k", "grp", k=64).collect()}
    assert rows["g2"].est_distinct == 30 and rows["g1"].n_kept == 64
