"""Hamilton budget apportionment (operators/budget.py)."""

from pyspark.sql import functions as F

from finetoo_sp_spark.operators.budget import allocate_budget


def _alloc(spark, weights, total):
    df = spark.createDataFrame(list(weights.items()), "key string, w long")
    out = allocate_budget(df, "key", "w", total)
    return {r["key"]: r["alloc"] for r in out.collect()}


def test_allocation_is_exact_and_proportional(spark):
    got = _alloc(spark, {"a": 50, "b": 30, "c": 20}, 10)
    assert got == {"a": 5, "b": 3, "c": 2}
    assert sum(got.values()) == 10


def test_largest_remainder_distribution(spark):
    # quotas: a=3.75, b=3.75, c=2.5 for total 10 -> floors 3/3/2,
    # leftover 2 goes to the two largest remainders (a and b tie at .75,
    # both get one; c's .5 misses out)
    got = _alloc(spark, {"a": 3, "b": 3, "c": 2}, 10)
    assert got == {"a": 4, "b": 4, "c": 2}
    assert sum(got.values()) == 10


def test_sum_invariant_under_awkward_weights(spark):
    import random

    rng = random.Random(7)
    weights = {f"k{i}": rng.randrange(1, 1000) for i in range(37)}
    for total in (1, 17, 999, 12345):
        got = _alloc(spark, weights, total)
        assert sum(got.values()) == total
    # zero-weight keys get exactly 0
    got = _alloc(spark, {"a": 0, "b": 10}, 7)
    assert got == {"a": 0, "b": 7}


def test_deterministic_tie_break_and_partition_invariance(spark):
    df = spark.createDataFrame(
        [(f"k{i}", 1) for i in range(9)], "key string, w long"
    )
    a = sorted(allocate_budget(df, "key", "w", 5).collect())
    b = sorted(allocate_budget(df.repartition(4), "key", "w", 5).collect())
    assert a == b
    # equal weights, budget 5 of 9: the 5 lexicographically-first keys win
    winners = {r["key"] for r in a if r["alloc"] == 1}
    assert winners == {f"k{i}" for i in range(5)}
