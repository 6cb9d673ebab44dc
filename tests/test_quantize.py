"""int8 embedding quantization + robots Sitemap discovery fixtures."""

from pyspark.sql import Row

from finetoo_sp_spark.operators.quantize import quantize_int8


def _vecs(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )


def test_codes_and_range(spark):
    # v = [0, 1]: min_fp=0, max_fp=2^20, codes [0, 255]
    out = quantize_int8(_vecs(spark, [[0.0, 1.0]])).collect()[0]
    assert (out["min_fp"], out["max_fp"]) == (0, 1 << 20)
    assert out["q_str"] == "0,255"
    assert out["max_err_fp"] == 0  # endpoints reconstruct exactly


def test_error_bound(spark):
    vecs = [
        [0.1, -0.3, 0.7, 0.25],
        [1.0, 0.5, 0.0, -1.0],
        [0.001, 0.002, 0.003, 0.004],
    ]
    for r in quantize_int8(_vecs(spark, vecs)).collect():
        rng = r["max_err_fp"]
        bound = (r["max_fp"] - r["min_fp"]) // 255 + 1
        assert 0 <= rng <= bound, r


def test_constant_vector(spark):
    out = quantize_int8(_vecs(spark, [[0.5, 0.5, 0.5]])).collect()[0]
    assert out["q_str"] == "0,0,0"
    assert out["max_err_fp"] == 0
    assert out["min_fp"] == out["max_fp"]


def test_partition_invariance(spark):
    import random

    rnd = random.Random(7)
    vecs = [[rnd.uniform(-1, 1) for _ in range(16)] for _ in range(40)]
    df = _vecs(spark, vecs)
    a = sorted(map(tuple, quantize_int8(df.repartition(1)).collect()))
    b = sorted(map(tuple, quantize_int8(df.repartition(7)).collect()))
    assert a == b


def test_narrow_plan(spark):
    df = _vecs(spark, [[0.0, 1.0]])
    plan = quantize_int8(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_robots_sitemap_directives(spark):
    from finetoo_sp_spark.sources.robots import sitemap_directives

    robots = spark.createDataFrame(
        [
            Row(
                host="a",
                robots_txt=(
                    "User-agent: *\n"
                    "Disallow: /x/sitemap.xml\n"  # decoy inside a rule
                    "Sitemap: https://a.example.com/sitemap.xml\n"
                    "User-agent: gptbot\nDisallow: /\n"
                    "SITEMAP:   https://cdn/a/s2.xml\n"  # case + spaces
                ),
            ),
            Row(host="b", robots_txt="User-agent: *\nDisallow: /\n"),
        ]
    )
    rows = sorted(
        (r["host"], r["sitemap_url"]) for r in sitemap_directives(robots).collect()
    )
    assert rows == [
        ("a", "https://a.example.com/sitemap.xml"),
        ("a", "https://cdn/a/s2.xml"),
    ]
