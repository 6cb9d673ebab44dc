"""Public-suffix-list registrable-domain extraction: hand-derived
verdicts straight from the publicsuffix.org algorithm spec."""

from finetoo_sp_spark.operators.psl import registrable_domain

RULES = ["com", "co.uk", "uk", "*.ck", "!www.ck"]

# host -> (public_suffix, registrable_domain)
HAND_CASES = {
    "blog.example.co.uk": ("co.uk", "example.co.uk"),  # longest rule wins over 'uk'
    "example.com": ("com", "example.com"),
    "www.example.com": ("com", "example.com"),
    "deep.a.b.example.com": ("com", "example.com"),
    "foo.nom.ck": ("nom.ck", "foo.nom.ck"),  # wildcard *.ck
    "www.ck": ("ck", "www.ck"),  # exception !www.ck beats the wildcard
    "nom.ck": ("nom.ck", None),  # a public suffix itself: nothing registered
    "co.uk": ("co.uk", None),
    "bare": ("bare", None),  # implicit '*' rule: bare TLD
    "example.co.uk": ("co.uk", "example.co.uk"),
    "MiXeD.ExAmPlE.CoM": ("com", "example.com"),  # case folding
}


def test_registrable_domain_hand_cases(spark):
    df = spark.createDataFrame([(h,) for h in HAND_CASES], ["host"])
    out = {
        r["host"]: (r["public_suffix"], r["registrable_domain"])
        for r in registrable_domain(df, "host", RULES).collect()
    }
    for h, exp in HAND_CASES.items():
        # input columns are preserved as-is; matching is case-folded
        assert out[h] == exp, (h, out[h], exp)


def test_registrable_domain_preserves_input_multiplicity(spark):
    df = spark.createDataFrame(
        [("a.example.com",), ("a.example.com",), ("b.example.com",)], ["host"]
    )
    out = registrable_domain(df, "host", RULES)
    assert out.count() == 3  # one output row per input row
