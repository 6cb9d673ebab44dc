"""Compliance-signal extraction (extraction/compliance.py)."""

from finetoo_sp_spark.extraction.compliance import compliance_flags


def test_signal_matrix(spark):
    rows = [
        ("u1", '<html><head><META name="robots" content="NOINDEX, nofollow">'
               '<link rel="license" href="https://cc.org/by/4.0"></head></html>'),
        ("u2", "<html><head><meta name = 'robots' content = 'noimageai'></head></html>"),
        ("u3", '<html><head><meta name="robots" content="index, follow, noai"></head></html>'),
        ("u4", '<html><head><meta name="viewport" content="x"></head></html>'),
        # token-exact: 'noindexing' must NOT read as noindex
        ("u5", '<html><head><meta name="robots" content="noindexing"></head></html>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r["url"]: tuple(r)[1:] for r in compliance_flags(df).collect()}
    assert got == {
        "u1": ("NOINDEX, nofollow", True, True, False, "https://cc.org/by/4.0"),
        "u2": ("noimageai", False, False, True, ""),
        "u3": ("index, follow, noai", False, False, True, ""),
        "u4": ("", False, False, False, ""),
        "u5": ("noindexing", False, False, False, ""),
    }


def test_binary_html_and_gate_composition(spark):
    html = '<head><meta name="robots" content="noai"></head>'
    df = spark.createDataFrame(
        [("u", html.encode("utf-8")), ("v", b"<p>free</p>")],
        "url string, html binary",
    )
    flags = compliance_flags(df)
    kept = flags.filter(~flags.noindex & ~flags.noai).select("url").collect()
    assert [r["url"] for r in kept] == ["v"]
