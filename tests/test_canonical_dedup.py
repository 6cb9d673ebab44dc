"""Canonical-cluster dedup: hand-built election cases."""

from finetoo_sp_spark.operators.dedup import canonical_dedup


def _run(spark, rows):
    df = spark.createDataFrame(rows, "url string, canonical_url string")
    out = canonical_dedup(df)
    return {
        r["url"]: (r["cluster_url"], r["cluster_size"], r["is_survivor"])
        for r in out.collect()
    }


def test_self_canonical_wins_cluster(spark):
    rows = [
        ("https://www.a/x", "https://www.a/x"),  # declared target, crawled
        ("https://m.a/x", "https://www.a/x"),
        ("https://amp.a/x", "https://www.a/x"),
    ]
    got = _run(spark, rows)
    assert got["https://www.a/x"] == ("https://www.a/x", 3, True)
    assert got["https://m.a/x"][2] is False
    assert got["https://amp.a/x"][2] is False


def test_external_target_falls_back_to_min(spark):
    # Both variants declare a canonical that was never crawled: the
    # lexicographic minimum survives deterministically.
    rows = [
        ("https://m.b/y", "https://www.b/y"),
        ("https://amp.b/y", "https://www.b/y"),
    ]
    got = _run(spark, rows)
    assert got["https://amp.b/y"] == ("https://www.b/y", 2, True)
    assert got["https://m.b/y"] == ("https://www.b/y", 2, False)


def test_no_declaration_is_own_cluster(spark):
    rows = [("https://c/z", None), ("https://c/w", None)]
    got = _run(spark, rows)
    assert got["https://c/z"] == ("https://c/z", 1, True)
    assert got["https://c/w"] == ("https://c/w", 1, True)


def test_anchor_rel_links_edge_cases(spark):
    from finetoo_sp_spark.extraction.meta import anchor_rel_links

    html = (
        '<a href="https://t/1">a</a>'
        '<A REL="NOFOLLOW" HREF="https://t/2">b</A>'
        '<a href="https://t/3" rel="noopener noreferrer">c</a>'
        '<a rel="ugc" href="https://t/4">d</a>'
        "<a name=anchor-no-href>e</a>"
    ).encode()
    df = spark.createDataFrame([("u1", html)], "url string, html binary")
    rows = {r["idx"]: r for r in anchor_rel_links(df).collect()}
    assert len(rows) == 4  # href-less anchor dropped
    assert rows[0]["is_nofollow"] is False
    assert rows[1]["is_nofollow"] is True  # case-insensitive
    assert rows[2]["is_nofollow"] is False  # noopener/noreferrer don't flag
    assert rows[3]["is_nofollow"] is True  # ugc counts


def test_soft404_long_article_mentioning_phrase_is_clean(spark):
    from finetoo_sp_spark.extraction.soft404 import soft404_flags

    long_body = ("how to build a custom page not found handler " * 12).strip()
    rows = [
        ("u1", "guide", "h", long_body, len(long_body)),       # long: clean
        ("u2", "guide", "h", "page not found here sadly", 25),  # thin: flags
        ("u3", "Error 404", "h", "x" * 300, 300),               # title wins
        ("u4", "ok", "404 Not Found", "y" * 300, 300),          # h1 fires
        ("u5", "ok", None, "fine text", 9),                     # null-safe
    ]
    df = spark.createDataFrame(
        rows, "url string, title string, h1 string, text string, content_chars long"
    )
    got = {r["url"]: (r["is_soft404"], r["reason"]) for r in soft404_flags(df).collect()}
    assert got["u1"] == (False, "ok")
    assert got["u2"] == (True, "body")
    assert got["u3"] == (True, "title")
    assert got["u4"] == (True, "h1")
    assert got["u5"] == (False, "ok")
