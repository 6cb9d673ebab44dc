"""Recrawl planning: hand-pinned decision table."""

from finetoo_sp_spark.operators.recrawl import recrawl_plan


def test_recrawl_decision_table(spark):
    snap = spark.createDataFrame(
        [
            # url, fetched_at, etag, last_modified
            ("u_stale", 100, 'W/"1"', None),      # newer lastmod -> fetch (beats etag)
            ("u_etag", 100, 'W/"2"', "lm-string"),  # etag beats last_modified
            ("u_lm", 100, None, "Mon, 01 Jan 2024 00:00:00"),
            ("u_old", 100, None, None),           # no validators, too old -> fetch
            ("u_young", 950, None, None),         # young enough -> skip
            ("u_oldsig", 100, 'W/"3"', None),     # OLDER lastmod falls through -> revalidate
        ],
        "url string, fetched_at long, etag string, last_modified string",
    )
    lm = spark.createDataFrame(
        [("u_stale", 200), ("u_oldsig", 50)], "url string, lastmod long"
    )
    out = {
        r["url"]: (r["action"], r["cond_header"], r["cond_value"])
        for r in recrawl_plan(snap, lm, now_epoch_s=1000, max_age_s=500).collect()
    }
    assert out["u_stale"] == ("fetch", "", "")
    assert out["u_etag"] == ("revalidate", "if-none-match", 'W/"2"')
    assert out["u_lm"] == ("revalidate", "if-modified-since", "Mon, 01 Jan 2024 00:00:00")
    assert out["u_old"] == ("fetch", "", "")
    assert out["u_young"] == ("skip", "", "")
    assert out["u_oldsig"] == ("revalidate", "if-none-match", 'W/"3"')
