"""Registrable-domain (eTLD+1) extraction under Public-Suffix-List rules.

Hosts are the wrong grouping key for per-site logic: blog.example.co.uk
and www.example.co.uk are one site, and naive "last two labels" yields
co.uk — a public suffix shared by millions of sites. Every production
web pipeline (and the reference point for dedup host-caps, mirror
detection, per-site quotas, PageRank host graphs) groups by the
REGISTRABLE domain: one label more than the longest matching public
suffix. The publicsuffix.org algorithm implemented here, from the
public spec: plain rules match their exact labels, wildcard rules
(``*.ck``) match one extra leading label, exception rules (``!www.ck``)
override everything and shorten the suffix by one label; with no match
the last label is the suffix (the implicit ``*`` rule); a host that IS
a public suffix has no registrable domain (NULL).

Spark shape: the rule list is a broadcast dimension (the real PSL is
~9k rules — trivially broadcastable at any corpus size); hosts explode
into their dot-suffix candidates (bounded by label count), match by two
equi-joins (exact key for plain/exception rules, parent key for
wildcards), and an integer priority aggregate (exception beats length,
length beats the rest) picks the prevailing rule per host. No UDF, no
skew (candidates key on distinct suffix strings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rule_rows(rules: list[str]) -> list[tuple[str, str, int, bool]]:
    """(join_key, match_on, ps_labels, is_exception) per PSL rule."""
    rows = []
    for r in rules:
        r = r.strip().lower()
        if not r:
            continue
        if r.startswith("!"):
            body = r[1:]
            rows.append((body, "cand", body.count(".") + 1 - 1, True))
        elif r.startswith("*."):
            body = r[2:]
            rows.append((body, "parent", body.count(".") + 1 + 1, False))
        else:
            rows.append((r, "cand", r.count(".") + 1, False))
    return rows


def registrable_domain(
    df: DataFrame, host_col: str, rules: list[str]
) -> DataFrame:
    """(host, public_suffix, registrable_domain) per input row.

    ``rules`` is the public-suffix list (plain / ``*.`` wildcard /
    ``!`` exception entries). registrable_domain is NULL when the host
    itself is a public suffix (nothing was registered under it).
    """
    spark = df.sparkSession
    rule_df = spark.createDataFrame(
        _rule_rows(rules), "key string, match_on string, ps_labels int, is_exc boolean"
    )
    hosts = df.select(F.lower(F.col(host_col)).alias("host")).distinct()
    labs = F.split(F.col("host"), r"\.")
    nlab = F.size(labs)
    cands = hosts.select(
        "host",
        nlab.alias("nlab"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), nlab),
                lambda k: F.array_join(F.slice(labs, k, nlab), "."),
            )
        ).alias("cand"),
    ).select(
        "host",
        "nlab",
        "cand",
        # parent = candidate minus its first label ('' for single labels)
        F.when(
            F.instr("cand", ".") > 0,
            F.expr("substring(cand, instr(cand, '.') + 1)"),
        ).otherwise(F.lit("")).alias("cand_parent"),
    )
    r = F.broadcast(rule_df)
    m_exact = cands.join(
        r.filter(F.col("match_on") == "cand"), F.col("cand") == F.col("key")
    )
    m_wild = cands.join(
        r.filter(F.col("match_on") == "parent"),
        F.col("cand_parent") == F.col("key"),
    )
    matched = m_exact.unionByName(m_wild).select(
        "host",
        "nlab",
        # exception beats length, length beats the rest; ps_labels < 100
        (F.when(F.col("is_exc"), F.lit(100)).otherwise(F.lit(0)) + F.col("ps_labels")).alias("prio"),
    )
    best = matched.groupBy("host", "nlab").agg(F.max("prio").alias("prio"))
    resolved = (
        hosts.select("host", nlab.alias("nlab"))
        .join(best, ["host", "nlab"], "left")
        .select(
            "host",
            "nlab",
            F.coalesce(
                F.when(F.col("prio") >= 100, F.col("prio") - 100).otherwise(F.col("prio")),
                F.lit(1),  # implicit '*' rule: the bare TLD
            ).alias("ps_labels"),
        )
    )
    ps = F.expr("substring_index(host, '.', -ps_labels)")
    reg = F.when(
        F.col("nlab") > F.col("ps_labels"),
        F.expr("substring_index(host, '.', -(ps_labels + 1))"),
    )
    out = resolved.select(
        F.col("host").alias("_psl_host"),
        ps.alias("public_suffix"),
        reg.alias("registrable_domain"),
    )
    # preserve every input column (so the op composes into rollups);
    # the dimension out is host-distinct, so this never duplicates rows
    return (
        df.withColumn("_psl_host", F.lower(F.col(host_col)))
        .join(out, "_psl_host")
        .drop("_psl_host")
    )
