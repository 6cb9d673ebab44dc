"""Contract queries: exact / MinHash / SimHash / line-level / embedding dedup.

Split from the round-3 contract.py monolith (VERDICT r03 item 7);
every query keeps its original name, Spark plan, and DuckDB twin.
"""

from __future__ import annotations

from finetoo_sp_spark.contract._core import (
    Callable,
    DataFrame,
    SparkSession,
    F,
    documents_to_pages,
    extract_pages,
    dd,
    sim,
    ts,
    ev,
    PropertyGraphFrames,
    op_aggregate,
    op_compare,
    op_filter,
    op_group_by,
    op_join,
    op_match,
    op_project,
    op_traverse,
    PropertyMeta,
    Schema,
    T,
    tpch_schema,
    tpch_graph,
    _CUSTOMER_COLS,
    _ORDERS_COLS,
    _WORDS_SQL,
    _STOP_ALL,
    _docpages_expected_sql,
    _REGISTRY,
    _q,
    _EXTRACT_ORACLE,
    _extracted_blocks_named,
    _shingle_ctes,
    _jaccard_sql,
    _JACCARD_ORACLE,
    _H60,
    _minhash_oracle,
    _simhash_oracle,
    _INCR_CORPUS_SQL,
    _TEMPLATE_CORPUS_SQL,
    _template_heavy_corpus,
    _COSINE_SQL,
    _BUCKET_SQL,
    _STOP_LIST_SQL,
    _LANG_COUNTS_SQL,
    _SLICE_BUCKET_SQL,
    _multiprobe_oracle,
    _recall_curve_oracle,
    _REP_WORDS_SQL,
    _ngram_cte,
    _BENCH_WORDS_SQL,
    _assets,
    _u32_le_sql,
    _FEATURES_U32_SQL,
    _SANITIZE_SQL,
    _tmp_out,
    _blocks_cte,
    _snapshot_b,
    _CURATION_MAX_DF,
    _CURATION_JACCARD,
    _pagerank_oracle,
    _SHA60_ID,
    _KMEANS_CTE,
    _curation_v2_oracle,
    _BM25_TERMS,
    _BM25_TERMS_SQL,
)




# --- dedup family ---------------------------------------------------------


@_q(
    "dedup_exact",
    """
SELECT sha256(text) AS content_sha, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY sha256(text)""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup(T(spark, sf_dir, "documents"), "doc_id", "text")


@_q("dedup_ngram_jaccard", _JACCARD_ORACLE)
def q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return dd.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.05)


@_q(
    "dedup_clusters",
    f"""
WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(u, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT reach.u, sym.v FROM reach JOIN sym ON reach.r = sym.u
)
SELECT u AS id, min(r) AS component FROM reach GROUP BY u""",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> transitive clusters via distributed min-label
    propagation with pointer jumping (operators/components.py). The
    oracle computes the same closure with a recursive CTE."""
    from finetoo_sp_spark.operators.components import connected_components

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    pairs = dd.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.05)
    return connected_components(pairs)


@_q("dedup_minhash_lsh", _minhash_oracle("doc_id < 150", k=32, bands=8, threshold=0.12))
def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sub-quadratic text-dedup path under a FULL value oracle:
    hash_mode='sha' swaps xxhash64 for the sha256-derived 60-bit base
    hash so DuckDB reproduces signatures, banding, candidates and the
    verified Jaccard exactly. Production keeps hash_mode='xxhash64'
    (same plan shape, faster hash)."""
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return dd.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, k=32, bands=8, threshold=0.12, hash_mode="sha"
    )


@_q(
    "dedup_incremental",
    "SELECT id_b AS id_new, id_a AS id_old, jaccard FROM ("
    + _minhash_oracle(
        "TRUE", k=32, bands=8, threshold=0.5, src="corpus", prelude=_INCR_CORPUS_SQL
    )
    + ") WHERE id_a < 100000 AND id_b >= 100000",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash dedup: a new crawl batch checked against the
    existing corpus WITHOUT regenerating old-vs-old pairs — the
    per-snapshot workflow at 10^12 existing docs.  The oracle is the
    full combined-corpus self-join restricted to cross pairs, so it
    proves the bipartite plan finds exactly the pairs the (much more
    expensive) self-join would."""
    docs = T(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 100).select("doc_id", "text")
    upd = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" update")).alias("text"),
    )
    fresh = docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 200)).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return dd.minhash_lsh_pairs_between(
        old, upd.unionByName(fresh), "doc_id", "text",
        n=3, k=32, bands=8, threshold=0.5, hash_mode="sha",
    )


@_q("dedup_simhash", _simhash_oracle(max_hamming=3))
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded near-dup under a FULL value oracle (60-bit 'sha'
    fingerprint mode; production uses the 64-bit xxhash64 mode)."""
    return dd.simhash_pairs(
        T(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3, hash_mode="sha"
    )


@_q(
    "dedup_minhash_salted",
    _minhash_oracle(
        "TRUE", k=32, bands=8, threshold=0.12, src="corpus", prelude=_TEMPLATE_CORPUS_SQL
    ),
)
def q_minhash_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH with the hot-bucket defense ENGAGED (bucket_cap=16 on
    a template-flooded corpus): every band bucket of the injected copies
    holds 60 rows > cap, so the candidate join runs through the
    triangular-cell salt split. Oracle = the same banding/verify SQL
    with no salting — output identity is the check."""
    corpus = _template_heavy_corpus(spark, sf_dir)
    return dd.minhash_lsh_pairs(
        corpus, "doc_id", "text", n=3, k=32, bands=8, threshold=0.12,
        bucket_cap=16, hash_mode="sha",
    )


@_q(
    "dedup_simhash_salted",
    _simhash_oracle(max_hamming=3, src="corpus", prelude=_TEMPLATE_CORPUS_SQL),
)
def q_simhash_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banding with the hot-bucket defense ENGAGED (bucket_cap=16,
    template-flooded corpus; payload-carrying variant of the triangular
    split — fingerprints travel through the salt cells). Oracle is the
    uncapped banding SQL: output identity proves the split drops and
    duplicates nothing."""
    corpus = _template_heavy_corpus(spark, sf_dir)
    return dd.simhash_pairs(
        corpus, "doc_id", "text", max_hamming=3, bucket_cap=16, hash_mode="sha"
    )


@_q(
    "dedup_embedding_cosine",
    f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COSINE_SQL} AS cosine
FROM embeddings a JOIN embeddings b
  ON a.vec_id < b.vec_id
 AND {_BUCKET_SQL.format(side='a')} = {_BUCKET_SQL.format(side='b')}
WHERE {_COSINE_SQL} >= 0.4""",
)
def q_emb_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered 100 TB path: sign-LSH bucket join + in-bucket exact
    cosine (no crossJoin in the plan). The all-pairs form
    (dd.embedding_near_dup_pairs) stays a test-only small-SF oracle
    (tests/test_dedup_similarity.py)."""
    return dd.embedding_near_dup_pairs_bucketed(
        T(spark, sf_dir, "embeddings"), threshold=0.4, n_bits=8
    )


@_q(
    "contamination_flags",
    f"""
WITH {_ngram_cte('bsh', 'doc_id AS id', _BENCH_WORDS_SQL, 13).format(where='WHERE doc_id % 50 = 0')},
{_ngram_cte('dsh', 'doc_id AS id', _WORDS_SQL, 13).format(where='')},
hits AS (
  SELECT d.id, count(*) AS n FROM dsh d
  JOIN (SELECT DISTINCT shingle FROM bsh) b USING (shingle)
  GROUP BY d.id
)
SELECT doc_id AS id, CAST(coalesce(n, 0) AS BIGINT) AS n_hits,
  coalesce(n, 0) > 0 AS contaminated
FROM documents LEFT JOIN hits ON hits.id = documents.doc_id""",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix-C protocol: 13-gram
    overlap with the eval set). The 'benchmark' is the 200-char prefix
    of every 50th document, so the flagged set is non-trivial (the
    source docs themselves plus any near-dups) and the expected flags
    are independently recomputable."""
    docs = T(spark, sf_dir, "documents")
    benchmarks = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.substring("text", 1, 200).alias("btext"),
    )
    return dd.contamination_flags(
        docs, benchmarks, "doc_id", "text", "bench_id", "btext", n=13
    )


@_q(
    "dedup_lines_c4",
    """
WITH corpus AS (
  SELECT doc_id,
    'SHARED FOOTER NAVIGATION' || chr(10) || text || chr(10)
      || 'cookie banner variant ' || CAST(doc_id % 3 AS VARCHAR) AS text
  FROM documents
), s AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus
), l AS (
  SELECT doc_id, i AS pos, ls[CAST(i AS BIGINT)] AS ln
  FROM s, UNNEST(generate_series(1, len(ls))) t(i)
), counts AS (
  SELECT ln, count(*) AS c FROM l GROUP BY ln
), kept AS (
  SELECT doc_id, pos, ln FROM l JOIN counts USING (ln) WHERE c <= 2
)
SELECT doc_id, array_to_string(list(ln ORDER BY pos), chr(10)) AS text
FROM kept GROUP BY doc_id""",
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level dedup (the boilerplate killer document-level
    dedup can't touch): a shared footer line and three cookie-banner
    variants are injected into every document; lines occurring more than
    twice corpus-wide must vanish from every doc while each document's
    own text lines survive in order. Documents whose every line is
    boilerplate would drop entirely (none here — each body is unique or
    near-unique)."""
    docs = T(spark, sf_dir, "documents")
    corpus = docs.select(
        "doc_id",
        F.concat(
            F.lit("SHARED FOOTER NAVIGATION\n"),
            F.col("text"),
            F.lit("\ncookie banner variant "),
            (F.col("doc_id") % 3).cast("string"),
        ).alias("text"),
    )
    out = dd.line_dedup(corpus, "doc_id", "text", max_line_df=2)
    return out.select(F.col("id").alias("doc_id"), "text")


@_q(
    "semdedup_survivors",
    f"""
WITH {_KMEANS_CTE},
pairs AS (
  SELECT b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b
    ON a.vec_id < b.vec_id
   AND {_BUCKET_SQL.format(side='a')} = {_BUCKET_SQL.format(side='b')}
  JOIN a2 ca ON ca.vec_id = a.vec_id
  JOIN a2 cb ON cb.vec_id = b.vec_id AND cb.cluster = ca.cluster
  WHERE {_COSINE_SQL} >= 0.4
)
SELECT a2.vec_id AS id, a2.cluster FROM a2
WHERE a2.vec_id NOT IN (SELECT id_b FROM pairs)""",
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540): k-means the embedding space, then
    drop the larger id of every cosine-near-duplicate pair found WITHIN
    (cluster, sign-LSH bucket). The pair join never leaves a cluster —
    candidate sets shrink with both k and n_bits, so the 100 TB plan is
    a bucket equi-join + anti-join, no cross join."""
    from finetoo_sp_spark.operators import clustering as cl

    return cl.semdedup_survivors(
        T(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        k=4,
        iters=2,
        threshold=0.4,
        n_bits=8,
    )


@_q(
    "mirror_hosts",
    """
WITH d AS (
  SELECT source AS host,
    CASE WHEN doc_id % 7 = 0
      THEN 'mirrored content ' || CAST(doc_id // 40 AS VARCHAR)
      ELSE text END AS tx
  FROM documents
),
hs AS (SELECT DISTINCT host, sha256(tx) AS sha FROM d),
deg AS (SELECT sha FROM hs GROUP BY sha HAVING count(*) <= 50),
p AS (SELECT hs.sha, hs.host FROM hs JOIN deg USING (sha))
SELECT a.host AS host_a, b.host AS host_b, count(*) AS n_shared
FROM p a JOIN p b ON a.sha = b.sha AND a.host < b.host
GROUP BY 1, 2""",
)
def q_mirror_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-site detection: every 7th document's text is replaced by a
    shared template keyed by doc_id div 40, planting cross-source
    byte-identical mirrors; mirror_hosts recovers the (host_a, host_b)
    pairs and shared-doc counts, max-df-pruned on the sha side so
    template noise can't go quadratic. Oracle relational."""
    from finetoo_sp_spark.operators.dedup import mirror_hosts

    d = T(spark, sf_dir, "documents")
    tx = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit("mirrored content "), F.expr("doc_id div 40").cast("string")),
    ).otherwise(F.col("text"))
    docs = d.select(F.col("source").alias("host"), "doc_id", tx.alias("text"))
    return mirror_hosts(docs, "host", "doc_id", "text", min_shared=1)


@_q(
    "edit_verify",
    """
WITH p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.text AS ta, b.text AS tb
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
)
SELECT id_a, id_b,
  CAST(levenshtein(ta, tb) AS INT) AS lev,
  (CAST(levenshtein(ta, tb) AS BIGINT) * 10000)
    // greatest(length(ta), length(tb)) AS ratio_fp,
  (CAST(levenshtein(ta, tb) AS BIGINT) * 10000)
    // greatest(length(ta), length(tb)) <= 2000 AS is_dup
FROM p""",
)
def q_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance confirm step over candidate pairs (here:
    adjacent doc ids as a deterministic stand-in for LSH candidates):
    JVM-side Levenshtein, integer fixed-point similarity ratio, is_dup
    gate. Pairs broadcast so the corpus side never shuffles."""
    from finetoo_sp_spark.operators.dedup import edit_verify_pairs

    d = T(spark, sf_dir, "documents")
    pairs = d.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    return edit_verify_pairs(
        d, pairs, "doc_id", "text", max_ratio_fp=2000, broadcast_pairs=True
    )


# --- exact-substring (k-token window) dedup: Lee et al. 2022 shape ------

_WIN_CORPUS_SQL = """tmpl AS (SELECT text FROM documents WHERE doc_id = 0),
corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT 200000 + i, t.text || ' copy marker ' || CAST(i % 2 AS VARCHAR)
  FROM tmpl t, UNNEST(generate_series(0, 19)) AS g(i)
)"""

_WIN_CORPUS_WORDS = _WORDS_SQL  # same canonicalization as every dedup path

_WINS_SQL = f"""w AS (
  SELECT doc_id, {_WIN_CORPUS_WORDS} AS ws FROM corpus
), wins AS (
  SELECT doc_id, i AS start,
    {_H60.format(x="array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + 8 AS BIGINT)], ' ')")} AS wh
  FROM w, UNNEST(generate_series(0, len(ws) - 8)) AS t(i)
  WHERE len(ws) >= 8
)"""


def _win_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _WIN_CORPUS_SQL: 200 base docs + 20 template copies
    of doc 0 (guaranteed cross-doc duplicated 8-token windows)."""
    docs = T(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 200).select("doc_id", "text")
    tmpl = docs.filter(F.col("doc_id") == 0).select(F.col("text").alias("_t"))
    copies = (
        spark.range(20)
        .crossJoin(F.broadcast(tmpl))  # broadcast-scalar: one template row
        .select(
            (F.lit(200000) + F.col("id")).alias("doc_id"),
            F.concat(
                "_t", F.lit(" copy marker "), (F.col("id") % 2).cast("string")
            ).alias("text"),
        )
    )
    return base.unionByName(copies)


@_q(
    "dedup_window_stats",
    f"""
WITH {_WIN_CORPUS_SQL}, {_WINS_SQL},
occ AS (SELECT wh FROM wins GROUP BY wh HAVING count(*) >= 2),
dup AS (SELECT wins.* FROM wins JOIN occ USING (wh)),
cov AS (
  SELECT doc_id, SUM(LEAST(8, COALESCE(nxt - start, 8))) AS dup_tokens
  FROM (SELECT doc_id, start,
          LEAD(start) OVER (PARTITION BY doc_id ORDER BY start) AS nxt
        FROM dup)
  GROUP BY doc_id
),
nw AS (SELECT doc_id, count(*) AS n_windows FROM wins GROUP BY doc_id),
nd AS (SELECT doc_id, count(*) AS n_dup_windows FROM dup GROUP BY doc_id)
SELECT w.doc_id AS id, CAST(len(w.ws) AS BIGINT) AS n_tokens,
  COALESCE(n_windows, 0) AS n_windows,
  COALESCE(n_dup_windows, 0) AS n_dup_windows,
  COALESCE(dup_tokens, 0) AS dup_tokens,
  COALESCE(dup_tokens, 0) * 1000000 // len(w.ws) AS dup_token_ppm
FROM w
LEFT JOIN nw USING (doc_id) LEFT JOIN nd USING (doc_id)
LEFT JOIN cov USING (doc_id)""",
)
def q_dedup_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup pre-pass (Lee et al. 2022, arXiv:2107.06499,
    re-expressed as window-hash groupBy): per-doc counts of duplicated
    8-token windows plus exact interval-union duplicated-token coverage,
    over a corpus with 20 planted template copies. One uniform-key
    groupBy + one hash equi-join; coverage union is a per-doc lead()
    window, never a global sort. Oracle recomputes every window hash."""
    from finetoo_sp_spark.operators.substrdedup import window_dup_stats

    return window_dup_stats(
        _win_corpus(spark, sf_dir), "doc_id", "text", k=8, hash_mode="sha"
    )


@_q(
    "dedup_window_removal",
    f"""
WITH {_WIN_CORPUS_SQL}, {_WINS_SQL},
marked AS (
  SELECT doc_id, start,
    ROW_NUMBER() OVER (PARTITION BY wh ORDER BY doc_id, start) AS rn,
    COUNT(*) OVER (PARTITION BY wh) AS n_occ
  FROM wins
),
removed AS (SELECT doc_id, start FROM marked WHERE n_occ >= 2 AND rn > 1),
covered AS (
  SELECT DISTINCT doc_id, start + j AS pos
  FROM removed, UNNEST(generate_series(0, 7)) AS g(j)
),
tok AS (
  SELECT doc_id, i - 1 AS pos, ws[CAST(i AS BIGINT)] AS word
  FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)
),
kept AS (
  SELECT t.doc_id, t.pos, t.word FROM tok t
  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.doc_id IS NULL
),
clean AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT w.doc_id AS id, COALESCE(clean_text, '') AS clean_text,
  CAST(len(w.ws) AS BIGINT) AS n_tokens,
  CAST(len(w.ws) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed_tokens
FROM w LEFT JOIN clean USING (doc_id)""",
)
def q_dedup_window_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring REMOVAL (Lee et al. 'except one occurrence'): every
    token covered by a duplicated 8-window occurrence other than the
    corpus-wide canonical one (min (doc_id, start) per window hash) is
    dropped; docs reassemble from surviving tokens in order. The 20
    planted template copies collapse to their unique ' copy marker N'
    tails; byte-exact clean_text checked by the oracle."""
    from finetoo_sp_spark.operators.substrdedup import remove_duplicate_windows

    return remove_duplicate_windows(
        _win_corpus(spark, sf_dir), "doc_id", "text", k=8, hash_mode="sha"
    )


@_q(
    "boilerplate_strip_host",
    """
WITH corpus AS (
  SELECT doc_id, source,
    'HOST BANNER FOR ' || source || chr(10) || text || chr(10)
      || 'promo ' || source || ' ' || CAST(doc_id % 5 AS VARCHAR) AS text
  FROM documents
), hd AS (
  SELECT source, count(*) AS n_docs FROM corpus GROUP BY source
), s AS (
  SELECT doc_id, source, string_split(text, chr(10)) AS ls FROM corpus
), l AS (
  SELECT doc_id, source, i AS pos, ls[CAST(i AS BIGINT)] AS ln
  FROM s, UNNEST(generate_series(1, len(ls))) t(i)
), fr AS (
  SELECT source, ln, count(DISTINCT doc_id) AS doc_freq
  FROM l GROUP BY source, ln
), hot AS (
  SELECT source, ln FROM fr JOIN hd USING (source)
  WHERE n_docs >= 3 AND doc_freq * 10000 >= 5000 * n_docs
)
SELECT l.doc_id,
  array_to_string(
    list(CASE WHEN hot.ln IS NULL THEN l.ln END ORDER BY l.pos), chr(10)
  ) AS text,
  CAST(count(hot.ln) AS BIGINT) AS n_removed
FROM l LEFT JOIN hot ON hot.source = l.source AND hot.ln = l.ln
GROUP BY l.doc_id""",
)
def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host line-frequency boilerplate removal (CCNet/OSCAR rule;
    operators/dedup.py host_boilerplate_strip): every page of a host
    carries that host's banner line (100% doc frequency -> stripped
    wherever the host has >= 3 pages) plus a promo line shared by only
    the doc_id%5 cohort (~20% -> kept) plus its own body. The oracle
    recomputes the per-host doc-frequency rule relationally; surviving
    lines keep document order and the removed count is exact."""
    docs = T(spark, sf_dir, "documents")
    corpus = docs.select(
        "doc_id",
        F.col("source"),
        F.concat(
            F.lit("HOST BANNER FOR "),
            F.col("source"),
            F.lit("\n"),
            F.col("text"),
            F.lit("\npromo "),
            F.col("source"),
            F.lit(" "),
            (F.col("doc_id") % 5).cast("string"),
        ).alias("text"),
    )
    out = dd.host_boilerplate_strip(
        corpus, "doc_id", "source", "text", min_host_docs=3, max_ratio_fp=5000
    )
    return out.select(F.col("id").alias("doc_id"), "text", "n_removed")


@_q(
    "canonical_clusters",
    """
WITH v AS (
  SELECT doc_id, source, p.prefix,
    'https://' || p.prefix || '.' || source || '.example.com/doc/' || doc_id AS url,
    CASE WHEN p.prefix = 'amp' AND doc_id % 5 = 0 THEN NULL
         ELSE 'https://www.' || source || '.example.com/doc/' || doc_id
    END AS canon
  FROM documents, (VALUES ('www'), ('m'), ('amp')) p(prefix)
), c AS (
  SELECT url, COALESCE(canon, url) AS cluster_url FROM v
)
SELECT url, cluster_url,
  count(*) OVER (PARTITION BY cluster_url) AS cluster_size,
  CASE WHEN max(CASE WHEN url = cluster_url THEN 1 ELSE 0 END)
            OVER (PARTITION BY cluster_url) = 1
       THEN url = cluster_url
       ELSE url = min(url) OVER (PARTITION BY cluster_url)
  END AS is_survivor
FROM c""",
)
def q_canonical_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel=canonical cluster dedup over REAL extracted declarations:
    www/m/amp variants of every page share a canonical target parsed
    from the actual <link rel=canonical> tag (every 5th amp variant
    omits it and forms its own cluster). The www page wins its cluster
    as the declared target; declaration-free pages survive alone —
    dedup by declaration, before any content hashing."""
    from finetoo_sp_spark.extraction.docpages import documents_to_variant_pages

    pages = documents_to_variant_pages(T(spark, sf_dir, "documents"))
    canon = F.nullif(
        F.regexp_extract(
            F.decode("html", "UTF-8"),
            r'(?is)<link\s[^>]*rel=["\']canonical["\'][^>]*href=["\']([^"\']*)',
            1,
        ),
        F.lit(""),
    )
    return dd.canonical_dedup(
        pages.select("url", canon.alias("canonical_url")),
        "url",
        "canonical_url",
    )


@_q(
    "nfc_normalize",
    """
SELECT doc_id,
  CASE WHEN doc_id % 2 = 0
    THEN text || ' caf' || chr(233) || ' ' || chr(197) || 'ngstr' || chr(246) || 'm'
    ELSE text END AS text_nfc,
  doc_id % 2 = 0 AS changed
FROM documents""",
)
def q_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonical composition (operators/normalize.py
    nfc_normalize_text): every even doc gets DECOMPOSED suffix tokens
    (e+COMBINING ACUTE, A+COMBINING RING, o+COMBINING DIAERESIS) that
    must compose to the precomposed forms; odd docs are untouched ASCII
    and must report changed=false. Arrow's ICU normalizer vs DuckDB's
    nfc_normalize-equivalent expectation built from precomposed chr()
    codepoints \u2014 two independent ICU paths agreeing byte-for-byte."""
    from finetoo_sp_spark.operators.normalize import nfc_normalize_text

    docs = T(spark, sf_dir, "documents")
    decomposed = F.concat(
        F.col("text"),
        F.lit(" cafe\u0301 A\u030angstro\u0308m"),
    )
    corpus = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, decomposed)
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return nfc_normalize_text(corpus, "doc_id", "text")


# ---------------------------------------------------------------- CDC
# Content-defined chunking twins (operators/cdc.py): boundary after
# token p (1-based end, p in [4, n)) when sha60 of the 4-token window
# ending at p is 0 mod 16; bounds = [0] + cuts + [n]; DuckDB lists are
# 1-based so bounds[c]/bounds[c+1] bracket chunk c.
_CDC_CHUNKS_SQL = f"""w AS (
  SELECT doc_id, {_WORDS_SQL} AS ws FROM corpus
  WHERE length(trim(text)) > 0
), bounds AS (
  SELECT doc_id, len(ws) AS n, ws,
    list_concat(list_concat([CAST(0 AS BIGINT)],
      CASE WHEN len(ws) - 1 >= 4 THEN
        list_filter(generate_series(4, len(ws) - 1), p ->
          {_H60.format(x="array_to_string(list_slice(ws, p - 3, p), ' ')")} % 16 = 0)
      ELSE CAST([] AS BIGINT[]) END),
      [CAST(len(ws) AS BIGINT)]) AS b
  FROM w
), chunks AS (
  SELECT doc_id, n, c AS chunk_idx,
    b[CAST(c AS BIGINT)] AS start,
    b[CAST(c + 1 AS BIGINT)] - b[CAST(c AS BIGINT)] AS chunk_tokens,
    {_H60.format(x="array_to_string(list_slice(ws, b[CAST(c AS BIGINT)] + 1, b[CAST(c + 1 AS BIGINT)]), ' ')")} AS chunk_hash
  FROM bounds, UNNEST(generate_series(1, len(b) - 1)) AS t(c)
)"""


@_q(
    "cdc_chunk_stats",
    f"""
WITH {_WIN_CORPUS_SQL}, {_CDC_CHUNKS_SQL}
SELECT doc_id AS id, CAST(n AS BIGINT) AS n_tokens,
  CAST(count(*) AS BIGINT) AS n_chunks,
  CAST(max(chunk_tokens) AS BIGINT) AS max_chunk_tokens,
  bit_xor(chunk_hash) AS chunk_hash_xor
FROM chunks GROUP BY doc_id, n""",
)
def q_cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (LBFS/FastCDC-style local window-hash
    predicate at token granularity, operators/cdc.py) under a full
    value oracle: per doc the chunk count, max chunk length and the
    bit_xor fold of EVERY chunk hash — the xor pins each chunk's exact
    token span, so any boundary slip anywhere breaks the row. Narrow
    JVM array pipeline (split -> window hashes -> filter -> slice),
    zero shuffle before the per-doc aggregate."""
    from finetoo_sp_spark.operators.cdc import cdc_chunks

    chunks = cdc_chunks(
        _win_corpus(spark, sf_dir), "doc_id", "text",
        window=4, divisor=16, hash_mode="sha",
    )
    return chunks.groupBy("id", "n_tokens").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_tokens").alias("max_chunk_tokens"),
        F.expr("bit_xor(chunk_hash)").alias("chunk_hash_xor"),
    ).select(
        "id", F.col("n_tokens").cast("long").alias("n_tokens"),
        "n_chunks", F.col("max_chunk_tokens").cast("long").alias("max_chunk_tokens"),
        "chunk_hash_xor",
    )


@_q(
    "cdc_dedup",
    f"""
WITH {_WIN_CORPUS_SQL}, {_CDC_CHUNKS_SQL},
occ AS (
  SELECT chunks.*, COUNT(*) OVER (PARTITION BY chunk_hash) AS n_occ
  FROM chunks
), per_doc AS (
  SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
    CAST(count(*) AS BIGINT) AS n_chunks,
    CAST(sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
    CAST(sum(CASE WHEN n_occ >= 2 THEN chunk_tokens ELSE 0 END) AS BIGINT) AS dup_tokens
  FROM occ GROUP BY doc_id
)
SELECT c.doc_id AS id,
  COALESCE(n_tokens, 0) AS n_tokens,
  COALESCE(n_chunks, 0) AS n_chunks,
  COALESCE(n_dup_chunks, 0) AS n_dup_chunks,
  COALESCE(dup_tokens, 0) AS dup_tokens
FROM (SELECT DISTINCT doc_id FROM corpus) c
LEFT JOIN per_doc USING (doc_id)""",
)
def q_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup over content-defined chunks: a chunk is dup
    when its hash occurs >= 2 times corpus-wide; dup_tokens is the
    shareable token mass. The 20 planted template copies guarantee
    cross-doc chunk sharing, and CDC's defining property — a local
    edit ('copy marker N' suffixes) leaves all NON-overlapping chunks
    identical — is what the per-doc dup counts exercise. Wide ops:
    one count() window over the uniform chunk-hash partition + one
    groupBy(id); both skew-free at 10^12 docs."""
    from finetoo_sp_spark.operators.cdc import cdc_dedup_stats

    return cdc_dedup_stats(
        _win_corpus(spark, sf_dir), "doc_id", "text",
        window=4, divisor=16, hash_mode="sha",
    )
