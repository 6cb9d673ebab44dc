"""Contract queries: block comparison / divergence / BOM rollups.

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




@_q(
    "divergence_parts",
    """
SELECT l_partkey, count(DISTINCT l_suppkey) AS n_versions,
  count(*) AS n_rows,
  count(DISTINCT l_suppkey) > 1 AS is_divergent
FROM lineitem WHERE l_partkey <= 200
GROUP BY l_partkey""",
)
def q_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 divergence rollup re-expressed over the driver tables: a part
    is 'divergent' when multiple suppliers (versions) ship it
    (reference: BlockDivergenceReport, proto/graph.proto:184-207)."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_partkey") <= 200)
    return li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("n_versions"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.countDistinct("l_suppkey") > 1).alias("is_divergent"),
    )


# full oracle (was rows-only in round 1): the template's 10-block
# decomposition is recomputed in SQL by _blocks_cte, defined below.
@_q("block_divergence", "__BLOCK_DIVERGENCE_ORACLE__")
def q_block_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 divergence report over real extracted DOM blocks: per (tag,
    block position), distinct content hashes across pages (reference:
    BlockDivergenceReport, proto/graph.proto:184-207)."""
    from finetoo_sp_spark.operators.divergence import divergence_report

    blocks = _extracted_blocks_named(spark, sf_dir)
    return divergence_report(blocks, "name", "url", "content_hash").drop("versions")


@_q("divergence_totals", "__DIVERGENCE_TOTALS_ORACLE__")
def q_divergence_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 totals row (reference: proto/graph.proto:199-206): consistent vs
    divergent block-name counts over the extracted block frames."""
    from finetoo_sp_spark.operators.divergence import divergence_report, divergence_totals

    blocks = _extracted_blocks_named(spark, sf_dir)
    rep = divergence_report(blocks, "name", "url", "content_hash")
    return divergence_totals(rep)


@_q("shared_block_names", "__SHARED_BLOCKS_ORACLE__")
def q_shared_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 shared blocks / n-way intersect (reference:
    block_analyzer.cc:45-52): block names present in >= 2 documents."""
    from finetoo_sp_spark.operators.divergence import shared_names

    blocks = _extracted_blocks_named(spark, sf_dir)
    return shared_names(blocks, "name", "url", min_docs=2)


@_q("block_comparison", "__BLOCK_COMPARISON_ORACLE__")
def q_block_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BlockComparison diff records (reference: proto/graph.proto:305-383
    — per pair of drawings, per block: presence, value equality, count
    deltas). 20 page pairs (doc i vs doc i+250) compared in ONE
    equi-join keyed (pair_id, name) — the scale shape; never a per-pair
    loop."""
    from finetoo_sp_spark.extraction.graph import extract_blocks
    from finetoo_sp_spark.operators.divergence import block_comparison

    docs = T(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 20) | F.col("doc_id").between(250, 269)
    )
    blocks = extract_blocks(documents_to_pages(docs)).withColumn(
        "did", F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long")
    ).withColumn("name", F.concat_ws("#", "tag", "block_id"))
    ba = blocks.filter(F.col("did") < 20).withColumn("pair_id", F.col("did"))
    bb = blocks.filter(F.col("did") >= 250).withColumn("pair_id", F.col("did") - 250)
    return block_comparison(ba, bb, on=["pair_id", "name"])


@_q("block_canonical", "__BLOCK_CANONICAL_ORACLE__")
def q_block_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-version choice per block name (reference:
    BlockComparison's user canonical choice, proto/graph.proto:305-383 —
    the automated majority default): most frequent content hash, ties on
    smallest hash, with an example document."""
    from finetoo_sp_spark.operators.divergence import canonical_choice

    blocks = _extracted_blocks_named(spark, sf_dir)
    return canonical_choice(blocks, "name", "url", "content_hash")


@_q("bom_text_render", "__BOM_TEXT_ORACLE__")
def q_bom_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FormatBOM fixed-width text rendering (reference:
    query_service.cc:181-206): header + separator + rpad(part)/lpad(qty)
    rows sorted by quantity desc, byte-deterministic."""
    from finetoo_sp_spark.extraction.graph import build_web_graph
    from finetoo_sp_spark.operators.divergence import bom_report
    from finetoo_sp_spark.operators.sinks import format_bom_lines

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    bom = bom_report(build_web_graph(pages), edge_type="LINKS_TO")
    return format_bom_lines(bom)


@_q(
    "dedup_apply_exact",
    """
WITH k AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN k USING (doc_id)""",
)
def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized deduplicated corpus (min-id survivors of exact
    groups) — the operator a pipeline actually writes back out."""
    out = dd.apply_exact_dedup(T(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select("doc_id", "source", "n_chars")


@_q(
    "bom_totals_links",
    """
WITH l AS (
  SELECT CAST(floor(doc_id / 2) AS BIGINT) AS t FROM documents
  UNION ALL SELECT CAST(floor(doc_id / 3) AS BIGINT) FROM documents
)
SELECT count(DISTINCT t) AS total_unique_parts,
  count(*) AS total_instances
FROM l""",
)
def q_bom_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 BOM totals (reference: bom_exporter.cc:161-168): unique parts +
    total instances over the link BOM."""
    from finetoo_sp_spark.extraction.graph import build_web_graph
    from finetoo_sp_spark.operators.divergence import bom_report, bom_totals

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    bom = bom_report(build_web_graph(pages), edge_type="LINKS_TO")
    return bom_totals(bom)
