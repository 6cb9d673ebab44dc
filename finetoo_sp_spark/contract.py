"""Driver-contract queries: Spark implementations + DuckDB oracle SQL.

Every operator family from SURVEY.md §2 (and the training-data-pipeline
extensions: dedup, similarity, text analysis, events, multimodal,
extraction) gets a named query over the driver's parquet tables plus —
wherever the semantics are SQL-expressible — an equivalent DuckDB oracle
string. Column names AND types are aligned pairwise (computed ints are
BIGINT on both sides; floats are rounded at the boundary to absorb
summation-order ulps between engines).

The flagship (``entry``) is the end-to-end extraction pipeline: the
driver documents are wrapped in a deterministic HTML template
(extraction/docpages.py) whose correct extraction is computable in plain
SQL — so the oracle check IS the byte-identical-text-per-url invariant
from BASELINE.json.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finetoo_sp_spark.extraction.docpages import documents_to_pages
from finetoo_sp_spark.extraction.extract import extract_pages
from finetoo_sp_spark.operators import dedup as dd
from finetoo_sp_spark.operators import similarity as sim
from finetoo_sp_spark.operators import textstats as ts
from finetoo_sp_spark.operators import windows as ev
from finetoo_sp_spark.operators.primitives import (
    PropertyGraphFrames,
    op_aggregate,
    op_compare,
    op_filter,
    op_group_by,
    op_join,
    op_match,
    op_project,
    op_traverse,
)
from finetoo_sp_spark.schema.registry import PropertyMeta, Schema

# ---------------------------------------------------------------- helpers


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tpch_schema() -> Schema:
    """Schema registry over the driver's TPC-H-ish tables — the analogue
    of the reference's hand-declared CreateDXFSchema (schema-driven
    operator discovery gates every primitive below)."""
    s = Schema("tpch")
    s.add_node_type(
        "customer",
        [
            PropertyMeta("c_custkey", "int64", unique=True, indexed=True, comparable=True),
            PropertyMeta("c_name", "string", indexed=True),
            PropertyMeta("c_nationkey", "int64", indexed=True),
            PropertyMeta("c_acctbal", "double", indexed=True, comparable=True, aggregable=True),
            PropertyMeta("c_mktsegment", "string", indexed=True),
        ],
    )
    s.add_node_type(
        "orders",
        [
            PropertyMeta("o_orderkey", "int64", unique=True, indexed=True),
            PropertyMeta("o_custkey", "int64", indexed=True),
            PropertyMeta("o_orderstatus", "string", indexed=True),
            PropertyMeta("o_totalprice", "double", indexed=True, comparable=True, aggregable=True),
            PropertyMeta("o_orderpriority", "string", indexed=True),
        ],
    )
    s.add_node_type(
        "part",
        [
            PropertyMeta("p_partkey", "int64", unique=True, indexed=True),
            PropertyMeta("p_name", "string", indexed=True),
            PropertyMeta("p_brand", "string", indexed=True),
            PropertyMeta("p_type", "string", indexed=True),
            PropertyMeta("p_size", "int64", indexed=True, comparable=True, aggregable=True),
            PropertyMeta("p_retailprice", "double", comparable=True, aggregable=True),
        ],
    )
    s.add_node_type(
        "lineitem",
        [
            PropertyMeta("l_orderkey", "int64", indexed=True),
            PropertyMeta("l_quantity", "double", indexed=True, comparable=True, aggregable=True),
            PropertyMeta("l_returnflag", "string", indexed=True),
        ],
    )
    s.add_edge_type("PLACED", "customer", "orders")
    return s


def tpch_graph(spark: SparkSession, sf_dir: str) -> PropertyGraphFrames:
    """The driver tables mounted as a property graph (nodes_by_type model,
    SURVEY §1.1): per-type node frames + the PLACED edge frame."""
    cust = T(spark, sf_dir, "customer").withColumn("node_id", F.col("c_custkey"))
    orders = T(spark, sf_dir, "orders").withColumn("node_id", F.col("o_orderkey"))
    part = T(spark, sf_dir, "part").withColumn("node_id", F.col("p_partkey"))
    li = T(spark, sf_dir, "lineitem").withColumn(
        "node_id", F.concat_ws("-", "l_orderkey", "l_linenumber")
    )
    edges = T(spark, sf_dir, "orders").select(
        F.lit("PLACED").alias("edge_type"),
        F.col("o_custkey").alias("src"),
        F.col("o_orderkey").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    return PropertyGraphFrames(
        schema=tpch_schema(),
        nodes={"customer": cust, "orders": orders, "part": part, "lineitem": li},
        edges=edges,
    )


_CUSTOMER_COLS = "c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment"
_ORDERS_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"

_WORDS_SQL = "regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
_STOP_ALL = sorted({w for ws in ts.STOPWORDS.values() for w in ws})


def _docpages_expected_sql(cols: str) -> str:
    """Oracle-side recomputation of the correct extraction for the
    documents_to_pages template (docpages.py)."""
    return f"""
WITH exp AS (
  SELECT
    'https://' || source || '.example.com/doc/' || doc_id AS url,
    'heading for document ' || doc_id || chr(10)
      || trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text,
    'document ' || doc_id || ' from ' || source AS title,
    'heading for document ' || doc_id AS h1,
    lang AS lang_attr,
    doc_id
  FROM documents
)
SELECT {cols} FROM exp"""


# ---------------------------------------------------------------- queries

_REGISTRY: list[tuple[str, Callable[[SparkSession, str], DataFrame], str | None]] = []


def _q(name: str, oracle: str | None):
    def deco(fn):
        _REGISTRY.append((name, fn, oracle))
        return fn

    return deco


# --- flagship extraction -------------------------------------------------

_EXTRACT_ORACLE = _docpages_expected_sql("url, text, title, h1, doc_id")


@_q("extract_main_text", _EXTRACT_ORACLE)
def q_extract_main_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    # hash(url) salt repartition before the kernel (the north-rule skew
    # defense); locally it also rescues the single-file scan from a
    # one-core kernel run (cold 3.7 -> 1.5 s at sf0.1)
    out = extract_pages(
        pages, repartition_buckets=spark.sparkContext.defaultParallelism,
        keep_cols=["doc_id"],
    )
    return out.select("url", "text", "title", "h1", "doc_id")


@_q(
    "extract_block_stats",
    # text = h1 || '\n' || body, so content chars = len(h1)+len(body) = len(text)-1;
    # the template has exactly 2 content blocks (h1 + body paragraph).
    _docpages_expected_sql(
        "url, CAST(2 AS BIGINT) AS n_content_blocks, "
        "CAST(length(text) - 1 AS BIGINT) AS content_chars"
    ),
)
def q_extract_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-url block counts; the oracle recomputes content_chars from the
    template's known extraction (text = h1 || nl || body)."""
    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    out = extract_pages(
        pages, repartition_buckets=spark.sparkContext.defaultParallelism
    )
    return out.select("url", "n_content_blocks", "content_chars")


@_q(
    "extract_spans",
    """
WITH pre AS (
  SELECT doc_id, text,
    '<!DOCTYPE html><html lang="' || lang || '"><head><title>document '
      || doc_id || ' from ' || source
      || '</title><meta name="description" content="summary of document '
      || doc_id || ' from ' || source
      || '"><link rel="canonical" href="https://' || source || '.example.com/doc/' || doc_id
      || '"><script>var doc_id = ' || doc_id || ';</script></head><body><header>'
      || '<ul><li><a href="/home">home</a></li><li><a href="/tags/' || source || '">' || source
      || '</a></li><li><a href="https://src' || CAST(CAST(floor(doc_id / 2) AS BIGINT) % 20 AS VARCHAR)
      || '.example.com/doc/' || CAST(CAST(floor(doc_id / 2) AS BIGINT) AS VARCHAR)
      || '">related</a></li><li><a href="https://src' || CAST(CAST(floor(doc_id / 3) AS BIGINT) % 20 AS VARCHAR)
      || '.example.com/doc/' || CAST(CAST(floor(doc_id / 3) AS BIGINT) AS VARCHAR)
      || '">more</a></li><li><a href="/about">about</a></li></ul>'
      || '</header><main><h1>heading for document ' || doc_id || '</h1><p>' AS prefix,
    'https://' || source || '.example.com/doc/' || doc_id AS url,
    'heading for document ' || doc_id AS h1t
  FROM documents
), pos AS (
  SELECT url,
    strpos(prefix, '<h1>') + 3 AS h1s,
    strpos(prefix, '<h1>') + 3 + length(h1t) AS h1e,
    length(prefix) AS ps,
    length(prefix) + length(text) AS pe
  FROM pre
)
SELECT url,
  '[{"start":' || h1s || ',"end":' || h1e || ',"tag":"h1"},{"start":'
    || ps || ',"end":' || pe || ',"tag":"p"}]' AS spans_json
FROM pos""",
)
def q_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spans output of the north rule under a FULL value oracle: per
    url, the content-block char offsets into the decoded HTML,
    serialized as JSON. The oracle rebuilds the template prefix in SQL
    and derives every offset independently (strpos + raw-text lengths) —
    so the kernel's exact token-offset arithmetic, not just the joined
    text, is value-checked."""
    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    out = extract_pages(
        pages, repartition_buckets=spark.sparkContext.defaultParallelism
    )
    return out.select("url", F.to_json("spans").alias("spans_json"))


# --- TPC-H classics ------------------------------------------------------


@_q(
    "q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 4) AS avg_qty,
  round(avg(l_extendedprice), 4) AS avg_price,
  round(avg(l_discount), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus""",
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_q(
    "q3_shipping_priority",
    """
SELECT l_orderkey,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10""",
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@_q(
    "q5_local_supplier",
    """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name""",
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    supp = T(spark, sf_dir, "supplier")
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# --- the 8 primitives over the property graph ---------------------------


@_q(
    "match_customer",
    f"SELECT c_custkey AS node_id, {_CUSTOMER_COLS} FROM customer WHERE c_custkey = 42",
)
def q_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    out = op_match(g, "customer", "c_custkey", 42)
    return out.select("node_id", *[c.strip() for c in _CUSTOMER_COLS.split(",")])


@_q(
    "filter_customers",
    f"SELECT c_custkey AS node_id, {_CUSTOMER_COLS} FROM customer WHERE c_acctbal > 9900.0",
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    out = op_filter(g, "customer", "c_acctbal", "GT", 9900.0)
    return out.select("node_id", *[c.strip() for c in _CUSTOMER_COLS.split(",")])


@_q(
    "project_parts",
    "SELECT p_partkey, p_name, p_retailprice AS price FROM part",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    return op_project(
        g, "part", ["p_partkey", "p_name", "p_retailprice"], rename={"p_retailprice": "price"}
    )


@_q(
    "compare_acctbal",
    """
SELECT a.c_acctbal AS value_1, b.c_acctbal AS value_2,
  a.c_acctbal - b.c_acctbal AS difference,
  abs(a.c_acctbal - b.c_acctbal) <= 1000.0 AS within_tolerance
FROM (SELECT c_acctbal FROM customer WHERE c_custkey = 1) a,
     (SELECT c_acctbal FROM customer WHERE c_custkey = 2) b""",
)
def q_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    return op_compare(g, "customer", "c_acctbal", "c_custkey", 1, 2, tolerance=1000.0)


@_q(
    "traverse_placed",
    """
SELECT o_custkey AS origin, o_orderkey AS dst, 1 AS depth,
  o_custkey || ' -> ' || o_orderkey AS provenance
FROM orders WHERE o_custkey IN (1, 2, 3, 4, 5)""",
)
def q_traverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    return op_traverse(g, "PLACED", start_ids=[1, 2, 3, 4, 5])


@_q(
    "join_placed",
    f"""
SELECT c_custkey AS node_id, {_CUSTOMER_COLS},
  o_orderkey AS orders_node_id,
  {', '.join(f'{c.strip()} AS orders_{c.strip()}' for c in _ORDERS_COLS.split(','))}
FROM customer JOIN orders ON o_custkey = c_custkey
WHERE c_custkey <= 50""",
)
def q_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    left = g.nodes["customer"].filter(F.col("c_custkey") <= 50)
    out = op_join(g, "customer", "orders", "PLACED", left=left)
    cust_cols = ["node_id"] + [c.strip() for c in _CUSTOMER_COLS.split(",")]
    ord_cols = ["orders_node_id"] + [f"orders_{c.strip()}" for c in _ORDERS_COLS.split(",")]
    return out.select(*cust_cols, *ord_cols)


@_q(
    "aggregate_avg_quantity",
    "SELECT round(avg(l_quantity), 4) AS avg_l_quantity FROM lineitem",
)
def q_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    out = op_aggregate(g, "lineitem", "AVG", "l_quantity")
    return out.select(F.round("avg_l_quantity", 4).alias("avg_l_quantity"))


@_q(
    "group_by_priority",
    "SELECT o_orderpriority, count(*) AS count_nodes FROM orders GROUP BY o_orderpriority",
)
def q_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    return op_group_by(g, "orders", "o_orderpriority")


@_q(
    "aggregate_global",
    """
SELECT count(*) AS n_rows,
  round(sum(l_quantity), 2) AS sum_qty,
  round(avg(l_quantity), 4) AS avg_qty,
  min(l_quantity) AS min_qty,
  max(l_quantity) AS max_qty,
  round(stddev(l_quantity), 4) AS stddev_qty
FROM lineitem""",
)
def q_aggregate_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.stddev("l_quantity"), 4).alias("stddev_qty"),
    )


# --- sorts / limits / set ops -------------------------------------------


@_q(
    "top_k_orders",
    """
SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@_q(
    "union_nation_keys",
    """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
UNION SELECT DISTINCT s_nationkey FROM supplier""",
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@_q(
    "intersect_nation_keys",
    """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
INTERSECT SELECT DISTINCT s_nationkey FROM supplier""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    return c.intersect(s)


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


@_q(
    "plan_filter_groupby",
    """
SELECT c_mktsegment, count(*) AS count_nodes
FROM customer WHERE c_acctbal > 5000.0
GROUP BY c_mktsegment""",
)
def q_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 plan interpreter: JSON plan -> one fused DataFrame (reference:
    ExecutePlan loop, query_service.cc:244-252)."""
    from finetoo_sp_spark.plans.interpreter import execute_plan

    g = tpch_graph(spark, sf_dir)
    plan = [
        {
            "type": "FILTER",
            "target_type": "customer",
            "property": "c_acctbal",
            "predicate": "GT",
            "value": 5000.0,
        },
        {"type": "GROUP_BY", "target_type": "customer", "property": "c_mktsegment"},
    ]
    return execute_plan(g, plan).df


def _extracted_blocks_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finetoo_sp_spark.extraction.graph import extract_blocks

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    return (
        extract_blocks(pages)
        .withColumn("name", F.concat_ws("#", "tag", "block_id"))
        .withColumn("content_hash", F.sha2("text", 256))
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


# --- events: histogram, sessions, rollups, JSON --------------------------


@_q(
    "histogram_events",
    "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "events").groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@_q(
    "session_stats",
    """
WITH s AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
      OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS is_start
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sid AS (
  SELECT user_id, ts,
    CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS session_id
  FROM s
)
SELECT user_id, session_id, count(*) AS n_events,
  min(ts) AS start_ts, max(ts) AS end_ts,
  CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s
FROM sid GROUP BY user_id, session_id""",
)
def q_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.session_stats(T(spark, sf_dir, "events"))


@_q(
    "daily_rollup",
    """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
  count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2""",
)
def q_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.daily_rollup(T(spark, sf_dir, "events"))


@_q(
    "json_prop_rollup",
    """
SELECT event_type, count(*) AS n_events,
  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
FROM events GROUP BY event_type""",
)
def q_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.json_prop_rollup(T(spark, sf_dir, "events"))


@_q(
    "range_join_trial_events",
    """
WITH r AS (
  SELECT user_id, min(ts) AS trial_start,
    min(ts) + INTERVAL 1 DAY AS trial_end
  FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.ts, e.event_type,
  r.trial_start, r.trial_end
FROM events e JOIN r
  ON e.user_id = r.user_id
 AND e.ts >= r.trial_start AND e.ts < r.trial_end""",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed point-in-interval range join (operators/asof.range_join):
    events inside each user's first-day trial window. A naive BETWEEN
    join plans as a nested loop; here intervals explode onto 6h time
    buckets and the join is a plain equi-join on (user_id, bucket) with
    the exact predicate applied after — no cross product (plan audit
    asserts it). Oracle = the naive theta join in DuckDB."""
    from finetoo_sp_spark.operators.asof import range_join

    ev = T(spark, sf_dir, "events")
    trials = ev.groupBy("user_id").agg(
        F.min("ts").alias("trial_start"),
        (F.min("ts") + F.expr("INTERVAL 1 DAY")).alias("trial_end"),
    )
    out = range_join(
        ev.select("event_id", "user_id", "ts", "event_type"),
        trials,
        point_col="ts",
        start_col="trial_start",
        end_col="trial_end",
        by="user_id",
        bucket_seconds=21600,
    )
    return out.select(
        "event_id", "user_id", "ts", "event_type", "trial_start", "trial_end"
    )


@_q(
    "value_percentiles",
    """
SELECT event_type,
  round(quantile_cont(value, 0.5), 4) AS p50,
  round(quantile_cont(value, 0.9), 4) AS p90,
  round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type""",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` and
    DuckDB `quantile_cont` share the continuous-quantile definition).
    At 10^12 rows swap in approx_percentile — same plan shape, sketch
    merge instead of sort."""
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
    )


@_q(
    "window_lead_lag",
    """
SELECT event_id, user_id, ts,
  lag(event_type) OVER w AS prev_type,
  lead(event_type) OVER w AS next_type,
  CAST(ntile(4) OVER w AS INTEGER) AS quartile
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def q_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-context window functions (lag/lead/ntile) over per-user
    event streams — deterministic total order via the (ts, event_id)
    tie-break."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        T(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            F.ntile(4).over(w).alias("quartile"),
        )
    )


@_q(
    "rollup_order_priority",
    """
SELECT o_orderpriority, o_orderstatus, count(*) AS n,
  round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregation (beyond the reference's flat
    GROUP_BY — SURVEY D-notes list grouping sets as absent there; a
    complete engine needs them): per (priority, status), per priority,
    and grand total in one pass (Expand + single shuffle)."""
    return (
        T(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@_q(
    "asof_last_purchase",
    """
WITH r AS (
  SELECT user_id, ts, max(value) AS asof_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), l AS (
  SELECT event_id, ts, user_id, event_type, value FROM events
  WHERE event_type <> 'purchase'
)
SELECT l.event_id, l.ts, l.user_id, l.event_type, l.value, r.asof_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""",
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): every non-purchase event carries
    the value of the user's most recent prior-or-simultaneous purchase
    (null if none). One shuffle on user_id, one ordered window pass —
    no range cross product; the oracle is DuckDB's native ASOF JOIN."""
    from finetoo_sp_spark.operators.asof import asof_join

    ev = T(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    right = ev.filter(F.col("event_type") == "purchase")
    return asof_join(left, right, by="user_id", on="ts", value_col="value")


@_q(
    "asof_with_tolerance",
    """
WITH r AS (
  SELECT user_id, ts, max(value) AS v
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), l AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type <> 'purchase'
), j AS (
  SELECT l.event_id, l.ts, l.user_id, r.ts AS rts, r.v
  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
)
SELECT event_id, ts, user_id,
  CASE WHEN rts IS NOT NULL AND date_diff('second', rts, ts) <= 86400 THEN v END AS asof_value,
  CASE WHEN rts IS NOT NULL AND date_diff('second', rts, ts) <= 86400 THEN rts END AS asof_ts
FROM j""",
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound (merge_asof tolerance): matches
    older than 24h become null, and the matched timestamp is emitted so
    downstream logic can reason about snapshot age."""
    from finetoo_sp_spark.operators.asof import asof_join

    ev = T(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "ts", "user_id"
    )
    right = ev.filter(F.col("event_type") == "purchase")
    return asof_join(
        left,
        right,
        by="user_id",
        on="ts",
        value_col="value",
        tolerance_seconds=86400,
        ts_out_col="asof_ts",
    )


@_q(
    "q10_returned_items",
    """
SELECT c_custkey, c_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20""",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = T(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@_q(
    "window_rank_suppliers",
    """
SELECT * FROM (
  SELECT s_nationkey, s_suppkey, s_name, s_acctbal,
    CAST(row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS rk
  FROM supplier
) WHERE rk <= 2""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via window rank (no window top-k exists in the
    reference — SURVEY E-notes; this is the scalable replacement)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        T(spark, sf_dir, "supplier")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 2)
        .select("s_nationkey", "s_suppkey", "s_name", "s_acctbal", "rk")
    )


@_q(
    "except_sizes",
    """
SELECT DISTINCT p_size AS v FROM part
EXCEPT SELECT DISTINCT l_linenumber FROM lineitem""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = T(spark, sf_dir, "part").select(F.col("p_size").alias("v")).distinct()
    b = T(spark, sf_dir, "lineitem").select(F.col("l_linenumber").alias("v")).distinct()
    return a.exceptAll(b).distinct()


@_q(
    "moving_avg_daily_value",
    """
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
    round(sum(value), 4) AS day_value
  FROM events GROUP BY 1
)
SELECT day, day_value,
  round(avg(day_value) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
FROM d""",
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = (
        T(spark, sf_dir, "events")
        .groupBy(F.date_trunc("DAY", F.col("ts")).alias("day"))
        .agg(F.round(F.sum("value"), 4).alias("day_value"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return d.withColumn("ma7", F.round(F.avg("day_value").over(w), 4))


# --- dedup family ---------------------------------------------------------


@_q(
    "dedup_exact",
    """
SELECT sha256(text) AS content_sha, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY sha256(text)""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup(T(spark, sf_dir, "documents"), "doc_id", "text")


def _shingle_ctes(where: str, src: str = "documents") -> str:
    """Shared DuckDB CTEs: distinct 3-word shingles per doc (twin of
    dd.shingles)."""
    return f"""w AS (
  SELECT doc_id, {_WORDS_SQL} AS ws FROM {src} WHERE {where}
), sh AS (
  SELECT DISTINCT doc_id,
    array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + 3 AS BIGINT)], ' ') AS shingle
  FROM w, UNNEST(generate_series(0, greatest(len(ws) - 3, 0))) AS t(i)
  WHERE length(array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + 3 AS BIGINT)], ' ')) > 0
)"""


def _jaccard_sql(where: str, threshold: float, max_df: int | None = None) -> str:
    """Oracle twin of dd.ngram_jaccard_pairs(n=3): shingle inverted-index
    self-join; with ``max_df``, the same stop-shingle pruning (index
    pruned, union sizes from the UNPRUNED sets — matching the Spark
    implementation exactly)."""
    prune = ""
    idx = "sh"
    if max_df is not None:
        prune = f""", idx AS (
  SELECT * FROM sh WHERE shingle NOT IN (
    SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {max_df})
)"""
        idx = "idx"
    return f"""
WITH {_shingle_ctes(where)}{prune}, sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM {idx} a JOIN {idx} b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
  round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= {threshold}"""


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


_JACCARD_ORACLE = _jaccard_sql("doc_id < 300", 0.05)


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


# DuckDB twin of dd.sha60 — the portable base hash for verifiable mode.
_H60 = "CAST('0x' || substr(sha256({x}), 1, 15) AS BIGINT)"


def _minhash_oracle(
    where: str,
    k: int,
    bands: int,
    threshold: float,
    src: str = "documents",
    prelude: str = "",
) -> str:
    """Full-value oracle for minhash_lsh_pairs(hash_mode='sha'):
    identical permutations (minhash_params), banding, candidate join and
    exact-Jaccard verification, recomputed in plain SQL."""
    from finetoo_sp_spark.operators.dedup import _MERSENNE, minhash_params

    r = k // bands
    mins = ",\n    ".join(
        f"min(({a} * h + {b}) % {_MERSENNE}) AS m{i}"
        for i, (a, b) in enumerate(minhash_params(k))
    )
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, "
        + " || ',' || ".join(f"CAST(m{bi * r + j} AS VARCHAR)" for j in range(r))
        + " AS bucket FROM sig"
        for bi in range(bands)
    )
    return f"""
WITH {prelude}{_shingle_ctes(where, src)},
hh AS (SELECT doc_id, {_H60.format(x='shingle')} % {_MERSENNE} AS h FROM sh),
sig AS (SELECT doc_id,
    {mins}
  FROM hh GROUP BY doc_id),
banded AS ({band_selects}),
cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT c.id_a, c.id_b,
  round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM cand c
JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= {threshold}"""


def _simhash_oracle(max_hamming: int, src: str = "documents", prelude: str = "") -> str:
    """Full-value oracle for simhash_pairs(hash_mode='sha'): 60-bit
    fingerprint from per-bit +-1 sums, pigeonhole banding, xor/bit_count
    verify — all recomputed in SQL."""
    nbits = 60
    nb = max_hamming + 1
    width = nbits // nb
    sums = ",\n    ".join(
        f"sum(CASE WHEN ((h >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(nbits)
    )
    fp_expr = "\n    + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(nbits)
    )
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, (fp >> {bi * width}) & {(1 << width) - 1} AS bits FROM fps"
        for bi in range(nb)
    )
    return f"""
WITH {prelude}w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM {src}),
wd AS (SELECT doc_id, u.w AS w FROM w, UNNEST(ws) AS u(w) WHERE length(u.w) > 0),
hh AS (SELECT doc_id, {_H60.format(x='w')} AS h FROM wd),
s AS (SELECT doc_id,
    {sums}
  FROM hh GROUP BY doc_id),
fps AS (SELECT doc_id, {fp_expr} AS fp FROM s),
banded AS ({band_selects}),
cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bits = y.bits AND x.doc_id < y.doc_id)
SELECT c.id_a, c.id_b, bit_count(xor(fa.fp, fb.fp)) AS hamming
FROM cand c
JOIN fps fa ON fa.doc_id = c.id_a
JOIN fps fb ON fb.doc_id = c.id_b
WHERE bit_count(xor(fa.fp, fb.fp)) <= {max_hamming}"""


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


# Incremental (new-crawl-vs-existing-corpus) near-dup corpus: the new
# batch is 20 edited copies of old docs (guaranteed cross hits) plus 50
# fresh docs, id-offset so cross pairs are exactly {id_a < 100000 <=
# id_b} in the combined self-join oracle.
_INCR_CORPUS_SQL = """newdocs AS (
  SELECT 100000 + doc_id AS doc_id, text || ' update' AS text
  FROM documents WHERE doc_id < 20
  UNION ALL
  SELECT 100000 + doc_id AS doc_id, text
  FROM documents WHERE doc_id >= 150 AND doc_id < 200
),
corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 100
  UNION ALL SELECT doc_id, text FROM newdocs
),
"""


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


# Template-heavy corpus for exercising the hot-bucket salting branch
# UNDER the value oracle: 60 injected copies of doc 0's text (three
# near-identical ' v0/v1/v2' variants of 20 exact copies each) flood
# every LSH band bucket far past bucket_cap=16, so the registered plan
# executes the triangular-cell split (_bucket_self_pairs hot branch) —
# and the oracle, which knows nothing about salting, proves the split
# is output-identical to the logical uncapped self-join.
_TEMPLATE_CORPUS_SQL = """tmpl AS (SELECT text FROM documents WHERE doc_id = 0),
corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 100
  UNION ALL
  SELECT 100000 + i, t.text || ' v' || CAST(i % 3 AS VARCHAR)
  FROM tmpl t, UNNEST(generate_series(0, 59)) AS g(i)
),
"""


def _template_heavy_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 100).select("doc_id", "text")
    tmpl = docs.filter(F.col("doc_id") == 0).select(F.col("text").alias("_t"))
    copies = (
        spark.range(60)
        .crossJoin(F.broadcast(tmpl))  # broadcast-scalar: one template row
        .select(
            (F.lit(100000) + F.col("id")).alias("doc_id"),
            F.concat("_t", F.lit(" v"), (F.col("id") % 3).cast("string")).alias("text"),
        )
    )
    return base.unionByName(copies)


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


_COSINE_SQL = """
round(
  list_sum(list_transform(range(1, 65),
    i -> (a.embedding[i] / sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x))))
       * (b.embedding[i] / sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x))))
  )), 6)"""

_BUCKET_SQL = (
    "array_to_string(list_transform({side}.embedding[1:8], "
    "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"
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
    "blocklist_filter",
    """
SELECT doc_id, source FROM documents
WHERE source NOT IN ('src0', 'src7', 'src13')""",
)
def q_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/source blocklist via broadcast anti-join — the standard
    corpus-hygiene gate (at 10^12 rows the blocklist is dimension-sized,
    so the anti-join is broadcast and costs one map-side probe)."""
    docs = T(spark, sf_dir, "documents")
    blocked = docs.sparkSession.createDataFrame(
        [("src0",), ("src7",), ("src13",)], ["source"]
    )
    return docs.join(F.broadcast(blocked), "source", "left_anti").select(
        "doc_id", "source"
    )


@_q(
    "pii_scrub",
    """
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      substr(text, 1, 40) || ' contact u' || doc_id || '@example.com or +1-555-0' || doc_id,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\\+?[0-9][0-9()\\-. ]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed
FROM documents""",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails, phone numbers) as pure column regexps —
    deterministically verifiable because the PII is synthesized into the
    text from doc_id before scrubbing."""
    withpii = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact u"),
        F.col("doc_id"),
        F.lit("@example.com or +1-555-0"),
        F.col("doc_id"),
    )
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"
    return T(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(withpii, email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("scrubbed"),
    )


# --- similarity search ----------------------------------------------------


@_q(
    "pii_detect_stats",
    """
WITH m AS (
  SELECT doc_id,
    substr(text, 1, 40) || ' contact u' || doc_id || '@example.com or +1-555-0'
      || doc_id || ' and u' || doc_id || '@alt.example.org' AS mtext
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(mtext, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
  CAST(len(regexp_extract_all(mtext, '\\+?[0-9][0-9()\\-. ]{7,}[0-9]')) AS INTEGER) AS n_phones,
  (len(regexp_extract_all(mtext, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
   + len(regexp_extract_all(mtext, '\\+?[0-9][0-9()\\-. ]{7,}[0-9]'))) > 0 AS has_pii
FROM m""",
)
def q_pii_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection statistics (the measurement half of the scrub op):
    per-doc email/phone match counts over text with synthesized PII —
    what a privacy audit reports before deciding to scrub or drop."""
    mtext = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact u"),
        F.col("doc_id"),
        F.lit("@example.com or +1-555-0"),
        F.col("doc_id"),
        F.lit(" and u"),
        F.col("doc_id"),
        F.lit("@alt.example.org"),
    )
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"
    n_em = F.regexp_count(mtext, F.lit(email))
    n_ph = F.regexp_count(mtext, F.lit(phone))
    return T(spark, sf_dir, "documents").select(
        "doc_id",
        n_em.alias("n_emails"),
        n_ph.alias("n_phones"),
        ((n_em + n_ph) > 0).alias("has_pii"),
    )


@_q(
    "outlink_stats",
    """
SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url,
  CAST(8 AS BIGINT) AS n_links,
  CAST(6
    + CASE WHEN CAST(CAST(floor(doc_id / 2) AS BIGINT) % 20 AS VARCHAR) = replace(source, 'src', '') THEN 1 ELSE 0 END
    + CASE WHEN CAST(CAST(floor(doc_id / 3) AS BIGINT) % 20 AS VARCHAR) = replace(source, 'src', '') THEN 1 ELSE 0 END
    AS BIGINT) AS n_internal
FROM documents""",
)
def q_outlink_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page outlink statistics over REAL extracted anchors: total
    resolved links and same-host (internal) links — the link-graph
    features domain-level spam/quality policies consume. The oracle
    derives the expectation from the template's 8-anchor layout and the
    parent-link host rule."""
    from finetoo_sp_spark.extraction.graph import extract_link_pairs

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    links = extract_link_pairs(pages)
    host = F.regexp_extract("url", r"https?://([^/]+)", 1)
    thost = F.regexp_extract("target", r"https?://([^/]+)", 1)
    return (
        links.groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.sum(F.when(host == thost, 1).otherwise(0)).alias("n_internal"),
        )
    )


@_q(
    "ann_topk_bruteforce",
    f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COSINE_SQL.replace("a.embedding", "q.embedding").replace("b.embedding", "c.embedding")} AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id != q.vec_id
)
SELECT query_id, neighbor_id, cosine,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 5""",
)
def q_ann_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = T(spark, sf_dir, "embeddings")
    return sim.brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


@_q(
    "ann_lsh_bucketed",
    f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COSINE_SQL.replace("a.embedding", "q.embedding").replace("b.embedding", "c.embedding")} AS cosine
  FROM embeddings q JOIN embeddings c
    ON q.vec_id < 5 AND c.vec_id != q.vec_id
    AND {_BUCKET_SQL.format(side='q')} = {_BUCKET_SQL.format(side='c')}
)
SELECT query_id, neighbor_id, cosine,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 5""",
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = T(spark, sf_dir, "embeddings")
    return sim.ann_lsh_bucketed(emb, emb.filter(F.col("vec_id") < 5), k=5, n_bits=8)


# --- text analysis ---------------------------------------------------------


@_q(
    "token_counts",
    f"""
SELECT doc_id AS id, length(text) AS n_chars,
  CAST(len({_WORDS_SQL}) AS INTEGER) AS n_words,
  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_est
FROM documents""",
)
def q_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ts.token_counts(T(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select("id", F.col("n_chars").cast("int").alias("n_chars"), "n_words", "n_tokens_est")


_STOP_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in _STOP_ALL) + "]"


@_q(
    "quality_scores",
    f"""
WITH w AS (
  SELECT doc_id, text, {_WORDS_SQL} AS ws,
    length(text) AS n_chars, CAST(len({_WORDS_SQL}) AS INTEGER) AS n_words
  FROM documents
)
SELECT doc_id AS id, n_chars, n_words,
  round(length(regexp_replace(lower(text), '\\s+', '', 'g')) / greatest(n_words, 1), 4) AS mean_word_len,
  round(len(list_filter(ws, x -> list_contains({_STOP_LIST_SQL}, x))) / greatest(n_words, 1), 4) AS stopword_ratio,
  round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / greatest(n_chars, 1), 4) AS punct_ratio,
  round(length(regexp_replace(text, '[^A-Z]', '', 'g')) / greatest(n_chars, 1), 4) AS upper_ratio,
  (n_words >= 10
   AND round(length(regexp_replace(lower(text), '\\s+', '', 'g')) / greatest(n_words, 1), 4) BETWEEN 2 AND 12
   AND round(len(list_filter(ws, x -> list_contains({_STOP_LIST_SQL}, x))) / greatest(n_words, 1), 4) >= 0.01) AS keep
FROM w""",
)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ts.quality_scores(T(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select(
        "id",
        F.col("n_chars").cast("int").alias("n_chars"),
        "n_words",
        "mean_word_len",
        "stopword_ratio",
        "punct_ratio",
        "upper_ratio",
        "keep",
    )


_LANG_COUNTS_SQL = ", ".join(
    f"CAST(len(list_filter(ws, x -> list_contains([{', '.join(repr(w) for w in ws_)}], x))) AS INTEGER) AS c_{lang}"
    for lang, ws_ in sorted(ts.STOPWORDS.items())
)


@_q(
    "lang_id",
    f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
c AS (SELECT doc_id, {_LANG_COUNTS_SQL} FROM w),
b AS (SELECT *, greatest(c_de, c_en, c_es, c_fr) AS best FROM c)
SELECT doc_id AS id,
  CASE WHEN c_de > 0 AND c_de = best THEN 'de'
       WHEN c_en > 0 AND c_en = best THEN 'en'
       WHEN c_es > 0 AND c_es = best THEN 'es'
       WHEN c_fr > 0 AND c_fr = best THEN 'fr'
       ELSE 'und' END AS pred_lang,
  best AS marker_hits
FROM b""",
)
def q_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.lang_id(T(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "corpus_health",
    f"""
WITH w AS (
  SELECT doc_id, text, {_WORDS_SQL} AS ws,
    length(text) AS n_chars, CAST(len({_WORDS_SQL}) AS INTEGER) AS n_words
  FROM documents
), lc AS (
  SELECT doc_id, n_chars, n_words,
    (n_words >= 10
     AND round(length(regexp_replace(lower(text), '\\s+', '', 'g')) / greatest(n_words, 1), 4) BETWEEN 2 AND 12
     AND round(len(list_filter(ws, x -> list_contains({_STOP_LIST_SQL}, x))) / greatest(n_words, 1), 4) >= 0.01) AS keep,
    {_LANG_COUNTS_SQL}
  FROM w
), b AS (
  SELECT *, greatest(c_de, c_en, c_es, c_fr) AS best FROM lc
), lang AS (
  SELECT doc_id, n_chars, n_words, keep,
    CASE WHEN c_de > 0 AND c_de = best THEN 'de'
         WHEN c_en > 0 AND c_en = best THEN 'en'
         WHEN c_es > 0 AND c_es = best THEN 'es'
         WHEN c_fr > 0 AND c_fr = best THEN 'fr'
         ELSE 'und' END AS pred_lang
  FROM b
)
SELECT pred_lang, count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  CAST(sum(n_words) AS BIGINT) AS total_words,
  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_quality
FROM lang GROUP BY pred_lang""",
)
def q_corpus_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus health dashboard: per predicted language, document count,
    char/word volume and the quality-gate pass count — the one-stop
    rollup a curation run reports. Composes lang_id + quality_scores
    (one join on id, one groupBy)."""
    docs = T(spark, sf_dir, "documents")
    lang = ts.lang_id(docs, "doc_id", "text")
    qual = ts.quality_scores(docs, "doc_id", "text")
    return (
        lang.join(qual, "id")
        .groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep_quality"),
        )
    )


@_q(
    "fingerprint_summary",
    f"""
WITH w AS (
  SELECT doc_id, {_WORDS_SQL} AS ws FROM documents
), sh AS (
  SELECT doc_id, i AS pos,
    sha256(array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + 3 AS BIGINT)], ' ')) AS h
  FROM w, UNNEST(generate_series(0, greatest(len(ws) - 3, 0))) AS t(i)
  WHERE length(array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + 3 AS BIGINT)], ' ')) > 0
), win AS (
  SELECT doc_id, pos,
    min(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fingerprint
  FROM sh
), fp AS (
  SELECT DISTINCT doc_id, fingerprint FROM win WHERE pos >= 3
)
SELECT doc_id AS id, count(*) AS n_fingerprints, min(fingerprint) AS min_fingerprint
FROM fp GROUP BY doc_id""",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.fingerprint_summary(T(spark, sf_dir, "documents"), "doc_id", "text", k=3, window=4)


@_q(
    "tfidf_top_terms",
    f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
wd AS (SELECT doc_id, u.w AS term FROM w, UNNEST(ws) AS u(w) WHERE length(u.w) > 0),
tf AS (SELECT doc_id AS id, term, count(*) AS tf FROM wd GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
s AS (
  SELECT id, term, tf, df, tf * (n.n / df) AS score
  FROM tf JOIN dfq USING (term), n
), r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY id ORDER BY score DESC, term) AS BIGINT) AS rk
  FROM s
)
SELECT id, term, tf, df, round(score, 6) AS score, rk FROM r WHERE rk <= 5""",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-5 TF-IDF terms (ratio-idf mode: exact integer-ratio
    arithmetic, cross-engine reproducible — the log variant is a flag)."""
    return ts.tfidf_top_terms(T(spark, sf_dir, "documents"), "doc_id", "text", k=5)


_SLICE_BUCKET_SQL = (
    "array_to_string(list_transform({side}.embedding[{lo}:{hi}], "
    "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"
)


def _multiprobe_oracle(k: int, n_bits: int, n_tables: int) -> str:
    cond = " OR ".join(
        f"{_SLICE_BUCKET_SQL.format(side='q', lo=t * n_bits + 1, hi=(t + 1) * n_bits)}"
        f" = {_SLICE_BUCKET_SQL.format(side='c', lo=t * n_bits + 1, hi=(t + 1) * n_bits)}"
        for t in range(n_tables)
    )
    cos = _COSINE_SQL.replace("a.embedding", "q.embedding").replace(
        "b.embedding", "c.embedding"
    )
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cosine
  FROM embeddings q JOIN embeddings c
    ON q.vec_id < 5 AND c.vec_id != q.vec_id AND ({cond})
)
SELECT query_id, neighbor_id, cosine,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {k}"""


def _recall_curve_oracle(k: int, n_bits: int, n_tables_list: tuple[int, ...], n_q: int) -> str:
    """Oracle twin of sim.ann_recall_curve: exact top-k truth, per-table
    multiprobe ANN top-k, hits-join recall — all recomputed in SQL."""
    cos = _COSINE_SQL.replace("a.embedding", "q.embedding").replace(
        "b.embedding", "c.embedding"
    )
    ann_ctes = []
    for t in n_tables_list:
        cond = " OR ".join(
            f"{_SLICE_BUCKET_SQL.format(side='q', lo=i * n_bits + 1, hi=(i + 1) * n_bits)}"
            f" = {_SLICE_BUCKET_SQL.format(side='c', lo=i * n_bits + 1, hi=(i + 1) * n_bits)}"
            for i in range(t)
        )
        ann_ctes.append(
            f"""ann{t} AS (
  SELECT {t} AS n_tables, query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cosine
    FROM embeddings q JOIN embeddings c
      ON q.vec_id < {n_q} AND c.vec_id != q.vec_id AND ({cond})
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) <= {k}
)"""
        )
    union = "\nUNION ALL ".join(f"SELECT * FROM ann{t}" for t in n_tables_list)
    return f"""
WITH truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cosine
    FROM embeddings q JOIN embeddings c ON q.vec_id < {n_q} AND c.vec_id != q.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) <= {k}
),
{",".join(ann_ctes)},
ann AS ({union}),
hits AS (
  SELECT n_tables, count(*) AS n_hit
  FROM ann JOIN truth USING (query_id, neighbor_id) GROUP BY 1
),
tot AS (SELECT count(*) AS n_truth FROM truth)
SELECT n_tables, round(n_hit / n_truth, 6) AS recall FROM hits, tot"""


@_q("ann_recall_curve", _recall_curve_oracle(k=10, n_bits=8, n_tables_list=(1, 2, 3), n_q=50))
def q_ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall adequacy measurement for multi-probe ANN (the number the
    superset-recall property test can't give): recall@10 of 1/2/3 probe
    tables vs exact brute-force truth over 50 query vectors. On this
    near-random corpus the measured curve (0.016/0.034/0.046) matches
    sign-LSH theory ((1-θ/π)^8 at median top-10 θ≈73°) and composes
    near-additively across tables — the basis for the n_tables=3
    default; see sim.ann_recall_curve docstring for the high-cosine
    operating-point numbers."""
    emb = T(spark, sf_dir, "embeddings")
    return sim.ann_recall_curve(
        emb, emb.filter(F.col("vec_id") < 50), k=10, n_bits=8, n_tables_list=(1, 2, 3)
    )


@_q("ann_lsh_multiprobe", _multiprobe_oracle(k=5, n_bits=8, n_tables=3))
def q_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table sign-LSH ANN: 3 tables over disjoint coordinate
    slices, union-of-buckets candidates, exact cosine + top-k — the
    recall dial over the single-table ann_lsh_bucketed."""
    emb = T(spark, sf_dir, "embeddings")
    return sim.ann_lsh_multiprobe(
        emb, emb.filter(F.col("vec_id") < 5), k=5, n_bits=8, n_tables=3
    )


# --- relational breadth: more TPC-H shapes --------------------------------


@_q(
    "q6_forecast_revenue",
    """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + aggregate — every predicate reaches the
    parquet scan (PushedFilters), zero shuffles beyond the final agg."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@_q(
    "q4_order_priority",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority""",
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS as a left-semi join (the C6 semi-join shape
    at relational breadth; the driver's lineitem has no commit/receipt
    dates, so the late-delivery predicate becomes returned-items)."""
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    late = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_q(
    "distinct_suppliers_by_part",
    """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45' AND p_size IN (1, 4, 9, 14, 19)
GROUP BY p_brand, p_size""",
)
def q16ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped distinct-aggregation: NOT-equal + IN pushdown, then
    count(DISTINCT) per group (the one distinct-agg in SURVEY D-notes)."""
    part = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45") & F.col("p_size").isin(1, 4, 9, 14, 19)
    )
    li = T(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "q18_large_orders",
    """
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200
)
SELECT c_custkey, o_orderkey, o_totalprice, total_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING subquery -> join back to orders/customer
    (aggregate-then-join keeps the big side small before the joins)."""
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 200)
        .select("l_orderkey", F.round("raw_qty", 2).alias("total_qty"))
    )
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


_REP_WORDS_SQL = _WORDS_SQL.replace("lower(text)", "lower(rtext)")


@_q(
    "repetition_scores",
    f"""
WITH r AS (
  SELECT doc_id,
    substr(text, 1, 40) || chr(10) || substr(text, 1, 40) || chr(10)
      || substr(text, 41, 2000) AS rtext
  FROM documents
), s AS (
  SELECT doc_id, string_split(rtext, chr(10)) AS lines, {_REP_WORDS_SQL} AS ws
  FROM r
), b AS (
  SELECT doc_id, lines, ws,
    list_transform(range(1, greatest(len(ws), 1)), i -> ws[i] || ' ' || ws[i + 1]) AS bg
  FROM s
), m AS (
  SELECT doc_id, lines, ws,
    coalesce(list_max(list_transform(list_distinct(bg),
      x -> len(list_filter(bg, y -> y = x)))), 0) AS mode_n
  FROM b
)
SELECT doc_id AS id,
  round((len(lines) - len(list_distinct(lines))) / greatest(len(lines), 1), 4) AS dup_line_frac,
  round(2 * mode_n / greatest(len(ws), 1), 4) AS top_bigram_frac,
  ((len(lines) - len(list_distinct(lines))) / greatest(len(lines), 1) < 0.3
   AND 2 * mode_n / greatest(len(ws), 1) < 0.18) AS keep_repetition
FROM m""",
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021 §A1.3: duplicate-line
    fraction, top-bigram word fraction) over a corpus with injected line
    duplication so the dup path is actually exercised."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.substring("text", 1, 40),
            F.substring("text", 1, 40),
            F.substring("text", 41, 2000),
        ).alias("rtext"),
    )
    return ts.repetition_scores(docs, "doc_id", "rtext")


@_q(
    "embedding_centroids",
    f"""
WITH e AS (
  SELECT {_BUCKET_SQL.format(side='embeddings').replace('[1:8]', '[1:4]')} AS bucket,
    embedding[CAST(i AS BIGINT)]::DOUBLE AS v, i AS pos
  FROM embeddings, UNNEST(range(1, 65)) AS t(i)
), c AS (
  SELECT bucket, pos, avg(v::DOUBLE) AS m, count(*) AS n
  FROM e GROUP BY 1, 2
)
SELECT bucket,
  CAST(min(n) AS BIGINT) AS n_members,
  array_to_string(list(CAST(round(m * 1000000) AS BIGINT) ORDER BY pos), ',') AS centroid_micro
FROM c GROUP BY bucket""",
)
def q_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket embedding centroids (the vector-mean primitive Spark
    lacks natively — the assignment step of k-means / cluster summaries
    for embedding dedup): posexplode -> (bucket, dim) partial-agg mean
    -> reassemble ordered via sort_array. Values serialized as exact
    micro-units for the cross-engine hash."""
    emb = T(spark, sf_dir, "embeddings")
    e = emb.select(
        sim.sign_bucket("embedding", 4).alias("bucket"),
        F.posexplode("embedding").alias("pos", "v"),
    )
    c = e.groupBy("bucket", "pos").agg(
        F.avg(F.col("v").cast("double")).alias("m"), F.count(F.lit(1)).alias("n")
    )
    return (
        c.groupBy("bucket")
        .agg(
            F.min("n").alias("n_members"),
            F.sort_array(F.collect_list(F.struct("pos", "m"))).alias("pl"),
        )
        .select(
            "bucket",
            "n_members",
            F.concat_ws(
                ",", F.transform("pl", lambda x: F.round(x["m"] * 1e6).cast("long"))
            ).alias("centroid_micro"),
        )
    )


@_q(
    "q14_type_revenue_share",
    """
SELECT round(100.0 * sum(CASE WHEN p_type = 'ECONOMY'
    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
  / sum(l_extendedprice * (1 - l_discount)), 4) AS economy_share
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-03-01'""",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation ratio (CASE inside SUM)
    over a broadcast part join."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-03-01").cast("timestamp"))
    )
    part = T(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("economy_share")
        )
    )


@_q(
    "q19_or_of_ands",
    """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive predicates across both
    join sides — the classic OR-pushdown/CNF-conversion stressor."""
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@_q(
    "q12_priority_lines",
    """
SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus""",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: pivoted conditional counts after an equi-join."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = T(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@_q(
    "q17_small_quantity_revenue",
    """
WITH pa AS (
  SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_weekly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa ON pa.l_partkey = lineitem.l_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < half_avg""",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average)
    decorrelated into an aggregate-then-join — the classic rewrite that
    keeps the plan a pair of hash joins instead of a per-row subquery."""
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_weekly"))
    )


@_q(
    "canonical_urls",
    """
SELECT doc_id,
  'https://src' || CAST(doc_id % 20 AS VARCHAR) || '.example.com/doc/' || doc_id
    || '?id=' || doc_id AS canonical_url
FROM documents""",
)
def q_canonical_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (dedup-key normalization): mixed-case
    scheme/host, default port, tracking params and fragment are all
    normalized away. The oracle recomputes the EXPECTED canonical form
    independently from the components — not by mirroring the regex
    chain — so it checks the semantics, not the implementation."""
    messy = F.concat(
        F.lit("HTTPS://SRC"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit(".Example.COM:443/doc/"),
        F.col("doc_id"),
        F.lit("?utm_source=x&id="),
        F.col("doc_id"),
        F.lit("&utm_campaign=y#frag"),
    )
    return T(spark, sf_dir, "documents").select(
        "doc_id", ts.canonicalize_url(messy).alias("canonical_url")
    )


@_q(
    "containment_pairs",
    f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, substr(text, 1, CAST(floor(n_chars / 2) AS BIGINT)) FROM documents
), w AS (
  SELECT id, {_WORDS_SQL} AS ws FROM corpus
), sh AS (
  SELECT id, i AS pos,
    sha256(array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + 3 AS BIGINT)], ' ')) AS h
  FROM w, UNNEST(generate_series(0, greatest(len(ws) - 3, 0))) AS t(i)
  WHERE length(array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + 3 AS BIGINT)], ' ')) > 0
), win AS (
  SELECT id, pos,
    min(h) OVER (PARTITION BY id ORDER BY pos ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fingerprint
  FROM sh
), fp AS (
  SELECT DISTINCT id, fingerprint FROM win WHERE pos >= 3
), sizes AS (
  SELECT id, count(*) AS n_fp FROM fp GROUP BY id
), inter AS (
  SELECT a.id AS id_small, b.id AS id_big, count(*) AS n
  FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint AND a.id != b.id
  GROUP BY 1, 2
)
SELECT id_small, id_big, round(n / s.n_fp, 6) AS containment
FROM inter JOIN sizes s ON s.id = id_small
WHERE round(n / s.n_fp, 6) >= 0.6""",
)
def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment detection (winnowing fingerprint overlap /
    |fp(small)|): half-prefix fragments of every document are injected
    as extra docs, and the operator must find fragment-in-original
    containments that symmetric Jaccard would score low."""
    docs = T(spark, sf_dir, "documents")
    corpus = docs.select(F.col("doc_id").alias("id"), "text").unionByName(
        docs.select(
            (F.col("doc_id") + 100000).alias("id"),
            F.substring("text", 1, F.floor(F.col("n_chars") / 2).cast("int")).alias("text"),
        )
    )
    return ts.containment_pairs(corpus, "id", "text", k=3, window=4, threshold=0.6)


@_q(
    "stratified_sample",
    """
SELECT doc_id, source FROM documents
WHERE CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 <
  CASE source WHEN 'src0' THEN 1000000 WHEN 'src1' THEN 500000
    WHEN 'src2' THEN 250000 ELSE 100000 END""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-gated stratified sampling: per-source keep
    rates (100%/50%/25%, 10% default) as a pure function of the row id —
    identical samples across runs, partitionings and cluster sizes
    (resumable pipelines cannot tolerate task-order-dependent RNG)."""
    docs = T(spark, sf_dir, "documents")
    out = ts.stratified_sample(
        docs, "source", {"src0": 1.0, "src1": 0.5, "src2": 0.25}, "doc_id", default_rate=0.1
    )
    return out.select("doc_id", "source")


def _ngram_cte(alias: str, source: str, words_expr: str, n: int) -> str:
    return f"""{alias} AS (
  SELECT DISTINCT id,
    array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + {n} AS BIGINT)], ' ') AS shingle
  FROM (SELECT {source}, {words_expr} AS ws FROM documents {{where}}) src,
    UNNEST(generate_series(0, greatest(len(ws) - {n}, 0))) AS t(i)
  WHERE length(array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + {n} AS BIGINT)], ' ')) > 0
)"""


_BENCH_WORDS_SQL = _WORDS_SQL.replace("lower(text)", "lower(substr(text, 1, 200))")


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
    "top_ngrams",
    f"""
WITH {_ngram_cte('sh', 'doc_id AS id', _WORDS_SQL, 2).format(where='')},
d AS (SELECT shingle AS ngram, count(*) AS df_docs FROM sh GROUP BY 1)
SELECT ngram, df_docs FROM d ORDER BY df_docs DESC, ngram LIMIT 20""",
)
def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram document-frequency top-20 — the boilerplate
    discovery / max_df tuning surface."""
    return dd.top_ngrams(T(spark, sf_dir, "documents"), "doc_id", "text", n=2, k=20)


@_q(
    "q7_nation_volume",
    """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS BIGINT) AS l_year,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2') AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3""",
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two roles of the same dimension (supplier nation
    vs customer nation) with a cross-role inequality, yearly rollup."""
    li = T(spark, sf_dir, "lineitem")
    supp = T(spark, sf_dir, "supplier")
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@_q(
    "q15_top_supplier",
    """
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)""",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: view + scalar max subquery -> the top revenue
    supplier(s). The scalar lands as a one-row broadcast, never a
    driver collect."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_rev"
        )
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    supp = T(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@_q(
    "q22_idle_customers",
    """
WITH ab AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer, ab
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey""",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar average subquery + NOT EXISTS anti-join
    (above-average-balance customers with no urgent orders)."""
    cust = T(spark, sf_dir, "customer")
    ab = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    urgent = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# --- TPC-H optimizer-shape completion (q2/q8/q9/q11/q13/q16/q20/q21) -------
# Completes the 22-query optimizer-shape suite.  The driver tables lack
# partsupp and l_receiptdate/l_commitdate, so the four shapes that need
# them (q2/q11/q16/q20) derive the part-supplier relation from lineitem,
# and q21's "kept waiting" predicate maps to l_returnflag = 'R'.  The
# optimizer shape under test — correlated min, scalar-threshold HAVING,
# left-join histogram, distinct-count + NOT IN, nested semi-join, double
# EXISTS/NOT EXISTS self-join — is preserved exactly.


@_q(
    "q2_min_cost_supplier",
    """
WITH pscost AS (
  SELECT l_partkey, l_suppkey,
    round(min(l_extendedprice / l_quantity), 2) AS unit_cost
  FROM lineitem GROUP BY 1, 2
),
eligible AS (
  SELECT p_partkey, s_name, n_name, unit_cost
  FROM pscost
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE' AND p_size = 5
)
SELECT p_partkey, s_name, n_name, unit_cost FROM eligible e
WHERE unit_cost = (SELECT min(unit_cost) FROM eligible m
                   WHERE m.p_partkey = e.p_partkey)""",
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part within a region via a
    correlated-min subquery.  The part-supplier cost relation is derived
    from lineitem (min observed unit price per (part, supplier)); the
    correlated min collapses to one window pass over the already-joined
    frame — a single shuffle on p_partkey instead of a re-join, and all
    four dimension joins broadcast."""
    from pyspark.sql.window import Window

    li = T(spark, sf_dir, "lineitem")
    pscost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 2).alias(
            "unit_cost"
        )
    )
    part = T(spark, sf_dir, "part").filter(F.col("p_size") == 5)
    supp = T(spark, sf_dir, "supplier")
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        pscost.join(F.broadcast(part), pscost.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), pscost.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("p_partkey", "s_name", "n_name", "unit_cost")
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("mc", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("mc"))
        .drop("mc")
    )


@_q(
    "q8_market_share",
    """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
  round(sum(CASE WHEN n2.n_name = 'NATION_1'
    THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS nation_vol,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_vol,
  round(round(sum(CASE WHEN n2.n_name = 'NATION_1'
      THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
    / round(sum(l_extendedprice * (1 - l_discount)), 2), 6) AS mkt_share
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region ON r_regionkey = n1.n_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
JOIN part ON p_partkey = l_partkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
GROUP BY 1""",
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share of a part type within a
    region, by order year.  The share divides the two ROUNDED sums so
    the quotient is a pure function of values both engines agree on
    (raw double sums differ in the last ulp with partition order)."""
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    supp = T(spark, sf_dir, "supplier")
    part = T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
    )
    grouped = joined.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0.0))),
            2,
        ).alias("nation_vol"),
        F.round(F.sum(rev), 2).alias("total_vol"),
    )
    return grouped.select(
        "o_year",
        "nation_vol",
        "total_vol",
        F.round(F.col("nation_vol") / F.col("total_vol"), 6).alias("mkt_share"),
    )


@_q(
    "q9_product_type_profit",
    """
SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
  round(sum(l_extendedprice * (1 - l_discount)
            - 0.1 * p_retailprice * l_quantity), 2) AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2""",
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line by supplier nation and
    year.  Supply cost is modeled as 10% of retail price per unit (the
    driver tables have no partsupp); part/supplier/nation dims all
    broadcast, so the only shuffle is the final two-key aggregate."""
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = T(spark, sf_dir, "supplier")
    nation = T(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@_q(
    "q11_important_parts",
    """
WITH val AS (
  SELECT l_partkey,
    sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  GROUP BY 1
)
SELECT l_partkey, round(cents / 100.0, 2) AS part_value FROM val
WHERE cents * (SELECT count(*) FROM val) > 2 * (SELECT sum(cents) FROM val)""",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value with a global scalar-subquery
    threshold (parts worth > 2x the mean part value — scale-invariant,
    so the query returns rows at every SF, unlike a fixed fraction of
    the total).  The scalar lands as a one-row broadcast cross join —
    never a driver collect — and the boundary test is all-integer
    (cents * n_parts > 2 * total_cents), exact in both engines where
    double summation order can flip round()'s last cent."""
    li = T(spark, sf_dir, "lineitem")
    supp = T(spark, sf_dir, "supplier")
    nation = T(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            ).alias("cents")
        )
    )
    thr = val.agg(
        F.sum("cents").alias("total_cents"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        val.crossJoin(F.broadcast(thr))
        .filter(F.col("cents") * F.col("n_parts") > 2 * F.col("total_cents"))
        .select("l_partkey", F.round(F.col("cents") / 100.0, 2).alias("part_value"))
    )


@_q(
    "q13_order_count_distribution",
    """
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY 1
)
SELECT c_count, count(*) AS custdist FROM c_orders GROUP BY 1""",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count histogram through a
    filtered LEFT JOIN (customers with zero qualifying orders must
    appear in the c_count = 0 bucket — an inner join would drop them).
    All-integer output, exactly portable."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    c_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_q(
    "q16_supplier_part_variety",
    """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 2, 3, 4, 5)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3""",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier variety per part attribute triple with
    a NOT IN exclusion list.  The exclusion is a broadcast LEFT ANTI
    join (s_suppkey is non-null so NOT IN and anti-join agree), and the
    distinct count shuffles once on the attribute triple."""
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    bad = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "q20_excess_shippers",
    """
WITH shipped AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
)
SELECT s_suppkey, s_name FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
  AND s_suppkey IN (
    SELECT l_suppkey FROM shipped JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'small%' AND qty > 30)""",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved excess volume of a named
    part family in one year — a nested aggregate semi-join.  Quantities
    are small integers stored as doubles, so the sum is exact in both
    engines and the > 30 threshold is portable."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = T(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    excess = (
        shipped.join(F.broadcast(part), shipped.l_partkey == part.p_partkey)
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
    )
    supp = T(spark, sf_dir, "supplier")
    nation = T(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"
        )
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(excess, supp.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@_q(
    "q21_waiting_suppliers",
    """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY 1""",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-blame self-join — lines that are 'late'
    (mapped to l_returnflag = 'R'; the driver tables have no
    receipt/commit dates) on multi-supplier finished orders where no
    OTHER supplier was late.  EXISTS/NOT EXISTS become left-semi /
    left-anti self-joins on l_orderkey with a supplier inequality in
    the join condition — no cartesian expansion."""
    li = T(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = T(spark, sf_dir, "supplier")
    nation = T(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"
        )
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    return (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey, "left_semi")
        .join(
            l2,
            (l1.l_orderkey == F.col("l2_orderkey"))
            & (l1.l_suppkey != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == F.col("l3_orderkey"))
            & (l1.l_suppkey != F.col("l3_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(supp), l1.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --- multimodal plumbing ---------------------------------------------------


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic binary 'assets' derived from documents: payload =
    utf-8 bytes, modality assigned round-robin — the plumbing is real,
    the codec is the stub (multimodal.py)."""
    return T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
    )


@_q(
    "multimodal_metadata",
    """
SELECT doc_id AS asset_id,
  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  sha256(text) AS payload_sha
FROM documents""",
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finetoo_sp_spark.multimodal import asset_metadata

    return asset_metadata(_assets(spark, sf_dir))


def _u32_le_sql(h_expr: str, p: int) -> str:
    """DuckDB expr: little-endian uint32 at byte offset p of hex digest."""
    return " + ".join(
        f"CAST('0x' || substr({h_expr}, {2 * (p + k) + 1}, 2) AS BIGINT) * {256 ** k}"
        for k in range(4)
    )


# fake_features (multimodal.py): digest repeated to dim*4 bytes -> 16
# LE-uint32s, so feature i reads digest byte offset 4*(i % 8).
_FEATURES_U32_SQL = " || ',' || ".join(
    f"CAST(({_u32_le_sql('h', 4 * (i % 8))}) AS VARCHAR)" for i in range(16)
)


@_q(
    "multimodal_features",
    f"""
WITH m AS (
  SELECT doc_id AS asset_id,
    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
    sha256(text) AS h
  FROM documents
)
SELECT asset_id, modality, n_bytes, h AS payload_sha,
  {_FEATURES_U32_SQL} AS features_u32
FROM m""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pseudo-feature extraction with a full value oracle:
    the fake-decode features are dyadic rationals u32/2^32, so projecting
    round(x * 2^32) at the query boundary is EXACT — the DuckDB twin
    recomputes the same uint32s from the sha256 hex digest."""
    from finetoo_sp_spark.multimodal import extract_features

    feat = extract_features(_assets(spark, sf_dir))
    return feat.select(
        "asset_id",
        "modality",
        "n_bytes",
        "payload_sha",
        F.concat_ws(
            ",",
            F.transform("features", lambda x: F.round(x * F.lit(4294967296.0)).cast("long")),
        ).alias("features_u32"),
    )


@_q(
    "pdf_real_extract",
    """
SELECT 'https://pdf.example.com/' || doc_id AS url,
  'real heading ' || doc_id || chr(10) || 'body block for ' || doc_id AS text,
  CAST(2 AS BIGINT) AS n_blocks,
  CAST(length('real heading ' || doc_id || 'body block for ' || doc_id) AS BIGINT)
    AS content_chars
FROM documents WHERE doc_id < 200""",
)
def q_pdf_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL (spec-conformant, Flate-compressed) PDF payloads through the
    layout path under a full value oracle: make_real_pdf writes actual
    PDF 1.4 files per doc, the vendored pure-stdlib extractor
    (extraction/pdfmini.py) inflates/parses them inside the Arrow
    kernel, and the oracle recomputes the expected text from the
    fragment formula alone — it never sees a PDF byte."""
    import pandas as pd  # noqa: PLC0415

    from finetoo_sp_spark.extraction.pdf import extract_pages_any

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select("doc_id")

    def gen(batches):
        from finetoo_sp_spark.extraction.pdfmini import make_real_pdf

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                payload = make_real_pdf(
                    [
                        (0, 72.0, 700.0, f"real heading {i}"),
                        (0, 72.0, 600.0, f"body block for {i}"),
                    ]
                )
                rows.append((f"https://pdf.example.com/{i}", payload))
            yield pd.DataFrame(rows, columns=["url", "html"])

    pages = docs.mapInPandas(gen, "url string, html binary")
    out = extract_pages_any(pages)
    return out.select("url", "text", "n_blocks", "content_chars")


@_q(
    "multimodal_image_stats",
    """
SELECT i AS asset_id,
  CAST(16 + i % 8 AS BIGINT) AS width,
  CAST(12 + i % 5 AS BIGINT) AS height,
  CAST(3 AS BIGINT) AS channels,
  sum((i + 3*r + 5*c) % 256) AS sum_r,
  sum((i + 3*r + 5*c + 11) % 256) AS sum_g,
  sum((i + 3*r + 5*c + 22) % 256) AS sum_b
FROM range(0, 64) t(i), range(0, 16) rr(r), range(0, 23) cc(c)
WHERE r < 12 + i % 5 AND c < 16 + i % 8
GROUP BY i""",
)
def q_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under a per-pixel-exact oracle: synthetic PNGs
    (closed-form pixels, every scanline filter type across the corpus)
    are decoded by the pure-stdlib codec inside the Arrow kernel; the
    DuckDB twin recomputes the per-channel pixel SUMS from the pixel
    formula alone — it never sees a PNG, so agreement proves zlib
    inflate + de-filtering + geometry are all byte-correct."""
    from finetoo_sp_spark.datagen import gen_image_assets
    from finetoo_sp_spark.multimodal import image_stats

    return image_stats(gen_image_assets(spark, 64))


@_q(
    "multimodal_resize",
    """
SELECT i AS asset_id,
  CAST(12 AS BIGINT) AS width,
  CAST(8 AS BIGINT) AS height,
  CAST(3 AS BIGINT) AS channels,
  sum((i + 3*((r*(12 + i%5))//8) + 5*((c*(16 + i%8))//12)) % 256) AS sum_r,
  sum((i + 3*((r*(12 + i%5))//8) + 5*((c*(16 + i%8))//12) + 11) % 256) AS sum_g,
  sum((i + 3*((r*(12 + i%5))//8) + 5*((c*(16 + i%8))//12) + 22) % 256) AS sum_b
FROM range(0, 64) t(i), range(0, 8) rr(r), range(0, 12) cc(c)
GROUP BY i""",
)
def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode + nearest-neighbor resize under a per-pixel-exact
    oracle: the kernel decodes each synthetic PNG and remaps it to an
    8x12 grid with the integer floor rule src = (dst * src_dim) //
    dst_dim; the DuckDB twin recomputes the resized per-channel sums
    from the pixel formula and the same floor rule — it never sees a
    PNG, so agreement proves decode AND the resize geometry."""
    from finetoo_sp_spark.datagen import gen_image_assets
    from finetoo_sp_spark.multimodal import resize_images

    return resize_images(gen_image_assets(spark, 64), out_h=8, out_w=12)


@_q(
    "frame_sample_plan",
    """
SELECT doc_id AS asset_id, CAST(f AS BIGINT) AS frame_idx
FROM documents,
  UNNEST(generate_series(0, CAST(doc_id % 50 AS BIGINT), 10)) AS t(f)""",
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (multimodal.frame_sample_plan):
    every-Nth-frame explode from a declared frame count — the partition/
    explode shape is real, the decode is the documented stub. Oracle =
    generate_series over the same declared counts."""
    from finetoo_sp_spark.multimodal import frame_sample_plan

    assets = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        (F.col("doc_id") % 50 + 1).cast("long").alias("n_frames"),
    )
    return frame_sample_plan(assets, every_n=10)


@_q(
    "host_page_stats",
    """
WITH u AS (
  SELECT 'src' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS host,
    n_chars, doc_id
  FROM documents
)
SELECT host, count(*) AS n_pages, CAST(sum(n_chars) AS BIGINT) AS total_chars,
  min(doc_id) AS first_doc
FROM u GROUP BY host""",
)
def q_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host rollup through the salted two-phase aggregation
    (operators/skew.py) — identical results to a naive groupBy, but the
    reduce-side hot key is split n_salts ways."""
    from finetoo_sp_spark.operators.skew import salted_agg

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    per_page = pages.select(
        F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host"),
        F.col("doc_id"),
    ).join(
        T(spark, sf_dir, "documents").select("doc_id", "n_chars"), "doc_id"
    )
    return salted_agg(
        per_page,
        "host",
        {
            "n_pages": (F.count(F.lit(1)), "sum"),
            "total_chars": (F.sum("n_chars"), "sum"),
            "first_doc": (F.min("doc_id"), "min"),
        },
        n_salts=16,
        salt_on="doc_id",
    )


@_q(
    "typed_fields",
    """
SELECT
  'https://' || source || '.example.com/doc/' || doc_id AS url,
  'document ' || doc_id || ' from ' || source AS title,
  'summary of document ' || doc_id || ' from ' || source AS meta_description,
  'https://' || source || '.example.com/doc/' || doc_id AS canonical_url,
  TIMESTAMP '2025-01-01 00:00:00' + to_seconds(doc_id) AS published_at,
  'author ' || doc_id AS author,
  lang AS lang_attr
FROM documents""",
)
def q_typed_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-rule-driven typed-field mapping (extraction/fields.py): the
    declared rule set compiles to pure Catalyst regexp_extract + cast
    expressions; the oracle recomputes every field from the template."""
    from finetoo_sp_spark.extraction.fields import map_fields

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    return map_fields(pages)


@_q(
    "traverse_links_2hop",
    """
WITH u AS (
  SELECT doc_id,
    'https://src' || CAST(doc_id % 20 AS VARCHAR) || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
),
hop1 AS (
  SELECT s.url AS origin, t.url AS dst, s.doc_id AS sid, t.doc_id AS tid
  FROM u s JOIN u t ON t.doc_id IN (CAST(floor(s.doc_id / 2) AS BIGINT), CAST(floor(s.doc_id / 3) AS BIGINT))
  WHERE s.doc_id BETWEEN 100 AND 104
),
hop2 AS (
  SELECT h.origin, t.url AS dst
  FROM hop1 h JOIN u t ON t.doc_id IN (CAST(floor(h.tid / 2) AS BIGINT), CAST(floor(h.tid / 3) AS BIGINT))
)
SELECT origin, dst, 1 AS depth, origin || ' -> ' || dst AS provenance FROM (SELECT DISTINCT origin, dst FROM hop1)
UNION ALL
SELECT origin, dst, 2, origin || ' -> ' || dst FROM (SELECT DISTINCT origin, dst FROM hop2)""",
)
def q_traverse_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop TRAVERSE over real extracted LINKS_TO edges (spec:
    proto/operations.proto:135-152 max_depth — the C++ executor is
    1-hop only; here depth=2 by iterated equi-join). The oracle derives
    both hops from the docpages parent-link rule."""
    from finetoo_sp_spark.extraction.graph import build_web_graph

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    g = build_web_graph(pages)
    start = pages.filter(F.col("doc_id").between(100, 104)).select("url")
    out = op_traverse(g, "LINKS_TO", start_ids=start, max_depth=2)
    return out.dropDuplicates(["origin", "dst", "depth"])


@_q(
    "web_link_bom",
    """
WITH l AS (
  SELECT doc_id AS src, CAST(floor(doc_id / 2) AS BIGINT) AS t FROM documents
  UNION ALL
  SELECT doc_id, CAST(floor(doc_id / 3) AS BIGINT) FROM documents
)
SELECT 'https://src' || CAST(t % 20 AS VARCHAR) || '.example.com/doc/' || CAST(t AS VARCHAR) AS part,
  count(*) AS quantity,
  count(DISTINCT src) AS n_sources
FROM l GROUP BY t""",
)
def q_web_bom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOM over real extracted LINKS_TO edges (reference: INSERT-count
    BOM, bom_exporter.cc:36-89): per linked page, link count + distinct
    linking pages. The oracle recomputes the expectation from the
    docpages template's parent-link rule."""
    from finetoo_sp_spark.extraction.graph import build_web_graph
    from finetoo_sp_spark.operators.divergence import bom_report

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    g = build_web_graph(pages)
    bom = bom_report(g, edge_type="LINKS_TO")
    return bom.select(
        "part", "quantity", F.size("sources").cast("long").alias("n_sources")
    )


@_q(
    "url_analytics",
    """
WITH u AS (
  SELECT doc_id,
    'https://' || source || '.example.com/doc/' || doc_id AS url
  FROM documents
)
SELECT doc_id,
  regexp_extract(url, 'https?://([^/]+)', 1) AS host,
  regexp_extract(url, '\\.([a-z]+)(/|$)', 1) AS tld,
  CAST(length(regexp_replace(regexp_replace(url, 'https?://[^/]+', ''), '[^/]', '', 'g')) AS INTEGER) AS path_depth,
  url LIKE 'https://%' AS is_https
FROM u""",
)
def q_url_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition as pure column regexps (host / tld / path depth /
    scheme) — the per-URL feature set for domain-level corpus policies."""
    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    path = F.regexp_replace("url", r"https?://[^/]+", "")
    return pages.select(
        "doc_id",
        F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host"),
        F.regexp_extract("url", r"\.([a-z]+)(/|$)", 1).alias("tld"),
        F.length(F.regexp_replace(path, r"[^/]", "")).alias("path_depth"),
        F.col("url").startswith("https://").alias("is_https"),
    )


# --- sinks / lineage / PDF / reference-parity operators -------------------
# (the SURVEY §2 rows that were fixture-only in round 1: A6-A10, C4, D5,
#  D7, E2, F2, F9 — each now has a queries() entry + DuckDB oracle.)

_SANITIZE_SQL = (
    "regexp_replace(regexp_replace({x}, '[\\n\\t\\r]', ' ', 'g'), "
    "'[^\\x20-\\x7E]', '', 'g')"
)


def _tmp_out(name: str) -> str:
    import os
    import shutil
    import tempfile

    path = os.path.join(tempfile.gettempdir(), f"finetoo_q_{name}")
    shutil.rmtree(path, ignore_errors=True)
    return path


def _blocks_cte(where: str = "doc_id >= 0") -> str:
    """DuckDB CTE reproducing the docpages template's fixed 10-block
    decomposition (empirically pinned by tests/test_extract_spark.py and
    the extract_block_stats oracle): (url, block_id, tag, btext) rows."""
    rows = [
        (3, "title", "'document ' || doc_id || ' from ' || source"),
        (9, "li", "'home'"),
        (11, "li", "source"),
        (13, "li", "'related'"),
        (15, "li", "'more'"),
        (17, "li", "'about'"),
        (22, "h1", "'heading for document ' || doc_id"),
        (24, "p", "trim(regexp_replace(text, '\\s+', ' ', 'g'))"),
        (26, "p", "'short teaser here'"),
        (30, "p", "'terms contact author ' || doc_id"),
    ]
    selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, 'https://' || source || '.example.com/doc/' || doc_id AS url, "
        f"CAST({bid} AS BIGINT) AS block_id, '{tag}' AS tag, {expr} AS btext "
        f"FROM documents WHERE {where}"
        for bid, tag, expr in rows
    )
    return f"blocks AS (\n  {selects}\n)"


@_q(
    "sink_json_roundtrip",
    f"""
SELECT doc_id,
  {_SANITIZE_SQL.format(x="substr(text, 1, 30) || chr(10) || 'café' || chr(9) || 'end'")} AS s
FROM documents""",
)
def q_sink_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 JSON sink with sanitization (reference: bom_exporter.cc:154-219,
    sanitize :16-28): write JSON lines with non-printables injected, read
    the files back; the oracle recomputes the sanitized strings."""
    from finetoo_sp_spark.operators.sinks import write_json

    df = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.substring("text", 1, 30), F.lit("\ncafé\tend")).alias("s"),
    )
    path = _tmp_out("sink_json")
    write_json(df, path)
    return spark.read.schema("doc_id LONG, s STRING").json(path)


@_q(
    "sink_csv_roundtrip",
    f"""
SELECT doc_id,
  {_SANITIZE_SQL.format(x=chr(39) + 'He said "hi", ' + chr(39) + " || substr(text, 1, 20)")} AS s
FROM documents""",
)
def q_sink_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 CSV sink: quoted RFC-4180 CSV (quoteAll + doubled quotes,
    reference: bom_exporter.cc:221-259) survives embedded quotes and
    commas through a write/read round trip."""
    from finetoo_sp_spark.operators.sinks import write_csv

    df = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit('He said "hi", '), F.substring("text", 1, 20)).alias("s"),
    )
    path = _tmp_out("sink_csv")
    write_csv(df, path)
    return (
        spark.read.option("header", True)
        .option("escape", '"')
        .schema("doc_id LONG, s STRING")
        .csv(path)
    )


@_q(
    "sink_dimensions_csv",
    """
SELECT 'h' || CAST(doc_id AS VARCHAR) AS handle,
  CASE CAST(doc_id % 6 AS INTEGER) WHEN 0 THEN 'LINEAR' WHEN 1 THEN 'ALIGNED'
    WHEN 2 THEN 'ANGULAR' WHEN 3 THEN 'DIAMETER' WHEN 4 THEN 'RADIUS'
    ELSE 'OTHER' END AS dim_type,
  round(doc_id / 7.0, 4) AS value,
  'note for ' || source AS text_override,
  'DIMS' AS layer,
  source AS drawing
FROM documents""",
)
def q_sink_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 dimensions CSV sink + F7 dim-type decode (reference:
    bom_exporter.cc:261-285 ExportDimensions, :111-120 decode table):
    handle/type/value/text/layer/drawing rows, written then read back."""
    from finetoo_sp_spark.operators.sinks import dim_type_decode, write_csv

    dims = T(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), "doc_id").alias("handle"),
        dim_type_decode(F.col("doc_id") % 6).alias("dim_type"),
        F.round(F.col("doc_id") / 7.0, 4).alias("value"),
        F.concat(F.lit("note for "), "source").alias("text_override"),
        F.lit("DIMS").alias("layer"),
        F.col("source").alias("drawing"),
    )
    path = _tmp_out("sink_dimensions")
    write_csv(dims, path)
    return (
        spark.read.option("header", True)
        .option("escape", '"')
        .schema(
            "handle STRING, dim_type STRING, value DOUBLE, "
            "text_override STRING, layer STRING, drawing STRING"
        )
        .csv(path)
    )


@_q(
    "lineage_manifests",
    """
WITH exp AS (
  SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url,
    'heading for document ' || doc_id || chr(10)
      || trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text
  FROM documents
), b AS (
  SELECT CAST(CAST('0x' || substr(sha256(url), 1, 15) AS BIGINT) % 16 AS INTEGER) AS bucket,
    url, text
  FROM exp
)
SELECT bucket, count(*) AS input_count, count(*) AS output_count,
  bit_xor(CAST('0x' || substr(sha256(url || chr(1) || text), 1, 15) AS BIGINT)) AS content_checksum,
  CAST(sum(length(text)) AS BIGINT) AS output_chars,
  'committed' AS status
FROM b GROUP BY bucket""",
)
def q_lineage_manifests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: the per-partition lineage manifest table itself under a value
    oracle — run the full resumable extraction (hash_mode='sha' so both
    the bucket assignment and the order-independent xor-fold checksum are
    DuckDB-reproducible), read the manifests back; the oracle recomputes
    every bucket's counts, chars and checksum from the expected
    extraction."""
    from finetoo_sp_spark.sources.lineage import read_manifests, run_resumable_extraction

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    out_dir = _tmp_out("lineage")
    run_resumable_extraction(pages, out_dir, n_buckets=16, hash_mode="sha")
    man = read_manifests(spark, out_dir)
    return man.select(
        "bucket", "input_count", "output_count", "content_checksum", "output_chars", "status"
    )


@_q(
    "pdf_layout_extract",
    """
WITH exp AS (
  SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url,
    CASE WHEN doc_id % 5 = 0
      THEN 'heading for document ' || doc_id || chr(10)
        || trim(regexp_replace(text, '\\s+', ' ', 'g'))
      ELSE 'pdf doc ' || doc_id || ' first paragraph for doc ' || doc_id
        || chr(10) || 'second block from ' || source
        || chr(10) || 'appendix for doc ' || doc_id
    END AS text,
    CASE WHEN doc_id % 5 = 0 THEN 10 ELSE 3 END AS nb,
    CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 2 END AS seps
  FROM documents
)
SELECT url, text, CAST(nb AS BIGINT) AS n_blocks,
  CAST(length(text) - seps AS BIGINT) AS content_chars
FROM exp""",
)
def q_pdf_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 PDF layout path + magic-byte routing (extraction/pdf.py): 4/5
    of the corpus becomes FAKEPDF payloads (3 layout blocks: two y-close
    fragments merge, a y-gap splits, a page break splits), 1/5 stays
    HTML; extract_pages_any routes on the %PDF- prefix JVM-side and the
    two branches union into one schema. Oracle recomputes both branches'
    expected text."""
    from finetoo_sp_spark.extraction.pdf import extract_pages_any

    docs = T(spark, sf_dir, "documents")
    html_pages = documents_to_pages(docs.filter(F.col("doc_id") % 5 == 0)).select(
        "url", "html"
    )
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"), F.col("doc_id")
    )
    payload = F.concat(
        F.lit("%PDF-FAKE\nP 0 10 100 pdf doc "),
        F.col("doc_id"),
        F.lit("\nP 0 10 92 first paragraph for doc "),
        F.col("doc_id"),
        F.lit("\nP 0 10 60 second block from "),
        F.col("source"),
        F.lit("\nP 1 10 100 appendix for doc "),
        F.col("doc_id"),
    )
    pdf_pages = docs.filter(F.col("doc_id") % 5 != 0).select(
        url.alias("url"), F.encode(payload, "UTF-8").alias("html")
    )
    out = extract_pages_any(html_pages.unionByName(pdf_pages))
    return out.select("url", "text", "n_blocks", "content_chars")


@_q(
    "edge_build",
    """
WITH l AS (
  SELECT 'https://' || source || '.example.com/doc/' || doc_id AS src,
    CAST(floor(doc_id / 2) AS BIGINT) AS t FROM documents
  UNION ALL
  SELECT 'https://' || source || '.example.com/doc/' || doc_id,
    CAST(floor(doc_id / 3) AS BIGINT) FROM documents
)
SELECT 'LINKS_TO' AS edge_type, src,
  'https://src' || CAST(t % 20 AS VARCHAR) || '.example.com/doc/' || CAST(t AS VARCHAR) AS dst
FROM l""",
)
def q_edge_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 reference-edge build (reference: graph_builder.cc:41-61 INSERT
    -> REFERENCES equi-join): anchor extraction -> resolve -> semi-join
    against corpus urls -> LINKS_TO edges, multiset-compared against the
    template's parent-link rule (duplicate links preserved)."""
    from finetoo_sp_spark.extraction.graph import build_web_graph

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    g = build_web_graph(pages)
    return g.edges.filter(F.col("edge_type") == "LINKS_TO").select(
        "edge_type", "src", "dst"
    )


# --- crawl-snapshot delta -----------------------------------------------
# Snapshot B is derived from the documents table by fixed congruence
# rules, so every status is recomputable in SQL: doc_id % 11 == 3 ->
# removed, else doc_id % 7 == 0 -> changed (text || ' rev2'),
# doc_id % 13 == 1 -> ALSO re-added under doc_id + 1000000 as a brand
# new url; everything else unchanged.


def _snapshot_b(docs: DataFrame) -> DataFrame:
    kept = docs.filter(F.col("doc_id") % 11 != 3)
    edited = kept.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" rev2"))
        ).otherwise(F.col("text")),
    )
    added = (
        docs.filter(F.col("doc_id") % 13 == 1)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn("text", F.concat("text", F.lit(" brand new page")))
    )
    return documents_to_pages(edited.unionByName(added))


@_q(
    "snapshot_churn",
    """
WITH base AS (
  SELECT source,
    CASE WHEN doc_id % 11 = 3 THEN 'removed'
         WHEN doc_id % 7 = 0 THEN 'changed'
         ELSE 'unchanged' END AS status
  FROM documents
),
adds AS (SELECT source, 'added' AS status FROM documents WHERE doc_id % 13 = 1)
SELECT source || '.example.com' AS host, status, CAST(count(*) AS BIGINT) AS n
FROM (SELECT * FROM base UNION ALL SELECT * FROM adds)
GROUP BY host, status""",
)
def q_snapshot_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-over-crawl churn report: per-host counts of added /
    removed / changed / unchanged urls between two snapshots. The delta
    itself moves only (url, xxhash64) — never the payload — in one
    full-outer equi-join (sources/snapshot.py)."""
    from finetoo_sp_spark.sources.snapshot import snapshot_delta

    docs = T(spark, sf_dir, "documents")
    delta = snapshot_delta(documents_to_pages(docs), _snapshot_b(docs))
    return delta.groupBy(
        F.regexp_extract("url", r"^https://([^/]+)", 1).alias("host"), "status"
    ).agg(F.count(F.lit(1)).alias("n"))


@_q(
    "incremental_extract",
    """
WITH work AS (
  SELECT doc_id, source, text || ' rev2' AS text
  FROM documents WHERE doc_id % 11 != 3 AND doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 1000000, source, text || ' brand new page'
  FROM documents WHERE doc_id % 13 = 1
)
SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url,
  'heading for document ' || doc_id || chr(10)
    || trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text
FROM work""",
)
def q_incremental_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental re-extraction: run the extraction kernel ONLY on
    pages whose payload is new or changed vs the previous snapshot —
    at 10^12 pages and few-percent crawl churn this is the difference
    between paying for the churn and paying for the corpus. The oracle
    is the expected extraction of exactly the changed+added rows, so a
    false 'unchanged' (missed work) or false 'changed' (wasted work
    would still extract correctly, but removed/unchanged rows appearing
    here) both fail the value hash."""
    from finetoo_sp_spark.sources.snapshot import changed_pages

    docs = T(spark, sf_dir, "documents")
    work = changed_pages(documents_to_pages(docs), _snapshot_b(docs))
    out = extract_pages(
        work, repartition_buckets=spark.sparkContext.defaultParallelism
    )
    return out.select("url", "text")


@_q(
    "anchor_text_agg",
    """
WITH d AS (
  SELECT doc_id, source,
    'https://' || source || '.example.com' AS host,
    'https://' || source || '.example.com/doc/' || doc_id AS url
  FROM documents
),
a AS (
  SELECT url, host || '/home' AS target, 'home' AS anchor FROM d
  UNION ALL SELECT url, host || '/tags/' || source, source FROM d
  UNION ALL SELECT url,
    'https://src' || CAST(CAST(floor(doc_id / 2) AS BIGINT) % 20 AS VARCHAR)
      || '.example.com/doc/' || CAST(CAST(floor(doc_id / 2) AS BIGINT) AS VARCHAR),
    'related' FROM d
  UNION ALL SELECT url,
    'https://src' || CAST(CAST(floor(doc_id / 3) AS BIGINT) % 20 AS VARCHAR)
      || '.example.com/doc/' || CAST(CAST(floor(doc_id / 3) AS BIGINT) AS VARCHAR),
    'more' FROM d
  UNION ALL SELECT url, host || '/about', 'about' FROM d
  UNION ALL SELECT url, host || '/terms', 'terms' FROM d
  UNION ALL SELECT url, host || '/contact', 'contact' FROM d
  UNION ALL SELECT url, host || '/u', 'author ' || doc_id FROM d
)
SELECT target, CAST(count(*) AS BIGINT) AS n_refs,
  CAST(count(DISTINCT url) AS BIGINT) AS n_sources,
  string_agg(DISTINCT anchor, '|' ORDER BY anchor) AS anchors_cs
FROM a GROUP BY target""",
)
def q_anchor_text_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target anchor-text profiles over the whole crawl (anchor text
    describes the TARGET page — the retrieval / anchor-conditioned
    pretraining signal). The oracle re-derives every one of the
    template's 8 anchors per page (nav, tag, parent links, footer,
    author) with its visible text, so this value-checks the anchor-pair
    regex, nested-tag stripping, relative-href resolution AND the
    aggregation in one query."""
    from finetoo_sp_spark.extraction.graph import anchor_text_summary

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    return anchor_text_summary(pages)


@_q(
    "graph_stats",
    """
SELECT 'page' AS kind, 'node' AS entity, count(*) AS n FROM documents
UNION ALL SELECT 'block', 'node', 10 * count(*) FROM documents
UNION ALL SELECT 'CONTAINS', 'edge', 10 * count(*) FROM documents
UNION ALL SELECT 'LINKS_TO', 'edge', 2 * count(*) FROM documents""",
)
def q_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 graph stats (reference: graph_builder.cc:63-75,
    generate_full_bom.cc:132-143): nodes/edges per type, computed not
    stored. Oracle derives the constants from the fixed template (10
    blocks + 2 links per page)."""
    from finetoo_sp_spark.extraction.graph import build_web_graph

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    return build_web_graph(pages).stats()


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


@_q(
    "file_order_rank",
    """
SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url,
  CAST(row_number() OVER (ORDER BY url) AS BIGINT) AS file_rank
FROM documents""",
)
def q_file_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 file-order sort (reference: generate_full_bom.cc:68 sorted dir
    scan): deterministic rank over the input listing. The global window
    is deliberate — like the reference, this ranks the *file listing*
    (dimension-sized metadata), never corpus rows."""
    from pyspark.sql.window import Window

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    w = Window.orderBy("url")
    return pages.select("url").withColumn(
        "file_rank", F.row_number().over(w).cast("long")
    )


@_q(
    "numeric_parse_fallback",
    """
WITH r AS (
  SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER)
    WHEN 0 THEN CAST(doc_id AS VARCHAR) || '.25'
    WHEN 1 THEN '  ' || CAST(doc_id AS VARCHAR) || '  '
    WHEN 2 THEN 'x' || CAST(doc_id AS VARCHAR)
    ELSE '' END AS raw
  FROM documents
)
SELECT doc_id, raw, coalesce(TRY_CAST(raw AS DOUBLE), 0.0) AS parsed FROM r""",
)
def q_numeric_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 numeric parse with fallback (reference: GetDouble,
    dxf_text_parser.cc:31-49 — stod with fallback): well-formed,
    whitespace-padded, malformed and empty inputs all parse without a
    task failure; malformed -> 0.0."""
    from finetoo_sp_spark.extraction.fields import parse_double_with_fallback

    did = F.col("doc_id")
    raw = (
        F.when(did % 4 == 0, F.concat(did.cast("string"), F.lit(".25")))
        .when(did % 4 == 1, F.concat(F.lit("  "), did.cast("string"), F.lit("  ")))
        .when(did % 4 == 2, F.concat(F.lit("x"), did.cast("string")))
        .otherwise(F.lit(""))
    )
    return T(spark, sf_dir, "documents").select(
        "doc_id", raw.alias("raw"), parse_double_with_fallback(raw).alias("parsed")
    )


@_q(
    "ascii_sanitize",
    f"""
SELECT doc_id,
  {_SANITIZE_SQL.format(x="substr(text, 1, 40) || 'é' || chr(9) || '|' || chr(10) || '|€ end'")} AS clean
FROM documents""",
)
def q_ascii_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 ASCII sanitize as a direct column op (reference:
    bom_exporter.cc:16-28: keep 0x20-0x7E, newline/tab -> space, drop the
    rest)."""
    from finetoo_sp_spark.operators.sinks import sanitize_ascii

    messy = F.concat(
        F.substring("text", 1, 40), F.lit("é\t|\n|€ end")
    )
    return T(spark, sf_dir, "documents").select(
        "doc_id", sanitize_ascii(messy).alias("clean")
    )


@_q(
    "binder_manifest",
    """
WITH p AS (
  SELECT source,
    'https://' || source || '.example.com/doc/' || doc_id AS url,
    sha256('heading for document ' || doc_id || chr(10)
      || trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS h
  FROM documents
)
SELECT source AS binder_id, 'Binder ' || source AS title,
  count(*) AS n_pages,
  sha256(string_agg(h, '' ORDER BY url)) AS binder_sha,
  min(url) AS first_url, max(url) AS last_url
FROM p GROUP BY source""",
)
def q_binder_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binder/export direction (reference: BinderConfig,
    proto/graph.proto:360-383): one binder per source, pages ordered by
    url, combined sha256 over the ordered page hashes — byte-stable under
    any partitioning. The oracle recomputes every binder hash via
    string_agg ORDER BY."""
    from finetoo_sp_spark.extraction.binder import BinderConfig, build_binder_manifest

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    extracted = extract_pages(pages).withColumn(
        "source", F.regexp_extract("url", r"https://([^.]+)\.", 1)
    )
    return build_binder_manifest(extracted, BinderConfig(group_col="source"))


@_q(
    "schema_discovery",
    """
SELECT * FROM (VALUES
  ('block', 'block_key',    'string', true,  true,  false, false),
  ('block', 'url',          'string', false, true,  false, false),
  ('block', 'tag',          'string', false, true,  false, false),
  ('block', 'text',         'string', false, true,  true,  false),
  ('block', 'n_words',      'int64',  false, true,  true,  true),
  ('block', 'n_chars',      'int64',  false, false, true,  true),
  ('block', 'link_density', 'double', false, false, true,  true),
  ('block', 'is_content',   'bool',   false, true,  false, false),
  ('block', 'content_hash', 'string', false, true,  true,  false),
  ('page', 'url',              'string', true,  true,  false, false),
  ('page', 'title',            'string', false, true,  true,  false),
  ('page', 'h1',               'string', false, true,  true,  false),
  ('page', 'lang_attr',        'string', false, true,  false, false),
  ('page', 'n_blocks',         'int64',  false, false, true,  true),
  ('page', 'n_content_blocks', 'int64',  false, false, true,  true),
  ('page', 'content_chars',    'int64',  false, false, true,  true),
  ('page', 'content_hash',     'string', false, true,  true,  false)
) AS t(node_type, property, dtype, is_unique, is_indexed, is_comparable, is_aggregable)""",
)
def q_schema_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The schema-driven operator-discovery table AS DATA (reference:
    schema_analyzer.cc:103-184 capability finders + the discovery-thesis
    test, schema_analyzer_test.cc): the Spark side derives every row
    from the live registry object; the oracle hand-restates the expected
    capability matrix, so a silent registry regression fails the
    correctness gate, not just a pytest."""
    from finetoo_sp_spark.schema.registry import web_graph_schema

    s = web_graph_schema()
    rows = [
        (t, p.name, p.dtype, p.unique, p.indexed, p.comparable, p.aggregable)
        for t, nt in sorted(s.node_types.items())
        for p in nt.properties.values()
    ]
    return spark.createDataFrame(
        rows,
        "node_type string, property string, dtype string, is_unique boolean, "
        "is_indexed boolean, is_comparable boolean, is_aggregable boolean",
    )


# --- capstone: end-to-end curation pipeline -------------------------------

# stop-shingle pruning ON (max_df=100): a shingle in >100 of the 500
# sf0.01 docs is boilerplate; at corpus scale an unpruned hot shingle
# makes the inverted-index self-join quadratic in its document frequency.
_CURATION_MAX_DF = 100
_CURATION_JACCARD = _jaccard_sql("doc_id >= 0", 0.5, max_df=_CURATION_MAX_DF)


@_q(
    "curation_pipeline",
    f"""
WITH RECURSIVE pairs AS ({_CURATION_JACCARD}),
sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(u, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT reach.u, sym.v FROM reach JOIN sym ON reach.r = sym.u
),
cc AS (SELECT u AS doc_id, min(r) AS component FROM reach GROUP BY u),
w AS (
  SELECT doc_id, text, {_WORDS_SQL} AS ws,
    length(text) AS n_chars, CAST(len({_WORDS_SQL}) AS INTEGER) AS n_words
  FROM documents
),
features AS (
  SELECT doc_id, n_words,
    (n_words >= 10
     AND round(length(regexp_replace(lower(text), '\\s+', '', 'g')) / greatest(n_words, 1), 4) BETWEEN 2 AND 12
     AND round(len(list_filter(ws, x -> list_contains({_STOP_LIST_SQL}, x))) / greatest(n_words, 1), 4) >= 0.01) AS keep_quality,
    CASE WHEN len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], x))) > 0 THEN true ELSE false END AS _unused
  FROM w
)
SELECT f.doc_id, f.n_words
FROM features f
LEFT JOIN cc ON cc.doc_id = f.doc_id
WHERE f.keep_quality
  AND coalesce(cc.component, f.doc_id) = f.doc_id""",
)
def q_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone training-data curation chain, one lazy plan end to end:
    quality gate (Gopher/C4-style) -> near-dup clustering (n-gram
    Jaccard >= 0.5 over ALL docs, stop-shingle-pruned inverted index
    with max_df engaged -> connected components) -> keep cluster
    representatives. Returns the surviving (doc_id, n_words)."""
    from finetoo_sp_spark.operators.components import dedup_keep_list

    docs = T(spark, sf_dir, "documents")
    quality = ts.quality_scores(docs, "doc_id", "text").filter(F.col("keep"))
    pairs = dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_df=_CURATION_MAX_DF
    )
    keep = dedup_keep_list(pairs, docs.select(F.col("doc_id").alias("id")))
    return (
        quality.join(keep.filter(F.col("keep")), quality.id == keep.id, "left_semi")
        .select(F.col("id").alias("doc_id"), "n_words")
    )


def _pagerank_oracle(iterations: int) -> str:
    """Unrolled fixed-point PageRank twin (recursive CTEs can't hold the
    per-round aggregation, so the rounds unroll as chained CTEs). The
    edge rule is the docpages parent-link rule, as in the traverse
    oracle; integer fixed-point makes every round exactly portable."""
    scale, damp = 1_000_000_000, 85
    base = (100 - damp) * scale // 100
    ctes = [f"r0 AS (SELECT id, CAST({scale} AS BIGINT) AS rank_fp FROM nodes)"]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT n.id, {base} + ({damp} * COALESCE(s.s, 0)) // 100 AS rank_fp
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS id, sum(r.rank_fp // d.deg) AS s
    FROM e JOIN deg d USING (src) JOIN r{i - 1} r ON r.id = e.src
    GROUP BY e.dst) s ON s.id = n.id)"""
        )
    return f"""
WITH u AS (
  SELECT doc_id,
    'https://src' || CAST(doc_id % 20 AS VARCHAR) || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
),
e AS (
  SELECT DISTINCT s.url AS src, t.url AS dst
  FROM u s JOIN u t
    ON t.doc_id IN (CAST(floor(s.doc_id / 2) AS BIGINT), CAST(floor(s.doc_id / 3) AS BIGINT))
),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
{",".join(ctes)}
SELECT id AS url, CAST(rank_fp AS BIGINT) AS rank_fp FROM r{iterations}"""


@_q("pagerank_links", _pagerank_oracle(5))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-authority prior for corpus curation: 5 rounds of fixed-point
    PageRank over the REAL extracted LINKS_TO graph. Integer fixed-point
    (rank 1.0 = 1e9, integer div, integer sums) makes the whole
    iteration order-independent and hence exactly reproducible by the
    SQL oracle — float PageRank could never value-match across engines."""
    from finetoo_sp_spark.extraction.graph import build_web_graph
    from finetoo_sp_spark.operators.pagerank import pagerank_fixed_point

    pages = documents_to_pages(T(spark, sf_dir, "documents"))
    g = build_web_graph(pages)
    edges = g.edges.filter(F.col("edge_type") == "LINKS_TO")
    pr = pagerank_fixed_point(edges, iterations=5)
    return pr.select(F.col("id").alias("url"), "rank_fp")


@_q(
    "rarity_scores",
    f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
wd AS (
  SELECT doc_id, i AS pos, ws[CAST(i AS BIGINT)] AS w
  FROM w, UNNEST(generate_series(1, len(ws))) t(i)
  WHERE length(ws[CAST(i AS BIGINT)]) > 0
),
counts AS (SELECT w, count(*) AS cnt FROM wd GROUP BY w),
tot AS (SELECT sum(cnt) AS n_total FROM counts),
j AS (
  SELECT doc_id, pos, (t.n_total / c.cnt) AS inv
  FROM wd JOIN counts c USING (w), tot t
),
arr AS (SELECT doc_id, list(inv ORDER BY pos) AS invs FROM j GROUP BY doc_id)
SELECT doc_id AS id, CAST(len(invs) AS INTEGER) AS n_words,
  round(list_sum(invs) / len(invs), 6) AS rarity
FROM arr""",
)
def q_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy rarity score (mean inverse corpus unigram
    frequency — the CCNet LM-filter idea without an external model)
    under a full value oracle: the per-doc mean is an ORDERED left fold
    over the word sequence, so both engines sum identical IEEE doubles
    in identical order and the 6dp values match exactly."""
    return ts.rarity_scores(T(spark, sf_dir, "documents"), "doc_id", "text")


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
    "host_cap_sources",
    """
SELECT doc_id, source FROM documents
QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 10""",
)
def q_host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-domination domain cap (C4/RefinedWeb rule): at most 10 docs
    per source, deterministic priority = doc_id asc."""
    from finetoo_sp_spark.operators.packing import host_cap

    return host_cap(
        T(spark, sf_dir, "documents").select("doc_id", "source"),
        "source", "doc_id", max_per_host=10,
    )


@_q(
    "split_assign",
    """
SELECT doc_id,
  CASE WHEN h < 10000 THEN 'test'
       WHEN h < 20000 THEN 'val'
       ELSE 'train' END AS split
FROM (
  SELECT doc_id,
    CAST('0x' || substr(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
      % 1000000 AS h
  FROM documents
)""",
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-row train/val/test assignment (1%/1% at the
    defaults): a pure salted-hash function of doc_id, so re-runs,
    resumes and cluster-size changes can never move a document across
    the split boundary. Full per-row value oracle."""
    from finetoo_sp_spark.operators.packing import assign_splits

    docs = T(spark, sf_dir, "documents")
    return assign_splits(docs.select("doc_id"), "doc_id").select("doc_id", "split")


@_q(
    "pack_token_quota",
    """
WITH t AS (
  SELECT doc_id AS id, CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens,
    CAST(CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 16
      AS INTEGER) AS shard
  FROM documents
)
SELECT id, n_tokens, shard,
  CAST(floor(COALESCE(sum(n_tokens) OVER (
      PARTITION BY shard ORDER BY id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0)
    AS BIGINT) AS bin
FROM t""",
)
def q_pack_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (pretraining shard assembly):
    quotient packing — shard by hash(id), bin = floor(exclusive token
    cumsum / 2048) — fully declarative and engine-portable; the exact
    greedy packer (sequential remainder reset) lives in
    packing.pack_greedy_in_shards with a pytest contract."""
    from finetoo_sp_spark.operators.packing import pack_token_quota

    docs = T(spark, sf_dir, "documents")
    toks = ts.token_counts(docs, "doc_id", "text").select("id", "n_tokens_est")
    return pack_token_quota(
        toks, "id", "n_tokens_est", budget=2048, n_shards=16, hash_mode="sha"
    )


@_q(
    "chunk_windows",
    """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE length(trim(text)) > 0
),
s AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
    GREATEST(CAST(0 AS BIGINT),
             (CAST(len(toks) AS BIGINT) - 32 + 23) // 24) AS lastc
  FROM d
)
SELECT doc_id AS id, i AS chunk_id,
  i * 24 AS tok_start,
  LEAST(i * 24 + 32, n) AS tok_end,
  LEAST(i * 24 + 32, n) - i * 24 AS n_chunk_tokens,
  array_to_string(toks[i * 24 + 1 : LEAST(i * 24 + 32, n)], ' ') AS chunk_text
FROM s, UNNEST(generate_series(0, lastc)) AS t(i)""",
)
def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window document chunking (model-context slicing): every
    document becomes overlapping 32-token windows at stride 24, each
    chunk carrying its token span — the final fan-out step from curated
    corpus to tokenizer input.  Map-only (split/sequence/explode/slice),
    zero shuffles; the chunk count is integer `div` arithmetic so the
    boundary is exact in both engines."""
    from finetoo_sp_spark.operators.packing import chunk_token_windows

    return chunk_token_windows(
        T(spark, sf_dir, "documents"), "doc_id", "text", window=32, stride=24
    )


@_q(
    "mix_epochs",
    """
WITH w AS (
  SELECT doc_id, source,
    CASE WHEN CAST(substr(source, 4) AS BIGINT) < 5 THEN 2500000
         WHEN CAST(substr(source, 4) AS BIGINT) < 10 THEN 1000000
         WHEN CAST(substr(source, 4) AS BIGINT) < 15 THEN 500000
         ELSE 250000 END AS w_ppm,
    CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
      % 1000000 AS gate
  FROM documents
),
c AS (
  SELECT doc_id, source,
    w_ppm // 1000000
      + CASE WHEN gate < w_ppm % 1000000 THEN 1 ELSE 0 END AS n_copies
  FROM w
)
SELECT doc_id AS id, source, i AS copy_id
FROM (SELECT * FROM c WHERE n_copies > 0) f,
  UNNEST(generate_series(0, n_copies - 1)) AS t(i)""",
)
def q_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture re-weighting (epoch upsampling): sources 0-4 get 2.5
    epochs, 5-9 get 1, 10-14 keep half, 15-19 keep a quarter.  Integer
    ppm weights + a sha hash gate on the doc id make the fractional
    copy decision exact, deterministic, and partition-order-proof; the
    weight table broadcasts and the corpus never shuffles."""
    from finetoo_sp_spark.operators.packing import mix_epoch_weights

    weights = {
        f"src{i}": (
            2_500_000 if i < 5 else 1_000_000 if i < 10 else 500_000 if i < 15 else 250_000
        )
        for i in range(20)
    }
    return mix_epoch_weights(
        T(spark, sf_dir, "documents"), "doc_id", "source", weights, hash_mode="sha"
    )


@_q(
    "warc_roundtrip",
    """
SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url,
  TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS warc_ts,
  sha256(text) AS payload_sha
FROM documents""",
)
def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl container parity (sources/warc.py): real WARC
    archives (gzip-per-record members, HTTP response envelopes) are
    written from the driver table, read back through the binaryFile +
    Arrow-kernel parser, and every record's url / WARC-Date / payload
    sha must match the oracle's recomputation — the archive format
    itself is the thing under test."""
    import hashlib as _hl
    import os as _os

    import pandas as pd  # noqa: PLC0415

    from finetoo_sp_spark.sources.warc import make_warc, read_warc_pages

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    out = _tmp_out("warc")
    _os.makedirs(out, exist_ok=True)

    def write(batches):
        import datetime as _dt

        for pdf in batches:
            if pdf.empty:
                continue
            recs = [
                (
                    f"https://{r.source}.example.com/doc/{int(r.doc_id)}",
                    _dt.datetime(2024, 1, 1) + _dt.timedelta(seconds=int(r.doc_id)),
                    r.text.encode("utf-8"),
                )
                for r in pdf.itertuples()
            ]
            name = _hl.sha256(recs[0][0].encode()).hexdigest()[:16]
            with open(_os.path.join(out, f"{name}.warc.gz"), "wb") as f:
                f.write(make_warc(recs, gzip_members=True))
            yield pd.DataFrame({"n": [len(recs)]})

    # tiny action (one count row per file) drives the distributed write
    docs.repartition(4).mapInPandas(write, "n long").collect()
    pages = read_warc_pages(spark, out)
    return pages.select("url", "warc_ts", F.sha2("html", 256).alias("payload_sha"))


@_q(
    "zonemap_range_scan",
    """
SELECT event_id, ts, user_id, event_type, value FROM events
WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-02 12:00:00'""",
)
def q_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map partition elimination (sources/zonemap.py — the Iceberg
    manifest-stats idea): events are written range-bucketed on ts with
    per-bucket min/max manifests, and the scan consults the manifest to
    read only overlapping buckets. The result is boundary-independent
    (the oracle is a plain range filter); the pruning itself is pinned
    by tests/test_zonemap.py (buckets_scanned < buckets_total)."""
    import datetime as _dt

    from finetoo_sp_spark.sources.zonemap import scan_range, write_range_bucketed

    ev = T(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    out = _tmp_out("zonemap")
    write_range_bucketed(ev, out, "ts", n_buckets=16)
    df, _stats = scan_range(
        spark, out, "ts",
        _dt.datetime(2024, 1, 2, 0, 0, 0), _dt.datetime(2024, 1, 2, 12, 0, 0),
    )
    return df


@_q(
    "training_shard_manifest",
    f"""
WITH w AS (
  SELECT doc_id, source, text, {{_ws}} AS ws,
    length(text) AS n_chars, CAST(len({{_ws}}) AS INTEGER) AS n_words
  FROM documents
),
q AS (
  SELECT doc_id, source, CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_tokens
  FROM w
  WHERE n_words >= 10
    AND round(length(regexp_replace(lower(text), '\\s+', '', 'g')) / greatest(n_words, 1), 4) BETWEEN 2 AND 12
    AND round(len(list_filter(ws, x -> list_contains({{_stop}}, x))) / greatest(n_words, 1), 4) >= 0.01
),
capped AS (
  SELECT doc_id, n_tokens FROM q
  QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 10
),
t AS (
  SELECT doc_id AS id, n_tokens,
    CAST(CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 8
      AS INTEGER) AS shard
  FROM capped
),
p AS (
  SELECT id, n_tokens, shard,
    CAST(floor(COALESCE(sum(n_tokens) OVER (
        PARTITION BY shard ORDER BY id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0)
      AS BIGINT) AS bin
  FROM t
)
SELECT shard, bin, count(*) AS n_docs, sum(n_tokens) AS total_tokens
FROM p GROUP BY shard, bin""".replace("{_ws}", _WORDS_SQL).replace("{_stop}", _STOP_LIST_SQL),
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone training-shard assembly, one lazy plan: quality gate ->
    per-domain cap -> token-quota packing -> per-(shard, bin) manifest.
    The user story the engine exists for — deduped/filtered corpus in,
    training sequences out — with every stage's semantics recomputed by
    the oracle."""
    from finetoo_sp_spark.operators.packing import host_cap, pack_token_quota

    docs = T(spark, sf_dir, "documents")
    quality = (
        ts.quality_scores(docs, "doc_id", "text")
        .filter(F.col("keep"))
        .select(
            "id", F.ceil(F.col("n_chars") / 4.0).cast("long").alias("n_tokens")
        )
        .join(docs.select(F.col("doc_id").alias("id"), "source"), "id")
    )
    capped = host_cap(quality, "source", "id", max_per_host=10)
    packed = pack_token_quota(
        capped, "id", "n_tokens", budget=2048, n_shards=8, hash_mode="sha"
    )
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens")
    )


@_q(
    "pivot_line_status",
    """
SELECT l_returnflag,
  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O,
  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F
FROM lineitem GROUP BY l_returnflag""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native .pivot() (wide conditional aggregation): one shuffle, the
    pivot columns become a map-side CASE fan-out — the guide's pivot
    pattern with an explicit value list so the plan needs no extra
    distinct-values job."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
    )


@_q(
    "cube_order_status",
    """
SELECT o_orderpriority, o_orderstatus, count(*) AS n
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 2^k subtotal combinations in ONE pass —
    Expand + a single shuffle, vs 4 separate group-bys)."""
    return (
        T(spark, sf_dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "unpivot_token_stats",
    """
SELECT doc_id AS id, 'n_chars' AS metric, CAST(length(text) AS BIGINT) AS value FROM documents
UNION ALL
SELECT doc_id, 'n_words', CAST(len(regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS BIGINT) FROM documents
UNION ALL
SELECT doc_id, 'n_tokens_est', CAST(ceil(length(text) / 4.0) AS BIGINT) FROM documents""",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native .unpivot()/melt (wide -> long without a UNION of scans:
    one Expand over the already-computed wide frame)."""
    tc = ts.token_counts(T(spark, sf_dir, "documents"), "doc_id", "text")
    wide = tc.select(
        "id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_tokens_est").cast("long").alias("n_tokens_est"),
    )
    return wide.unpivot("id", ["n_chars", "n_words", "n_tokens_est"], "metric", "value")


@_q(
    "cdc_upsert_latest",
    """
WITH updates AS (
  SELECT event_id, user_id, event_type, ts + INTERVAL 1 HOUR AS ts,
    round(value + 100, 2) AS value
  FROM events WHERE event_id % 7 = 0
),
unioned AS (
  SELECT event_id, user_id, event_type, ts, value FROM events
  UNION ALL SELECT * FROM updates
)
SELECT event_id, user_id, event_type, ts, value FROM unioned
QUALIFY row_number() OVER (PARTITION BY event_id ORDER BY ts DESC) = 1""",
)
def q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation without a MERGE-capable table format (the
    guide's CDC pattern): base ∪ updates -> keep_latest per business
    key. Every 7th event arrives re-stated one hour later with a new
    value; the merged view must show exactly the newest row per key."""
    from finetoo_sp_spark.operators.windows import keep_latest

    base = T(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    updates = base.filter(F.col("event_id") % 7 == 0).select(
        "event_id", "user_id", "event_type",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        F.round(F.col("value") + 100, 2).alias("value"),
    )
    return keep_latest(base.unionByName(updates), ["event_id"], "ts")


@_q(
    "scd2_user_values",
    """
WITH o AS (
  SELECT user_id, ts, value,
    lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
),
ch AS (SELECT user_id, ts, value FROM o WHERE prev IS NULL OR value != prev)
SELECT user_id, value, ts AS valid_from,
  lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
FROM ch""",
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension history from a change stream: per key each
    observed value gets a half-open [valid_from, valid_to) interval,
    consecutive duplicates collapse, NULL valid_to = current row."""
    from finetoo_sp_spark.operators.windows import scd2_history

    return scd2_history(T(spark, sf_dir, "events"), ["user_id"], "ts", "value")


_SHA60_ID = "CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"


@_q(
    "curation_lineage",
    f"""
WITH RECURSIVE pairs AS ({_CURATION_JACCARD}),
sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(u, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT reach.u, sym.v FROM reach JOIN sym ON reach.r = sym.u
),
cc AS (SELECT u AS doc_id, min(r) AS component FROM reach GROUP BY u),
w AS (
  SELECT doc_id, text, {{_ws}} AS ws,
    CAST(len({{_ws}}) AS INTEGER) AS n_words
  FROM documents
),
surv AS (
  SELECT w.doc_id FROM w LEFT JOIN cc ON cc.doc_id = w.doc_id
  WHERE (n_words >= 10
     AND round(length(regexp_replace(lower(text), '\\s+', '', 'g')) / greatest(n_words, 1), 4) BETWEEN 2 AND 12
     AND round(len(list_filter(ws, x -> list_contains({{_stop}}, x))) / greatest(n_words, 1), 4) >= 0.01)
    AND coalesce(cc.component, w.doc_id) = w.doc_id
)
SELECT CAST({_SHA60_ID} % 16 AS INTEGER) AS bucket,
  count(*) AS output_count,
  bit_xor({_SHA60_ID}) AS content_checksum,
  'committed' AS status
FROM surv GROUP BY 1""".replace("{_ws}", _WORDS_SQL).replace("{_stop}", _STOP_LIST_SQL),
)
def q_curation_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resumable-curation manifest table itself under a value oracle
    (sources/curation.py, VERDICT r02 #9): run the two-phase
    checkpointed curation in hash_mode='sha' (DuckDB-reproducible bucket
    ids and xor-fold checksums), read the survivors manifests back; the
    oracle recomputes every bucket's count and checksum from the
    curation semantics alone — it never sees a manifest file."""
    import os as _os

    from finetoo_sp_spark.sources.curation import run_resumable_curation
    from finetoo_sp_spark.sources.lineage import read_manifests

    docs = T(spark, sf_dir, "documents")
    out_dir = _tmp_out("curation_lineage")
    run_resumable_curation(
        docs, out_dir, n_buckets=16, max_df=_CURATION_MAX_DF, hash_mode="sha"
    )
    man = read_manifests(spark, _os.path.join(out_dir, "survivors"))
    return man.select("bucket", "output_count", "content_checksum", "status")


# --- embedding clustering / SemDeDup / DSIR --------------------------------

_KMEANS_CTE = """
e AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(round(x::DOUBLE * 1048576) AS BIGINT)) AS v
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, v FROM e ORDER BY vec_id LIMIT 4),
a1 AS (
  SELECT e.vec_id,
    CAST(min(CAST(list_sum(list_transform(range(1, 65),
        i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS BIGINT) * 4 + c.cid) % 4 AS INT) AS cluster
  FROM e CROSS JOIN c0 c
  GROUP BY e.vec_id
),
u AS (
  SELECT a1.cluster, gs.i AS dim,
    CAST(sum(e.v[gs.i]) AS BIGINT) AS s, count(*) AS n
  FROM a1 JOIN e USING (vec_id), generate_series(1, 64) AS gs(i)
  GROUP BY 1, 2
),
c1 AS (SELECT cluster AS cid, dim, s // CAST(n AS BIGINT) AS cv FROM u),
ev AS (
  SELECT e.vec_id, gs.i AS dim, e.v[gs.i] AS val
  FROM e, generate_series(1, 64) AS gs(i)
),
d2 AS (
  SELECT ev.vec_id, c1.cid,
    CAST(sum((ev.val - c1.cv) * (ev.val - c1.cv)) AS BIGINT) AS dist
  FROM ev JOIN c1 USING (dim)
  GROUP BY 1, 2
),
a2 AS (
  SELECT vec_id, CAST(min(dist * 4 + cid) % 4 AS INT) AS cluster
  FROM d2 GROUP BY vec_id
)"""


@_q("kmeans_clusters", f"WITH {_KMEANS_CTE}\nSELECT vec_id AS id, cluster FROM a2")
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=4, 2 assignment passes) in integer fixed
    point: the oracle reproduces every centroid exactly because sums of
    scaled-long coordinates are partition-order independent. Per
    iteration the assignment is a narrow map (centroids collected to the
    driver, MLlib-style, and unrolled into a least() expression) and the
    update shuffles only k*dims groups."""
    from finetoo_sp_spark.operators import clustering as cl

    return cl.kmeans_assign(
        T(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=4, iters=2
    )


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
    "dsir_importance",
    f"""
WITH w AS (
  SELECT doc_id, {_WORDS_SQL} AS ws, (source = 'src0') AS is_t FROM documents
),
bk AS (
  SELECT doc_id, is_t,
    ('0x' || substr(md5(ws[g.i] || ' ' || ws[g.i + 1]), 1, 15))::BIGINT % 256 AS bucket
  FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS g(i)
),
cnts AS (
  SELECT bucket, count(*) AS cnt_raw,
    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS cnt_target
  FROM bk GROUP BY bucket
),
ratios AS (
  SELECT bucket, ((cnt_target + 1) * 65536) // (CAST(cnt_raw AS BIGINT) + 1) AS ratio_fp
  FROM cnts
),
sc AS (
  SELECT bk.doc_id, count(*) AS n_bigrams, CAST(sum(ratio_fp) AS BIGINT) AS dsir_score
  FROM bk JOIN ratios USING (bucket)
  GROUP BY 1
)
SELECT d.doc_id AS id,
  coalesce(sc.n_bigrams, 0) AS n_bigrams,
  coalesce(sc.dsir_score, 0) AS dsir_score
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""",
)
def q_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (arXiv:2302.03169) with src0 as the
    target domain: hashed-bigram bucket distributions for target vs raw,
    per-doc score = exact integer sum of fixed-point per-bucket ratios.
    The 256-row ratio table broadcast-joins to the exploded bigram
    stream — corpus-side work is explode -> map-side probe -> one
    partial agg, nothing scales super-linearly."""
    from finetoo_sp_spark.operators import importance as imp

    return imp.dsir_scores(
        T(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        F.col("source") == "src0",
        n_buckets=256,
        scale=1 << 16,
    )


@_q(
    "table_extract",
    """
WITH p AS (
  SELECT p_brand AS brand,
    '<tr><td>' || p_partkey || '</td><td>' || p_type || '</td><td>'
      || p_size || '</td></tr>' AS row_str,
    CAST(p_partkey AS VARCHAR) AS c0, p_type AS c1,
    CAST(p_size AS VARCHAR) AS c2
  FROM part
),
r AS (
  SELECT brand, c0, c1, c2,
    CAST(row_number() OVER (PARTITION BY brand ORDER BY row_str) AS INT) AS row_idx
  FROM p
),
hdr AS (SELECT DISTINCT brand FROM p),
cells AS (
  SELECT brand, 0 AS row_idx, 0 AS col_idx, 'partkey' AS cell FROM hdr
  UNION ALL SELECT brand, 0, 1, 'type' FROM hdr
  UNION ALL SELECT brand, 0, 2, 'size' FROM hdr
  UNION ALL SELECT brand, row_idx, 0, c0 FROM r
  UNION ALL SELECT brand, row_idx, 1, c1 FROM r
  UNION ALL SELECT brand, row_idx, 2, c2 FROM r
)
SELECT 'https://catalog.example.com/brand/' || brand AS url,
  0 AS table_idx, row_idx, col_idx, cell
FROM cells""",
)
def q_table_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end HTML table extraction: synthesize one catalog page per
    p_brand (header row + one <tr> per part, rows sorted for
    determinism), then parse every page back to (url, table_idx,
    row_idx, col_idx, cell) with extraction/tables.py. The oracle
    computes the expected cells RELATIONALLY from part — the HTML
    round-trip must land byte-identical. Extraction itself is shuffle-
    free narrow work; only the test-scaffold page synthesis aggregates."""
    from finetoo_sp_spark.extraction.tables import extract_tables

    p = T(spark, sf_dir, "part")
    row_str = F.concat(
        F.lit("<tr><td>"), F.col("p_partkey"), F.lit("</td><td>"),
        F.col("p_type"), F.lit("</td><td>"), F.col("p_size"), F.lit("</td></tr>"),
    )
    pages = (
        p.select(F.col("p_brand").alias("brand"), row_str.alias("row_str"))
        .groupBy("brand")
        .agg(F.concat_ws("", F.sort_array(F.collect_list("row_str"))).alias("rows_html"))
        .select(
            F.concat(F.lit("https://catalog.example.com/brand/"), F.col("brand")).alias("url"),
            F.concat(
                F.lit("<html><body><p>catalog</p><table>"
                      "<tr><th>partkey</th><th>type</th><th>size</th></tr>"),
                F.col("rows_html"),
                F.lit("</table></body></html>"),
            ).alias("html"),
        )
    )
    out = extract_tables(pages)
    # header row is row_idx 0; the sorted <tr>s are 1..n by construction
    return out.select("url", "table_idx", "row_idx", "col_idx", "cell")


@_q(
    "crawl_delays",
    """
SELECT DISTINCT source AS host, '*' AS agent,
  CAST(length(source) % 5 + 1 AS BIGINT) AS delay_s
FROM documents""",
)
def q_crawl_delays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-delay extraction: per-host robots.txt synthesized with a
    host-dependent delay (length(host)%5+1), recovered through the
    declarative parse; the politeness input for the streaming
    crawl-rate limiter. Oracle relational."""
    from finetoo_sp_spark.sources.robots import crawl_delays

    d = T(spark, sf_dir, "documents")
    hosts = d.select(F.col("source").alias("host")).distinct()
    robots = hosts.select(
        "host",
        F.concat(
            F.lit("User-agent: *\nCrawl-delay: "),
            (F.length("host") % 5 + 1).cast("string"),
            F.lit("\nDisallow: /tmp"),
        ).alias("robots_txt"),
    )
    return crawl_delays(robots)


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
    "length_buckets",
    f"""
WITH s AS (
  SELECT doc_id AS id, CAST(len({_WORDS_SQL}) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT n_tokens // 64 AS bucket, count(*) AS n_docs,
    CAST(max(n_tokens) AS BIGINT) AS max_tokens,
    CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
  FROM s GROUP BY 1
)
SELECT bucket, n_docs, max_tokens, sum_tokens,
  ((max_tokens * n_docs - sum_tokens) * 1000000)
    // (max_tokens * n_docs) AS pad_ppm
FROM b""",
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste analysis for length-bucketed batch shaping over the
    documents corpus (64-token buckets): per-bucket doc count, exact
    integer-ppm pad fraction. Dimension-sized output."""
    from finetoo_sp_spark.operators.packing import length_buckets

    return length_buckets(T(spark, sf_dir, "documents"), "doc_id", "text", width=64)


@_q(
    "script_profile",
    """
WITH t AS (
  SELECT doc_id AS id,
    text || CASE CAST(doc_id % 3 AS INT)
      WHEN 0 THEN ' привет мир 123'
      WHEN 1 THEN ' 你好世界'
      ELSE '' END AS tx
  FROM documents
)
SELECT id,
  CAST(length(tx) - length(regexp_replace(tx, '\\p{Latin}', '', 'g')) AS BIGINT) AS n_latin,
  CAST(length(tx) - length(regexp_replace(tx, '\\p{Cyrillic}', '', 'g')) AS BIGINT) AS n_cyrillic,
  CAST(length(tx) - length(regexp_replace(tx, '\\p{Han}', '', 'g')) AS BIGINT) AS n_han,
  CAST(length(tx) - length(regexp_replace(tx, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
  CAST(length(tx)
    - (length(tx) - length(regexp_replace(tx, '\\p{Latin}', '', 'g')))
    - (length(tx) - length(regexp_replace(tx, '\\p{Cyrillic}', '', 'g')))
    - (length(tx) - length(regexp_replace(tx, '\\p{Han}', '', 'g')))
    - (length(tx) - length(regexp_replace(tx, '[0-9]', '', 'g')))
    - (length(tx) - length(regexp_replace(tx, '\\s', '', 'g'))) AS BIGINT) AS n_other
FROM t""",
)
def q_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writing-system census with injected multilingual tails (Cyrillic
    + digits for doc_id%3==0, Han for %3==1) so every script branch is
    exercised; Java \\p{IsX} and RE2 \\p{X} agree on these script sets,
    so the counts verify exactly. One narrow JVM pass, no shuffle."""
    from finetoo_sp_spark.operators.textstats import script_profile

    d = T(spark, sf_dir, "documents")
    m = (F.col("doc_id") % 3).cast("int")
    tail = (
        F.when(m == 0, F.lit(" привет мир 123"))
        .when(m == 1, F.lit(" 你好世界"))
        .otherwise(F.lit(""))
    )
    pages = d.select("doc_id", F.concat("text", tail).alias("text"))
    return script_profile(pages, "doc_id", "text")


@_q(
    "budget_alloc",
    """
WITH k AS (SELECT source AS key, count(*) AS weight FROM documents GROUP BY 1),
t AS (SELECT CAST(sum(weight) AS BIGINT) AS wt FROM k),
s AS (
  SELECT key, weight,
    (1000 * weight) // wt AS base, (1000 * weight) % wt AS rem
  FROM k, t
),
l AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS leftover FROM s),
r AS (
  SELECT key, weight, base,
    row_number() OVER (ORDER BY rem DESC, key ASC) AS rn
  FROM s
)
SELECT key, weight,
  CAST(base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r, l""",
)
def q_budget_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment of a 1000-page recrawl
    budget across sources weighted by page count — integer-exact
    (sums to 1000 by construction), deterministic tie-break by key.
    Dimension-sized input; one broadcast scalar + one window rank."""
    from finetoo_sp_spark.operators.budget import allocate_budget

    k = T(spark, sf_dir, "documents").groupBy("source").count()
    return allocate_budget(k, "source", "count", total=1000)


@_q(
    "compaction_plan",
    """
WITH f AS (
  SELECT o_orderpriority AS part, o_orderkey AS file_id,
    CAST(floor(o_totalprice) AS BIGINT) AS bytes
  FROM orders
),
c AS (
  SELECT part, file_id, bytes,
    CAST(coalesce(sum(bytes) OVER (
      PARTITION BY part ORDER BY file_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
  FROM f
),
b AS (SELECT part, file_id, bytes, cb // 1000000 AS bin FROM c)
SELECT part, file_id, bytes, bin,
  count(*) OVER (PARTITION BY part, bin) AS bin_files,
  count(*) OVER (PARTITION BY part, bin) > 1 AS needs_compaction
FROM b""",
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-binpack-style compaction planning over a file manifest
    modeled from orders (partition = priority, size = totalprice):
    greedy 1 MB bins via one integer-exact cumulative-sum window, merge
    tasks = bins holding >1 file. Metadata-sized input, two windows,
    no join."""
    from finetoo_sp_spark.sources.compaction import plan_compaction

    files = T(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("part"),
        F.col("o_orderkey").alias("fid"),
        F.col("o_totalprice").alias("sz"),
    )
    return plan_compaction(files, "part", "fid", "sz", target_bytes=1_000_000)


@_q(
    "robots_gate",
    """
SELECT source AS host,
  CASE CAST(doc_id % 4 AS INT)
    WHEN 0 THEN '/private/' || doc_id
    WHEN 1 THEN '/private/ok/' || doc_id
    WHEN 2 THEN '/public/' || doc_id
    ELSE '/private' || doc_id END AS path,
  doc_id % 4 IN (1, 2) AS allowed
FROM documents""",
)
def q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end robots.txt policy gate: one synthesized robots.txt per
    host (Disallow /private, Allow /private/ok, plus a gptbot group the
    '*' gate must ignore), candidate paths fanned out from documents by
    doc_id%4, then the full parse -> longest-prefix-match pipeline. The
    oracle states the expected verdicts relationally — prefix semantics
    (/privateN blocked), override semantics (/private/ok/N allowed) and
    the no-match default all verify per URL."""
    from finetoo_sp_spark.sources.robots import gate_urls, parse_robots

    d = T(spark, sf_dir, "documents")
    hosts = d.select(F.col("source").alias("host")).distinct()
    robots = hosts.select(
        "host",
        F.lit(
            "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
            "\nUser-agent: GPTBot\nDisallow: /"
        ).alias("robots_txt"),
    )
    m = (F.col("doc_id") % 4).cast("int")
    urls = d.select(
        F.col("source").alias("host"),
        F.when(m == 0, F.concat(F.lit("/private/"), F.col("doc_id")))
        .when(m == 1, F.concat(F.lit("/private/ok/"), F.col("doc_id")))
        .when(m == 2, F.concat(F.lit("/public/"), F.col("doc_id")))
        .otherwise(F.concat(F.lit("/private"), F.col("doc_id")))
        .alias("path"),
    )
    return gate_urls(urls, parse_robots(robots), agent="*")


@_q(
    "robots_gate_wildcard",
    """
SELECT source AS host,
  CASE CAST(doc_id % 6 AS INT)
    WHEN 0 THEN '/file' || doc_id || '.tmp'
    WHEN 1 THEN '/file' || doc_id || '.tmpx'
    WHEN 2 THEN '/tmp-ok/f' || doc_id || '.tmp'
    WHEN 3 THEN '/media/' || doc_id || '/raw'
    WHEN 4 THEN '/tie/a' || doc_id
    ELSE '/pub/' || doc_id END AS path,
  doc_id % 6 IN (1, 2, 4, 5) AS allowed
FROM documents""",
)
def q_robots_gate_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 wildcard/anchor gate end-to-end: robots rules carrying
    '*' (any-sequence) and trailing-'$' (end anchor) patterns, compiled
    declaratively to anchored rlike regexes (literal rules keep the
    startswith fast path). Six path shapes per doc exercise the anchor
    (.tmp vs .tmpx), the longer-wildcard override (/tmp-ok/*.tmp$ beats
    /*.tmp$ on written length), a mid-path wildcard, the Allow-wins
    length tie (/tie/a vs /tie/*), and the no-match default — the
    oracle states every expected verdict relationally."""
    from finetoo_sp_spark.sources.robots import gate_urls, parse_robots

    d = T(spark, sf_dir, "documents")
    hosts = d.select(F.col("source").alias("host")).distinct()
    robots = hosts.select(
        "host",
        F.lit(
            "User-agent: *\nDisallow: /*.tmp$\nAllow: /tmp-ok/*.tmp$\n"
            "Disallow: /media/*/raw\nAllow: /tie/a\nDisallow: /tie/*\n"
            "\nUser-agent: GPTBot\nDisallow: /"
        ).alias("robots_txt"),
    )
    m = (F.col("doc_id") % 6).cast("int")
    urls = d.select(
        F.col("source").alias("host"),
        F.when(m == 0, F.concat(F.lit("/file"), F.col("doc_id"), F.lit(".tmp")))
        .when(m == 1, F.concat(F.lit("/file"), F.col("doc_id"), F.lit(".tmpx")))
        .when(m == 2, F.concat(F.lit("/tmp-ok/f"), F.col("doc_id"), F.lit(".tmp")))
        .when(m == 3, F.concat(F.lit("/media/"), F.col("doc_id"), F.lit("/raw")))
        .when(m == 4, F.concat(F.lit("/tie/a"), F.col("doc_id")))
        .otherwise(F.concat(F.lit("/pub/"), F.col("doc_id")))
        .alias("path"),
    )
    return gate_urls(urls, parse_robots(robots), agent="*")


@_q(
    "phrase_hits",
    f"""
WITH t AS (
  SELECT doc_id AS id, array_to_string({_WORDS_SQL}, ' ') AS t FROM documents
)
SELECT id,
  CAST((length(t) - length(replace(t, 'batch batch', ''))) / 11 AS BIGINT) AS n_hits,
  CAST(strpos(t, 'batch batch') AS INT) AS first_pos
FROM t
WHERE length(t) - length(replace(t, 'batch batch', '')) >= 11""",
)
def q_phrase_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval ('batch batch') via the replace-length
    identity + instr — two JVM string ops, narrow plan, no shuffle;
    the cheap complement to bm25_topk for quoted-phrase queries."""
    from finetoo_sp_spark.operators.retrieval import phrase_hits

    return phrase_hits(T(spark, sf_dir, "documents"), "doc_id", "text", "batch batch")


@_q(
    "shard_assign",
    """
WITH h AS (
  SELECT doc_id AS id, s.g AS shard,
    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#s' || s.g), 1, 15))::BIGINT AS h
  FROM documents, UNNEST(generate_series(0, 8)) AS s(g)
),
r8 AS (
  SELECT id, shard FROM (
    SELECT id, shard,
      row_number() OVER (PARTITION BY id ORDER BY h DESC, shard DESC) AS rn
    FROM h WHERE shard < 8) WHERE rn = 1
),
r9 AS (
  SELECT id, shard FROM (
    SELECT id, shard,
      row_number() OVER (PARTITION BY id ORDER BY h DESC, shard DESC) AS rn
    FROM h) WHERE rn = 1
)
SELECT r8.id, CAST(r8.shard AS INT) AS shard,
  CAST(r9.shard AS INT) AS shard_after,
  r8.shard != r9.shard AS moved
FROM r8 JOIN r9 USING (id)""",
)
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous shard assignment at k=8 plus the k=9 reshard view:
    pure array_max column expression (no explode, no shuffle, no UDF);
    the moved flag demonstrates the minimal-movement property (~1/9 of
    docs move when a shard is added, vs ~8/9 under hash-mod)."""
    from finetoo_sp_spark.operators.sharding import shard_assign

    return shard_assign(
        T(spark, sf_dir, "documents"), "doc_id", n_shards=8, n_shards_after=9
    )


def _curation_v2_oracle() -> str:
    """Composed DuckDB twin of the curation-v2 capstone: the corrupt
    expression and the repair chain are GENERATED from the normalize
    module's tables (single source of truth), then the classifier and
    exact-dedup CTEs mirror their standalone oracles verbatim."""
    from finetoo_sp_spark.operators.normalize import _mojibake, oracle_sql_chain

    corrupt = (
        f"CASE WHEN doc_id % 3 = 0 THEN '{_mojibake(chr(0x201C))}' || text || "
        f"'{_mojibake(chr(0x201D))}' "
        "WHEN doc_id % 3 = 1 THEN replace(text, ' ', chr(160)) ELSE text END"
    )
    repaired = oracle_sql_chain(corrupt)
    return f"""
WITH rep AS (
  SELECT doc_id AS id, {repaired} AS text FROM documents
),
w AS (
  SELECT id, regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
  FROM rep
),
f AS (
  SELECT id, ws[g.i] AS feat
  FROM w, UNNEST(generate_series(1, len(ws))) AS g(i)
  UNION ALL
  SELECT id, ws[g.i] || ' ' || ws[g.i + 1] AS feat
  FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS g(i)
),
sw AS (
  SELECT id,
    ('0x' || substr(md5('w#' ||
       (('0x' || substr(md5(feat), 1, 15))::BIGINT % 65536)), 1, 15)
    )::BIGINT % 2001 - 1000 AS w
  FROM f
),
agg AS (
  SELECT id, count(*) AS n_feats, CAST(sum(w) AS BIGINT) AS margin
  FROM sw GROUP BY 1
),
kept AS (
  SELECT rep.id, rep.text, (agg.margin * 65536) // agg.n_feats AS score_fp
  FROM rep JOIN agg USING (id)
  WHERE (agg.margin * 65536) // agg.n_feats >= 0
),
surv AS (SELECT min(id) AS id FROM kept GROUP BY sha256(text))
SELECT k.id, length(k.text) AS n_chars, k.score_fp
FROM kept k JOIN surv USING (id)"""


@_q("curation_v2", _curation_v2_oracle())
def q_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone #2 — the session-2 operators composed as one lazy plan:
    deterministic corruption (mojibake wrap / NBSP flood by doc_id%3) ->
    normalize_text repair chain -> hashed-linear classifier gate
    (keep score_fp >= 0) -> exact-dedup survivor corpus. Output is the
    surviving docs with repaired length + classifier score; the DuckDB
    twin composes the SAME generated chains, so repair bytes, scores
    and survivor choice all verify end to end. One equi-join of the
    per-id score aggregate back to the text, then the dedup semi-join —
    nothing quadratic, nothing driver-side."""
    from finetoo_sp_spark.operators.classifier import hashed_linear_scores
    from finetoo_sp_spark.operators.dedup import apply_exact_dedup
    from finetoo_sp_spark.operators.normalize import _mojibake, normalize_text

    d = T(spark, sf_dir, "documents")
    m = F.col("doc_id") % 3
    corrupted = (
        F.when(
            m == 0,
            F.concat(
                F.lit(_mojibake(chr(0x201C))), F.col("text"), F.lit(_mojibake(chr(0x201D)))
            ),
        )
        .when(m == 1, F.replace(F.col("text"), F.lit(" "), F.lit(" ")))
        .otherwise(F.col("text"))
    )
    raw = d.select("doc_id", corrupted.alias("text"))
    rep = normalize_text(raw, "doc_id", "text").select(
        F.col("id").alias("doc_id"), "text"
    )
    scores = hashed_linear_scores(rep, "doc_id", "text").filter("keep").select(
        F.col("id").alias("doc_id"), "score_fp"
    )
    kept = rep.join(scores, "doc_id")
    surv = apply_exact_dedup(kept, "doc_id", "text")
    return surv.select(
        F.col("doc_id").alias("id"), F.length("text").alias("n_chars"), "score_fp"
    )


@_q(
    "template_ngrams",
    f"""
WITH w AS (
  SELECT doc_id, source AS host, {_WORDS_SQL} AS ws FROM documents
),
sh AS (
  SELECT DISTINCT host, doc_id, ws[g.i] || ' ' || ws[g.i + 1] AS shingle
  FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS g(i)
),
dfc AS (SELECT host, shingle, count(*) AS n_docs FROM sh GROUP BY 1, 2),
hp AS (
  SELECT host, count(*) AS host_pages FROM w GROUP BY 1
  HAVING count(*) >= 10
)
SELECT host, shingle, n_docs, host_pages,
  (n_docs * 1000000) // host_pages AS share_ppm
FROM dfc JOIN hp USING (host)
WHERE (n_docs * 1000000) // host_pages >= 150000""",
)
def q_template_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level template/boilerplate mining: bigram shingles recurring
    on >= 15% of a host's pages (hosts with >= 10 pages). Per-doc
    distinct shingles -> (host, shingle) counts -> host page-count
    dimension equi-join; exact integer ppm share."""
    from finetoo_sp_spark.operators.textstats import template_ngrams

    return template_ngrams(
        T(spark, sf_dir, "documents"), "source", "doc_id", "text",
        n=2, min_pages=10, ratio_ppm=150_000,
    )


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


@_q(
    "normalize_mojibake",
    """
SELECT doc_id AS id,
  CASE WHEN doc_id % 3 = 0 THEN '"' || text || '"' ELSE text END AS text,
  doc_id % 3 IN (0, 1) AS changed
FROM documents""",
)
def q_normalize_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end mojibake repair: corrupt each document deterministically
    (doc_id%3==0 -> wrapped in CP1252-mojibake curly quotes, %3==1 ->
    every space becomes NBSP, else untouched), run the repair chain, and
    check against the relational expectation — repaired text must be
    byte-identical to the clean original (+ folded ascii quotes) and the
    changed flag exact. Pure codegen'd replace chain, no shuffle."""
    from finetoo_sp_spark.operators.normalize import _mojibake, normalize_text

    d = T(spark, sf_dir, "documents")
    m = F.col("doc_id") % 3
    corrupted = (
        F.when(m == 0, F.concat(F.lit(_mojibake("“")), F.col("text"), F.lit(_mojibake("”"))))
        .when(m == 1, F.replace(F.col("text"), F.lit(" "), F.lit("\u00a0")))
        .otherwise(F.col("text"))
    )
    pages = d.select("doc_id", corrupted.alias("text"))
    return normalize_text(pages, "doc_id", "text")


@_q(
    "skew_report",
    """
WITH c AS (SELECT user_id AS key, count(*) AS n_rows FROM events GROUP BY 1),
t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM c)
SELECT key, n_rows,
  (n_rows * 1000000) // total AS share_ppm,
  CASE WHEN n_rows > 50 THEN (n_rows + 49) // 50 ELSE 1 END AS salt_buckets,
  n_rows > 50 AS is_hot
FROM c, t""",
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew advisor over events.user_id with target=50 rows/task (small
    so the hot branch is exercised at test scale): per-key counts, exact
    integer ppm share, recommended salt factor. One partially-aggregated
    groupBy + a broadcast single-row total."""
    from finetoo_sp_spark.operators.skew import skew_report

    return skew_report(T(spark, sf_dir, "events"), "user_id", target_rows_per_task=50)


@_q(
    "compliance_flags",
    """
SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url,
  CASE CAST(doc_id % 4 AS INT)
    WHEN 0 THEN 'noindex, nofollow'
    WHEN 1 THEN 'index, follow'
    WHEN 2 THEN 'noai' ELSE '' END AS robots,
  doc_id % 4 = 0 AS noindex,
  doc_id % 4 = 0 AS nofollow,
  doc_id % 4 = 2 AS noai,
  CASE WHEN doc_id % 2 = 0
    THEN 'https://creativecommons.org/licenses/by/4.0/' ELSE '' END AS license
FROM documents""",
)
def q_compliance_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end opt-out signal extraction: synthesize doc pages where
    doc_id % 4 picks the robots directive (noindex+nofollow / index /
    noai / no meta at all) and doc_id % 2 adds a rel=license link, then
    recover every signal with extraction/compliance.py. Oracle computes
    the expected flags relationally. Narrow plan, no shuffle."""
    from finetoo_sp_spark.extraction.compliance import compliance_flags

    d = T(spark, sf_dir, "documents")
    m = (F.col("doc_id") % 4).cast("int")
    robots_meta = (
        F.when(m == 0, F.lit('<meta name="robots" content="noindex, nofollow">'))
        .when(m == 1, F.lit('<meta name="robots" content="index, follow">'))
        .when(m == 2, F.lit('<meta name="robots" content="noai">'))
        .otherwise(F.lit(""))
    )
    license_link = F.when(
        F.col("doc_id") % 2 == 0,
        F.lit('<link rel="license" href="https://creativecommons.org/licenses/by/4.0/">'),
    ).otherwise(F.lit(""))
    pages = d.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"), F.col("doc_id")
        ).alias("url"),
        F.concat(
            F.lit("<html><head>"), robots_meta, license_link,
            F.lit("<title>t</title></head><body><p>body</p></body></html>"),
        ).alias("html"),
    )
    return compliance_flags(pages)


@_q(
    "jsonld_extract",
    """
SELECT 'https://shop.example.com/order/' || o_orderkey AS url,
  0 AS blob_idx,
  o_orderkey AS order_number,
  o_totalprice AS price,
  o_orderstatus AS status
FROM orders""",
)
def q_jsonld_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end JSON-LD extraction: synthesize one shop page per order
    with an embedded schema.org Order blob (plus a decoy plain <script>),
    lift the blob back out with extraction/jsonld.py and type the fields
    via get_json_object. The oracle computes the expected values
    RELATIONALLY from orders, so the double/long/string fields must
    round-trip the HTML+JSON encoding byte-exactly. Narrow plan — no
    shuffle anywhere."""
    from finetoo_sp_spark.extraction.jsonld import extract_jsonld

    o = T(spark, sf_dir, "orders")
    pages = o.select(
        F.concat(F.lit("https://shop.example.com/order/"), F.col("o_orderkey")).alias("url"),
        F.concat(
            F.lit('<html><head><script>var t = 1;</script>'
                  '<script type="application/ld+json">{"@type":"Order","orderNumber":'),
            F.col("o_orderkey"),
            F.lit(',"price":'),
            F.col("o_totalprice").cast("string"),
            F.lit(',"status":"'),
            F.col("o_orderstatus"),
            F.lit('"}</script></head><body><p>order page</p></body></html>'),
        ).alias("html"),
    )
    out = extract_jsonld(
        pages,
        fields={
            "order_number": "$.orderNumber",
            "price": "$.price",
            "status": "$.status",
        },
    )
    return out.select(
        "url",
        "blob_idx",
        F.col("order_number").cast("long").alias("order_number"),
        F.col("price").cast("double").alias("price"),
        "status",
    )


@_q(
    "classifier_scores",
    f"""
WITH w AS (
  SELECT doc_id AS id, {_WORDS_SQL} AS ws FROM documents
),
f AS (
  SELECT id, ws[g.i] AS feat
  FROM w, UNNEST(generate_series(1, len(ws))) AS g(i)
  UNION ALL
  SELECT id, ws[g.i] || ' ' || ws[g.i + 1] AS feat
  FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS g(i)
),
sw AS (
  SELECT id,
    ('0x' || substr(md5('w#' ||
       (('0x' || substr(md5(feat), 1, 15))::BIGINT % 65536)), 1, 15)
    )::BIGINT % 2001 - 1000 AS w
  FROM f
),
agg AS (
  SELECT id, count(*) AS n_feats, CAST(sum(w) AS BIGINT) AS margin
  FROM sw GROUP BY 1
)
SELECT id, n_feats,
  (margin * 65536) // n_feats AS score_fp,
  (margin * 65536) // n_feats >= 0 AS keep
FROM agg""",
)
def q_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality classifier (CCNet/FineWeb-style model-based
    filter, apply side) with the deterministic hash-derived weight
    table: unigram+bigram feature instances, portable 60-bit md5 bucket
    hash, integer fixed-point length-normalized margin, keep = score >= 0.
    Default path has NO join — explode -> inline weight eval -> one
    partial agg; with a trained weight table it is a broadcast probe."""
    from finetoo_sp_spark.operators.classifier import hashed_linear_scores

    return hashed_linear_scores(
        T(spark, sf_dir, "documents"), "doc_id", "text",
        n_buckets=1 << 16, weight_span=1000, scale=1 << 16, threshold_fp=0,
    )


_BM25_TERMS = ("spark", "stream", "dup", "customer")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@_q(
    "bm25_topk",
    f"""
WITH d AS (
  SELECT doc_id AS id, {_WORDS_SQL} AS ws FROM documents
),
staged AS (SELECT id, len(ws) AS dl, ws FROM d),
stats AS (
  SELECT CAST(sum(dl) // count(*) AS BIGINT) AS avgdl,
         count(*) AS n_docs
  FROM staged
),
tf AS (
  SELECT id, dl, t.term, count(*) AS tf
  FROM staged, UNNEST(ws) AS t(term)
  WHERE t.term IN ({_BM25_TERMS_SQL})
  GROUP BY 1, 2, 3
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT id,
    (((n_docs - df) * 1024) // (df + 1))
    * ((2200 * tf * avgdl * 1024)
       // (1000 * tf * avgdl + 300 * avgdl + 900 * dl)) AS term_score
  FROM tf JOIN dfreq USING (term), stats
),
agg AS (SELECT id, CAST(sum(term_score) AS BIGINT) AS score FROM scored GROUP BY 1)
SELECT id, score,
  CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM agg ORDER BY score DESC, id ASC LIMIT 10""",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rational-BM25 keyword retrieval: top-10 documents for a fixed
    4-term query. Integer fixed-point scoring (retrieval.py docstring has
    the derivation) so the DuckDB twin reproduces scores bit-for-bit.
    Corpus side is explode -> term filter -> one (doc, term) partial agg;
    df/avgdl are broadcast dimensions; final top-k is a global limit
    (TakeOrdered), never a full sort."""
    from finetoo_sp_spark.operators.retrieval import bm25_topk

    return bm25_topk(
        T(spark, sf_dir, "documents"), "doc_id", "text", list(_BM25_TERMS), k=10
    )


# --- late-bound oracles (need _blocks_cte, defined above) -----------------

_PLACEHOLDER_ORACLES = {
    "__BLOCK_DIVERGENCE_ORACLE__": f"""
WITH {_blocks_cte()}
SELECT tag || '#' || CAST(block_id AS VARCHAR) AS name,
  count(DISTINCT url) AS n_docs,
  count(DISTINCT sha256(btext)) AS n_versions,
  count(DISTINCT sha256(btext)) > 1 AS is_divergent
FROM blocks GROUP BY 1""",
    "__DIVERGENCE_TOTALS_ORACLE__": f"""
WITH {_blocks_cte()},
r AS (
  SELECT tag || '#' || CAST(block_id AS VARCHAR) AS name,
    count(DISTINCT btext) AS v
  FROM blocks GROUP BY 1
)
SELECT count(*) AS total_names,
  CAST(sum(CASE WHEN v > 1 THEN 1 ELSE 0 END) AS BIGINT) AS divergent,
  CAST(sum(CASE WHEN v <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS consistent
FROM r""",
    "__SHARED_BLOCKS_ORACLE__": f"""
WITH {_blocks_cte()}
SELECT tag || '#' || CAST(block_id AS VARCHAR) AS name,
  count(DISTINCT url) AS n_docs
FROM blocks GROUP BY 1 HAVING count(DISTINCT url) >= 2""",
    "__BLOCK_COMPARISON_ORACLE__": f"""
WITH {_blocks_cte("doc_id < 20 OR (doc_id BETWEEN 250 AND 269)")},
a AS (
  SELECT doc_id AS pair_id, tag || '#' || CAST(block_id AS VARCHAR) AS name, btext
  FROM blocks WHERE doc_id < 20
), b AS (
  SELECT doc_id - 250 AS pair_id, tag || '#' || CAST(block_id AS VARCHAR) AS name, btext
  FROM blocks WHERE doc_id >= 250
)
SELECT pair_id, name,
  TRUE AS in_a, TRUE AS in_b,
  (a.btext = b.btext) AS is_equal,
  CAST(length(b.btext) - length(a.btext) AS BIGINT) AS chars_delta,
  CAST(len(regexp_split_to_array(b.btext, ' ')) - len(regexp_split_to_array(a.btext, ' ')) AS BIGINT) AS words_delta
FROM a JOIN b USING (pair_id, name)""",
    "__BLOCK_CANONICAL_ORACLE__": f"""
WITH {_blocks_cte()},
v AS (
  SELECT tag || '#' || CAST(block_id AS VARCHAR) AS name,
    sha256(btext) AS canonical_hash,
    count(*) AS n_docs_version, min(url) AS example_doc
  FROM blocks GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY name ORDER BY n_docs_version DESC, canonical_hash) AS rk
  FROM v
)
SELECT name, canonical_hash, n_docs_version, example_doc FROM r WHERE rk = 1""",
    "__BOM_TEXT_ORACLE__": """
WITH l AS (
  SELECT CAST(floor(doc_id / 2) AS BIGINT) AS t FROM documents
  UNION ALL SELECT CAST(floor(doc_id / 3) AS BIGINT) FROM documents
), bom AS (
  SELECT 'https://src' || CAST(t % 20 AS VARCHAR) || '.example.com/doc/' || CAST(t AS VARCHAR) AS part,
    count(*) AS quantity
  FROM l GROUP BY t
)
SELECT CAST(0 AS BIGINT) AS line_no, rpad('PART', 40, ' ') || lpad('QTY', 8, ' ') AS line
UNION ALL
SELECT CAST(1 AS BIGINT), repeat('-', 48)
UNION ALL
SELECT CAST(row_number() OVER (ORDER BY quantity DESC, part) + 1 AS BIGINT),
  rpad(part, 40, ' ') || lpad(CAST(quantity AS VARCHAR), 8, ' ')
FROM bom""",
}

_REGISTRY[:] = [
    (n, f, _PLACEHOLDER_ORACLES.get(s, s) if s is not None else None)
    for (n, f, s) in _REGISTRY
]


# ---------------------------------------------------------------- exports


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, fn, _ in _REGISTRY}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, _, sql in _REGISTRY if sql is not None}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end extraction over sf0.001 documents-as-pages."""
    return q_extract_main_text(spark, "/root/testdata/sf0.001")
