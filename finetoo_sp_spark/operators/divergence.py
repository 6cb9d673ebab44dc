"""Cross-document divergence analytics + BOM-style rollups.

Reference surface:
- BlockDivergenceReport (reference: proto/graph.proto:184-207;
  src/graph/block_analyzer.cc:10-20): per block name, the distinct
  content-hash versions across documents; divergent iff >1 version.
- Shared blocks (block_analyzer.cc:45-52 skeleton): names present in >=2
  documents.
- BOM back-join (reference: src/export/bom_exporter.cc:36-80 — an
  O(parts x nodes) nested rescan): per referenced part, instance count +
  the set of source documents. Spark replaces the nested loop with one
  groupBy + hash join (SURVEY.md C5).

All functions are generic over (doc, name, content-hash) shaped frames so
they serve both the web graph (blocks per page) and any relational table
the driver checks against a SQL oracle.

Scale: single shuffle per report (groupBy name); collect_set/sort_array
keeps output deterministic regardless of partition order (the E3/E8
determinism discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finetoo_sp_spark.operators.primitives import PropertyGraphFrames


def divergence_report(
    df: DataFrame, name_col: str, doc_col: str, hash_col: str
) -> DataFrame:
    """Per name: version count, divergence flag, deterministic version list.

    Output: name, n_docs, n_versions, is_divergent,
    versions (sorted array of struct(doc, content_hash)).
    """
    return (
        df.groupBy(F.col(name_col).alias("name"))
        .agg(
            F.countDistinct(doc_col).alias("n_docs"),
            F.countDistinct(hash_col).alias("n_versions"),
            F.sort_array(
                F.collect_set(
                    F.struct(F.col(doc_col).alias("doc"), F.col(hash_col).alias("content_hash"))
                )
            ).alias("versions"),
        )
        .withColumn("is_divergent", F.col("n_versions") > 1)
        .select("name", "n_docs", "n_versions", "is_divergent", "versions")
        .orderBy("name")
    )


def divergence_totals(report: DataFrame) -> DataFrame:
    """Totals row (reference: proto/graph.proto:199-206): consistent vs
    divergent block-name counts."""
    return report.agg(
        F.count(F.lit(1)).alias("total_names"),
        F.sum(F.when(F.col("is_divergent"), 1).otherwise(0)).alias("divergent"),
        F.sum(F.when(~F.col("is_divergent"), 1).otherwise(0)).alias("consistent"),
    )


def shared_names(df: DataFrame, name_col: str, doc_col: str, min_docs: int = 2) -> DataFrame:
    """Names present in >= min_docs distinct documents (n-way intersect,
    reference: block_analyzer.cc:45-52)."""
    return (
        df.groupBy(F.col(name_col).alias("name"))
        .agg(F.countDistinct(doc_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .orderBy("name")
    )


def bom_report(g: PropertyGraphFrames, edge_type: str = "LINKS_TO") -> DataFrame:
    """Per referenced target: instance count + sorted source list
    (reference BOM semantics: INSERT count per block name + source
    drawings, bom_exporter.cc:36-89, sorted by quantity desc :83-88).

    One groupBy replaces the reference's nested rescan; sort_array keeps
    the provenance list deterministic.
    """
    refs = g.edges.filter(F.col("edge_type") == edge_type)
    return (
        refs.groupBy(F.col("dst").alias("part"))
        .agg(
            F.count(F.lit(1)).alias("quantity"),
            F.sort_array(F.collect_set("src")).alias("sources"),
        )
        .orderBy(F.desc("quantity"), F.asc("part"))
    )


def bom_totals(bom: DataFrame) -> DataFrame:
    """Reference: total_unique_parts + total_instances
    (bom_exporter.cc:161-168)."""
    return bom.agg(
        F.count(F.lit(1)).alias("total_unique_parts"),
        F.sum("quantity").alias("total_instances"),
    )
