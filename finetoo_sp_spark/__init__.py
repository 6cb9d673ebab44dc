"""finetoo_sp_spark — a PySpark-native structured-document extraction engine.

A from-scratch reimplementation of the *capabilities* of the Finetoo
Structuring Protocol (reference: bon-cdp/finetoo_sp, a C++20 schema-driven
extraction engine) as an idiomatic Spark pipeline:

- schema-driven tokenize -> tree/region build -> region classification ->
  typed-field + main-text + span extraction (``extraction/``), all inside
  vectorized pandas/Arrow UDFs — the web analogue of the reference's DXF
  parser (reference: src/parser/dxf_text_parser.cc) and semantic block
  classifier (reference: docs/SEMANTIC_UNDERSTANDING.md);
- the reference's 8 generic relational primitives
  (reference: src/operations/operation_executor.h:28-60) as DataFrame
  combinators plus a plan interpreter (``operators/``);
- schema registry with per-property operational metadata and operator
  discovery (reference: src/schema/schema_analyzer.cc) (``schema/``);
- content hashing / divergence analytics
  (reference: src/graph/block_analyzer.cc) (``operators/divergence.py``);
- large-scale training-data pipeline ops: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding cosine), similarity search, text
  quality analytics (``operators/dedup.py``, ``operators/similarity.py``,
  ``operators/textstats.py``), event windows (``operators/windows.py``),
  near-dup clustering (``operators/components.py``), multimodal plumbing
  (``multimodal.py``), JSON/CSV sinks (``operators/sinks.py``);
- per-partition lineage manifests + checkpoint resume (``sources/lineage.py``)
  behind an Iceberg-or-parquet catalog seam (``sources/catalog.py``);
- Structured Streaming ingestion with an idempotent micro-batch sink and a
  custom stateful operator (``streaming/``);
- a parallel PDF layout-analysis path (``extraction/pdf.py``) and binder
  generation (``extraction/binder.py``);
- as-of and bucketed range joins (``operators/asof.py``);
- a deterministic NL-front-end scaffold: schema -> planner prompt +
  QueryResponse assembly (``plans/frontend.py``).

Everything is DataFrame/SQL-first: Catalyst owns predicate pushdown, column
pruning and join strategy; Python appears only inside Arrow-batched pandas
UDFs (never row-at-a-time).
"""

__version__ = "0.1.0"
