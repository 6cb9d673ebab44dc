"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end extraction (documents ->
deterministic HTML pages -> vectorized boilerplate-stripping kernel ->
(url, text, spans-adjacent fields)); ``queries()`` exposes one entry per
implemented operator from SURVEY.md §2 plus the training-data-pipeline
extensions (dedup / similarity / text analysis / events / multimodal);
``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible one. Implementations live in finetoo_sp_spark.contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from finetoo_sp_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
