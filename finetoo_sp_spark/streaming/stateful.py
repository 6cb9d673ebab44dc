"""Custom stateful streaming operator: per-host crawl accounting.

Demonstrates arbitrary stateful processing (`applyInPandasWithState`) —
the escape hatch for operators Structured Streaming's built-in
aggregations can't express. Here: a per-host monitor that carries
(total pages, total bytes, batches seen) across micro-batches and emits
one updated row per host per batch — the streaming analogue of the
extraction-rate metrics manifest.

State shape and batch shape are real; the update function is vectorized
per group-batch (pandas ops only). At web scale the grouping key is
host — skewed — so upstream salting (url_salt) applies when a single
host's per-batch volume exceeds one task's comfort; state then shards
as (host, salt) and a downstream batch query folds shards.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("total_pages", LongType()),
        StructField("total_bytes", LongType()),
        StructField("batches_seen", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("total_pages", LongType()),
        StructField("total_bytes", LongType()),
        StructField("batches_seen", LongType()),
    ]
)


def _update_host(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (host,) = key
    pages = 0
    nbytes = 0
    for pdf in batches:
        pages += len(pdf)
        nbytes += int(pdf["n_bytes"].sum())
    if state.exists:
        tp, tb, bs = state.get
    else:
        tp, tb, bs = 0, 0, 0
    tp, tb, bs = tp + pages, tb + nbytes, bs + 1
    state.update((tp, tb, bs))
    yield pd.DataFrame(
        {"host": [host], "total_pages": [tp], "total_bytes": [tb], "batches_seen": [bs]}
    )


def host_crawl_state(pages_stream: DataFrame) -> DataFrame:
    """Streaming (host -> cumulative crawl stats), one row per host per
    micro-batch in update mode."""
    per_host = pages_stream.select(
        F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host"),
        F.length("html").cast("long").alias("n_bytes"),
    )
    return per_host.groupBy("host").applyInPandasWithState(
        _update_host,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
