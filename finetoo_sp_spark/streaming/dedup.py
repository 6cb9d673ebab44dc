"""Streaming cross-batch exact deduplication.

Training-data ingest wants dedup AS the data arrives, not as a later
batch pass: a page recrawled in micro-batch 40 must be dropped because
its content hash was first seen in micro-batch 3. Structured Streaming's
built-in dropDuplicates needs watermark-bounded state; content-hash
dedup has no event-time bound, so this is a custom stateful operator
(``applyInPandasWithState`` — the same escape hatch as
streaming/stateful.py).

Sharding: state is keyed on ``shard = hash(content_sha) % n_shards`` so
the seen-set distributes evenly across tasks (content hashes are
uniform — no hot shard possible). Per shard the state row holds the
sorted array of seen hashes; memory per shard = seen/n_shards hashes.
``state_cap`` bounds each shard's set — beyond it new hashes pass
through undeduplicated (documented fail-open: at true 10^12 scale this
operator holds a sketch/Bloom tier or an external state store; the
plumbing and semantics here are the real thing, the in-memory set is
the sandbox-sized state backend).

Within-batch ties are broken deterministically (min url per hash), so
the survivor set is a pure function of the input multiset — the same
determinism contract as the batch path's min-id rule.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([StructField("seen", ArrayType(StringType()))])

OUT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("content_sha", StringType()),
        StructField("shard", IntegerType()),
    ]
)

DEFAULT_STATE_CAP = 200_000


def _dedup_group(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        if pdf.empty:
            continue
        # deterministic within-batch survivor: min url per content hash
        pdf = pdf.sort_values(["content_sha", "url"], kind="mergesort").drop_duplicates(
            "content_sha"
        )
        fresh = pdf[~pdf["content_sha"].isin(seen)]
        if len(fresh):
            seen.update(fresh["content_sha"])
            yield fresh[["url", "content_sha", "shard"]]
    if len(seen) <= DEFAULT_STATE_CAP:
        state.update((sorted(seen),))  # sorted: byte-stable state rows


def stream_exact_dedup(pages_stream: DataFrame, n_shards: int = 64) -> DataFrame:
    """First-seen filter over a pages stream: emits (url, content_sha,
    shard) for pages whose content hash has not appeared in ANY earlier
    micro-batch (nor earlier in this one)."""
    keyed = pages_stream.select(
        "url", F.sha2(F.col("text"), 256).alias("content_sha")
    ).withColumn("shard", F.pmod(F.xxhash64("content_sha"), F.lit(n_shards)).cast("int"))
    return keyed.groupBy("shard").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
