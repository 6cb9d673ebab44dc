"""Streaming cross-batch exact deduplication with a bounded-memory
Bloom tier.

Training-data ingest wants dedup AS the data arrives, not as a later
batch pass: a page recrawled in micro-batch 40 must be dropped because
its content hash was first seen in micro-batch 3. Structured Streaming's
built-in dropDuplicates needs watermark-bounded state; content-hash
dedup has no event-time bound, so this is a custom stateful operator
(``applyInPandasWithState`` — the same escape hatch as
streaming/stateful.py).

Sharding: state is keyed on ``shard = hash(content_sha) % n_shards`` so
the seen-set distributes evenly across tasks (content hashes are
uniform — no hot shard possible).

Two-tier state, both bounded:

* **exact tier** — while a shard has seen <= ``state_cap`` distinct
  hashes, the state row holds the sorted array of seen hashes and the
  filter is exact (zero false drops, zero false passes).
* **bloom tier** — the first time a shard exceeds ``state_cap`` the
  whole seen-set is folded into a Bloom filter of ``bloom_bits`` bits
  with ``k_hashes`` deterministic hash functions (disjoint 48-bit
  slices of the sha256 hex digest — no RNG, byte-stable across runs),
  and the exact array is dropped. From then on membership tests go
  through the filter: memory is fixed at ``bloom_bits/8`` bytes per
  shard forever, duplicates are still always dropped (a Bloom filter
  has no false negatives), and the only degradation is a bounded
  false-DROP rate for genuinely novel pages of
  ``(1 - exp(-k*n/m))**k`` (n = distinct hashes seen, m = bloom_bits).
  At the defaults (m = 2^23, k = 5) a shard that has absorbed one
  million hashes mistakenly drops ~1.8% of novel pages — the standard
  dedup-at-ingest trade (dropping a few extra pages is cheap; letting
  duplicates through is what the operator exists to prevent). Each
  output row carries its ``tier`` so degraded operation is observable
  downstream, and ``n_seen`` in the state row keeps the true distinct
  count for metrics.

Determinism: each micro-batch is concatenated across Arrow chunks
before deduplicating, so the within-batch survivor for a hash is the
min url over the WHOLE batch (a pure function of the batch multiset,
matching the batch path's min-id rule). Bloom insertion is bitwise OR —
order-independent — so the bloom-tier state is equally a pure function
of the hash set.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("seen", ArrayType(StringType())),
        StructField("bloom", BinaryType()),
        StructField("n_seen", LongType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("content_sha", StringType()),
        StructField("shard", IntegerType()),
        StructField("tier", StringType()),
    ]
)

DEFAULT_STATE_CAP = 200_000
DEFAULT_BLOOM_BITS = 1 << 23  # 1 MiB per shard in the bloom tier
DEFAULT_K_HASHES = 5


def _bloom_indexes(shas, bloom_bits: int, k: int) -> np.ndarray:
    """k deterministic bit positions per sha256 hex digest: disjoint
    12-hex-char (48-bit) slices reduced mod bloom_bits. k<=5 uses 60 of
    the 64 hex chars; no RNG, no seed — byte-stable across runs."""
    out = np.empty((len(shas), k), dtype=np.int64)
    for j, s in enumerate(shas):
        for i in range(k):
            out[j, i] = int(s[i * 12 : (i + 1) * 12], 16) % bloom_bits
    return out


def _bloom_add(bloom: np.ndarray, shas, bloom_bits: int, k: int) -> None:
    if not len(shas):
        return
    idx = _bloom_indexes(shas, bloom_bits, k).ravel()
    np.bitwise_or.at(bloom, idx >> 3, (1 << (idx & 7)).astype(np.uint8))


def _bloom_contains(bloom: np.ndarray, shas, bloom_bits: int, k: int) -> np.ndarray:
    if not len(shas):
        return np.zeros(0, dtype=bool)
    idx = _bloom_indexes(shas, bloom_bits, k)
    bits = (bloom[idx >> 3] >> (idx & 7)) & 1
    return bits.all(axis=1)


def _make_dedup_group(state_cap: int, bloom_bits: int, k_hashes: int):
    def _dedup_group(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            seen_list, bloom_bytes, n_seen = state.get
            seen = set(seen_list) if seen_list else set()
            bloom = (
                np.frombuffer(bloom_bytes, dtype=np.uint8).copy()
                if bloom_bytes is not None
                else None
            )
            n_seen = int(n_seen or 0)
        else:
            seen, bloom, n_seen = set(), None, 0

        # one frame per micro-batch: the min-url survivor rule must see
        # the whole batch, not one Arrow chunk at a time
        chunks = [p for p in pdfs if not p.empty]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            batch = batch.sort_values(
                ["content_sha", "url"], kind="mergesort"
            ).drop_duplicates("content_sha")

            if bloom is None:
                fresh = batch[~batch["content_sha"].isin(seen)]
                if len(fresh):
                    seen.update(fresh["content_sha"])
                    n_seen += len(fresh)
                    yield fresh[["url", "content_sha", "shard"]].assign(tier="exact")
                if len(seen) > state_cap:
                    # tier migration: fold the exact set into the bloom,
                    # drop the array — memory is fixed from here on
                    bloom = np.zeros(bloom_bits // 8, dtype=np.uint8)
                    _bloom_add(bloom, sorted(seen), bloom_bits, k_hashes)
                    seen = set()
            else:
                novel = ~_bloom_contains(
                    bloom, batch["content_sha"].tolist(), bloom_bits, k_hashes
                )
                fresh = batch[novel]
                if len(fresh):
                    _bloom_add(bloom, fresh["content_sha"].tolist(), bloom_bits, k_hashes)
                    n_seen += len(fresh)
                    yield fresh[["url", "content_sha", "shard"]].assign(tier="bloom")

        state.update(
            (
                sorted(seen),  # sorted: byte-stable state rows
                bloom.tobytes() if bloom is not None else None,
                n_seen,
            )
        )

    return _dedup_group


def stream_exact_dedup(
    pages_stream: DataFrame,
    n_shards: int = 64,
    state_cap: int = DEFAULT_STATE_CAP,
    bloom_bits: int = DEFAULT_BLOOM_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """First-seen filter over a pages stream: emits (url, content_sha,
    shard, tier) for pages whose content hash has not appeared in ANY
    earlier micro-batch (nor earlier in this one). ``tier`` is 'exact'
    while the shard's state is below ``state_cap`` distinct hashes and
    'bloom' after it migrates to the fixed-size Bloom filter (see
    module docstring for the bounded false-drop rate)."""
    keyed = pages_stream.select(
        "url", F.sha2(F.col("text"), 256).alias("content_sha")
    ).withColumn("shard", F.pmod(F.xxhash64("content_sha"), F.lit(n_shards)).cast("int"))
    return keyed.groupBy("shard").applyInPandasWithState(
        _make_dedup_group(state_cap, bloom_bits, k_hashes),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
