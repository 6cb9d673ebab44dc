"""Rendezvous (highest-random-weight) shard assignment.

Training-pipeline extension (no reference analogue): output corpora are
written in shards, and naive ``hash(id) % k`` reassigns almost EVERY
document when k changes — a full-corpus rewrite at 10^12 rows.
Rendezvous hashing (Thaler & Ravishankar 1998) assigns each doc to
``argmax over shards of hash(id, shard)``: adding one shard moves only
~1/(k+1) of the documents, so an incremental reshard touches exactly
the moved slice.

Implementation is a pure column expression — the k candidate hashes are
built as an ``array<struct<h, shard>>`` and the winner is
``array_max`` (lexicographic struct compare: highest hash, ties to the
highest shard id). No explode, no shuffle, no UDF; k is a few dozen at
most, so the unrolled array is tiny. The hash is the portable 60-bit
md5 (importance._bucket's base form), so a DuckDB oracle reproduces
every assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _hrw_hash(id_col, shard: int) -> Column:
    """Portable 60-bit hash of (id, shard) — md5-based like the rest of
    the oracle'd hash family."""
    key = F.concat(id_col.cast("string"), F.lit(f"#s{shard}"))
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def shard_of(id_col, n_shards: int) -> Column:
    """Column: the rendezvous shard in [0, n_shards) for ``id_col``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    cands = F.array(
        *[F.struct(_hrw_hash(c, s).alias("h"), F.lit(s).alias("shard")) for s in range(n_shards)]
    )
    return F.array_max(cands)["shard"]


def shard_assign(
    docs: DataFrame, id_col: str, n_shards: int, n_shards_after: int | None = None
) -> DataFrame:
    """(id, shard [, shard_after, moved]) — rendezvous assignment, and
    when ``n_shards_after`` is given the post-reshard assignment plus a
    moved flag (expected moved fraction between k and k' > k is
    (k'-k)/k' — the minimal-movement property this operator exists for)."""
    out = docs.select(
        F.col(id_col).alias("id"), shard_of(id_col, n_shards).alias("shard")
    )
    if n_shards_after is None:
        return out
    return out.withColumn(
        "shard_after", shard_of("id", n_shards_after)
    ).withColumn("moved", F.col("shard") != F.col("shard_after"))
