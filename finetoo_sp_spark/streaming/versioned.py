"""Exactly-once streaming commits into the snapshot-log table.

Structured Streaming's foreachBatch is at-least-once: after a crash
between the batch write and the checkpoint advance, the same epoch is
REPLAYED. The classic fix is an idempotent sink keyed by epoch id —
here each micro-batch becomes one table version whose manifest records
its epoch, and a replayed epoch is detected and SKIPPED before any
write, so the versioned table sees every micro-batch exactly once.

This is the from-scratch analogue of Iceberg's streaming sink (which
stores the checkpointed batch id in snapshot summary metadata and skips
already-committed batches on restart).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from finetoo_sp_spark.sources.table import (
    _load_manifest,
    _publish,
    current_version,
)


def committed_epochs(path: str) -> set[int]:
    """Epoch ids already committed to the table at ``path``."""
    latest = current_version(path)
    out: set[int] = set()
    for v in range(0, (latest + 1) if latest is not None else 0):
        m = _load_manifest(path, v)
        if "epoch" in m and m["epoch"] is not None:
            out.add(int(m["epoch"]))
    return out


def versioned_epoch_sink(path: str):
    """foreachBatch callable: commit each micro-batch as one APPEND
    version stamped with its epoch id; replayed epochs are skipped
    before any file is written (exactly-once on restart)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if int(epoch_id) in committed_epochs(path):
            return  # replay after crash: this epoch is already in the table
        import uuid

        snap_dir = os.path.join(path, "data", uuid.uuid4().hex)
        batch_df.write.mode("error").parquet(snap_dir)
        new_files = sorted(
            os.path.join("data", os.path.basename(snap_dir), f)
            for f in os.listdir(snap_dir)
            if f.endswith(".parquet")
        )
        parent = current_version(path)
        files = new_files if parent is None else (
            _load_manifest(path, parent)["files"] + new_files
        )
        # the epoch id rides the SAME atomic manifest publish as the file
        # list — a crash can never leave a committed-but-unstamped epoch
        _publish(path, files, "stream-append", parent, extra={"epoch": int(epoch_id)})

    return sink
