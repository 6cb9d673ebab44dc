"""Manifest file statistics + data-skipping reads (sources/table.py):
hand-pinned skip counts over commits with known disjoint ranges."""

import os
import shutil
import tempfile

import pytest

from finetoo_sp_spark.sources.table import (
    commit_version,
    read_version_pruned,
    rollback,
    upsert_version,
)


@pytest.fixture()
def tdir():
    d = os.path.join(tempfile.gettempdir(), "finetoo_test_prune")
    shutil.rmtree(d, ignore_errors=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _commit_range(spark, path, lo, hi, mode, stats=True):
    df = spark.range(lo, hi).selectExpr("id AS k", "id * 2 AS v").coalesce(1)
    return commit_version(
        df, path, mode=mode, stats_cols=["k"] if stats else None
    )


def test_pruned_read_skips_non_overlapping_files(spark, tdir):
    # three appends, one file each, ranges [0,10) [10,20) [20,30)
    _commit_range(spark, tdir, 0, 10, "overwrite")
    _commit_range(spark, tdir, 10, 20, "append")
    _commit_range(spark, tdir, 20, 30, "append")
    df, rep = read_version_pruned(spark, tdir, "k", 12, 17)
    assert rep == {"files_total": 3, "files_read": 1, "files_skipped": 2}
    rows = sorted((r["k"], r["v"]) for r in df.collect())
    assert rows == [(k, 2 * k) for k in range(12, 18)]
    # boundary overlap: [9, 10] touches files 1 and 2
    _, rep2 = read_version_pruned(spark, tdir, "k", 9, 10)
    assert rep2["files_read"] == 2
    # empty range beyond all bounds: zero files, zero rows
    df3, rep3 = read_version_pruned(spark, tdir, "k", 100, 200)
    assert rep3["files_read"] == 0 and df3.count() == 0


def test_missing_stats_files_are_always_read(spark, tdir):
    _commit_range(spark, tdir, 0, 10, "overwrite", stats=True)
    _commit_range(spark, tdir, 10, 20, "append", stats=False)  # no bounds
    df, rep = read_version_pruned(spark, tdir, "k", 2, 3)
    # the stats-less file cannot be proven disjoint -> must be read
    assert rep == {"files_total": 2, "files_read": 2, "files_skipped": 0}
    assert sorted(r["k"] for r in df.collect()) == [2, 3]


def test_append_carries_parent_stats_forward(spark, tdir):
    _commit_range(spark, tdir, 0, 10, "overwrite")
    _commit_range(spark, tdir, 10, 20, "append")
    # prune against the LATEST version must still skip the v0 file
    _, rep = read_version_pruned(spark, tdir, "k", 15, 16)
    assert rep["files_skipped"] == 1


def test_mor_and_rollback_fall_back_to_full_resolve(spark, tdir):
    _commit_range(spark, tdir, 0, 10, "overwrite")
    up = spark.range(3, 5).selectExpr("id AS k", "id * 100 AS v")
    upsert_version(up, tdir, "k")
    df, rep = read_version_pruned(spark, tdir, "k", 3, 6)
    assert rep["files_skipped"] == 0  # correctness first: no pruning on MOR
    rows = dict((r["k"], r["v"]) for r in df.collect())
    assert rows == {3: 300, 4: 400, 5: 10, 6: 12}
    rollback(spark, tdir, 0)
    df2, rep2 = read_version_pruned(spark, tdir, "k", 3, 6)
    assert rep2["files_skipped"] == 0
    assert dict((r["k"], r["v"]) for r in df2.collect()) == {3: 6, 4: 8, 5: 10, 6: 12}
