"""Snapshot-log versioned tables on plain parquet (Iceberg discipline).

sources/catalog.py routes to real Iceberg when a catalog is configured;
this module supplies the same COMMIT SEMANTICS when it is not — the
mechanics the north rule's sink story needs, built from scratch:

- **Atomic commits**: data files land first, then one version manifest
  (``_versions/v{N}.json``) is published via write-temp + atomic
  ``os.link`` — a true compare-and-swap: ``link`` fails EEXIST if the
  version number is already taken, so of two concurrent writers exactly
  ONE commits and the loser gets ``CommitConflict`` (it may retry on
  the new parent). Readers either see version N complete or not at
  all — a crashed writer leaves unreferenced data files, never a torn
  table.
- **Snapshot isolation / time travel**: a manifest lists exactly the
  data files of its version; ``read_version(path, n)`` reads any
  historical version while writers keep committing.
- **File reuse**: ``append`` commits reference the parent's files plus
  the new ones — no rewrite of existing data (Iceberg's manifest-reuse
  model, the property that makes commits O(delta) at 100 TB).
- **Rollback**: ``rollback`` publishes a NEW version whose file list is
  a past version's — history stays immutable, like Iceberg's
  ``rollback_to_snapshot``.

Not wire-compatible with Iceberg (no Avro manifests) — it is the
discipline, not the format, and swaps out for the real thing through
sources/catalog.py on a cluster with the runtime jar. Concurrency:
the link-CAS arbitrates exactly one committer per version number;
``CommitConflict`` is the optimistic-concurrency retry signal
(Iceberg's ``CommitFailedException`` analogue).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    """Another writer committed this version number first (the link-CAS
    lost the race). The table is intact — the loser's data files are
    unreferenced orphans. Retry the commit against the new parent, or
    surface the conflict."""


def _versions_dir(path: str) -> str:
    return os.path.join(path, "_versions")


def current_version(path: str) -> int | None:
    """Highest committed version number, or None for an empty table."""
    vdir = _versions_dir(path)
    if not os.path.isdir(vdir):
        return None
    versions = [
        int(f[1:-5])
        for f in os.listdir(vdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions) if versions else None


def _load_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_versions_dir(path), f"v{version}.json")) as f:
        return json.load(f)


def _footer_stats(path: str, rel_files: list[str], cols: list[str]) -> dict:
    """Per-file [min, max] for ``cols``, read from the parquet FOOTERS
    (no data scan — the same source Iceberg harvests into its manifest
    column_sizes/lower_bounds/upper_bounds). Columns without footer
    statistics are simply absent for that file, which pruned reads
    treat as "must read" — always safe."""
    import pyarrow.parquet as pq

    stats: dict[str, dict] = {}
    for rel in rel_files:
        meta = pq.ParquetFile(os.path.join(path, rel)).metadata
        names = {meta.schema.column(j).name: j for j in range(meta.num_columns)}
        per_col: dict[str, list] = {}
        for c in cols:
            j = names.get(c)
            if j is None:
                continue
            lo = hi = None
            ok = True
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(j).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                mn, mx = st.min, st.max
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
            if ok and lo is not None:
                if not isinstance(lo, (int, float, str)):
                    lo, hi = str(lo), str(hi)  # dates etc. -> ISO strings
                per_col[c] = [lo, hi]
        if per_col:
            stats[rel] = per_col
    return stats


def commit_version(
    df: DataFrame,
    path: str,
    mode: str = "append",
    stats_cols: list[str] | None = None,
) -> int:
    """Commit ``df`` as the next table version; returns its number.

    ``mode``: 'append' references the parent version's files plus the
    newly written ones; 'overwrite' references only the new ones (the
    old files stay on disk, still referenced by older manifests).

    ``stats_cols``: record per-file [min, max] footer statistics for
    these columns in the manifest (Iceberg's lower/upper bounds) —
    the data-skipping index :func:`read_version_pruned` consults.
    Append commits carry the parent's stats forward for reused files.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown commit mode {mode!r}")
    snap_dir = os.path.join(path, "data", uuid.uuid4().hex)
    df.write.mode("error").parquet(snap_dir)
    new_files = sorted(
        os.path.join("data", os.path.basename(snap_dir), f)
        for f in os.listdir(snap_dir)
        if f.endswith(".parquet")
    )
    parent = current_version(path)
    files = list(new_files)
    stats: dict = {}
    if mode == "append" and parent is not None:
        pm = _load_manifest(path, parent)
        files = pm["files"] + new_files
        stats.update(pm.get("stats") or {})
    if stats_cols:
        stats.update(_footer_stats(path, new_files, stats_cols))
    extra = {"stats": stats} if stats else None
    return _publish(path, files, mode, parent, extra=extra)


def rollback(spark: SparkSession, path: str, to_version: int) -> int:
    """Publish a new version whose contents are ``to_version``'s.
    History is immutable — this never deletes manifests or data. The
    manifest delegates resolution to the target (``resolve_as``), so
    rolling back to a merge-on-read version keeps its delete chain."""
    files = _load_manifest(path, to_version)["files"]
    return _publish(
        path,
        files,
        f"rollback:{to_version}",
        current_version(path),
        extra={"resolve_as": to_version},
    )


def _publish(
    path: str,
    files: list[str],
    mode: str,
    parent: int | None,
    extra: dict | None = None,
) -> int:
    """Atomic commit point. ``extra`` fields (e.g. a streaming epoch id)
    ride the SAME atomic publish as the file list — a manifest is never
    visible without them (exactly-once depends on this).

    The publish is a true CAS: ``os.link(tmp, final)`` atomically fails
    ``EEXIST`` when the version number is already taken (unlike
    ``os.replace``, which silently overwrites — an exists-check before
    a replace is a TOCTOU race). Exactly one of N concurrent writers
    returns; the rest raise :class:`CommitConflict` and the winner's
    manifest is never touched."""
    version = 0 if parent is None else parent + 1
    vdir = _versions_dir(path)
    os.makedirs(vdir, exist_ok=True)
    manifest = {
        "version": version,
        "parent": parent,
        "mode": mode,
        "files": files,
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        **(extra or {}),
    }
    tmp = os.path.join(vdir, f".v{version}.json.{uuid.uuid4().hex}.tmp")
    final = os.path.join(vdir, f"v{version}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    try:
        os.link(tmp, final)  # the atomic commit point: EEXIST = lost race
    except FileExistsError:
        raise CommitConflict(
            f"version {version} already committed by a concurrent writer"
        ) from None
    finally:
        os.unlink(tmp)
    return version


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read of ``version`` (default: latest). Historical
    versions stay readable after later commits and rollbacks."""
    if version is None:
        version = current_version(path)
        if version is None:
            raise FileNotFoundError(f"no committed versions under {path}")
    return _resolve(spark, path, version)


def read_version_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
):
    """Data-skipping snapshot read: ``col BETWEEN lo AND hi`` rows of
    ``version``, opening ONLY the data files whose manifest [min, max]
    bounds overlap the range (Iceberg's scan planning against manifest
    lower/upper bounds). Files without recorded stats for ``col`` are
    always read — missing stats can never lose rows. The residual
    filter still applies (pruning is file-granular), and Spark pushes
    it into the parquet scan of the surviving files.

    Returns (df, report) where report = {files_total, files_read,
    files_skipped}. Merge-on-read and rollback versions resolve
    normally and filter (correctness first; report shows zero skips) —
    at 10^12 rows this metadata-only planning step is what turns a
    full-corpus scan into a partition-range read.
    """
    if version is None:
        version = current_version(path)
        if version is None:
            raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, version)
    rng = (F.col(col) >= lo) & (F.col(col) <= hi)
    if m.get("resolve_as") is not None or m.get("delete_files"):
        df = _resolve(spark, path, version).filter(rng)
        n = len(m["files"])
        return df, {"files_total": n, "files_read": n, "files_skipped": 0}
    stats = m.get("stats") or {}
    keep = []
    for f in m["files"]:
        b = stats.get(f, {}).get(col)
        if b is None or (b[0] <= hi and b[1] >= lo):
            keep.append(f)
    report = {
        "files_total": len(m["files"]),
        "files_read": len(keep),
        "files_skipped": len(m["files"]) - len(keep),
    }
    if not keep:
        empty = spark.read.parquet(os.path.join(path, m["files"][0])).filter(
            F.lit(False)
        )
        return empty, report
    df = spark.read.parquet(*[os.path.join(path, f) for f in keep]).filter(rng)
    return df, report


def upsert_version(df: DataFrame, path: str, key_col: str) -> int:
    """Merge-on-read UPSERT commit (Iceberg equality-delete model):
    publish ``df`` as the next version WITHOUT rewriting parent data —
    the commit writes (a) the new rows and (b) an equality-delete file
    of their keys, and readers apply the deletes to PARENT rows only,
    so new data wins per key and untouched rows pass through. Commits
    stay O(delta) at any table size; read cost grows with upsert-chain
    depth until a compacting ``commit_version(mode='overwrite')``
    (documented Iceberg discipline: MOR writes, periodic COW compaction).
    """
    snap_dir = os.path.join(path, "data", uuid.uuid4().hex)
    df.write.mode("error").parquet(snap_dir)
    del_dir = os.path.join(path, "deletes", uuid.uuid4().hex)
    df.select(key_col).distinct().write.mode("error").parquet(del_dir)

    def _rel(d: str) -> list[str]:
        return sorted(
            os.path.join(os.path.relpath(d, path), f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    parent = current_version(path)
    files = _rel(snap_dir)
    if parent is not None:
        files = _load_manifest(path, parent)["files"] + files
    return _publish(
        path,
        files,
        "upsert",
        parent,
        extra={
            "new_files": _rel(snap_dir),
            "delete_files": _rel(del_dir),
            "delete_key": key_col,
        },
    )


def _resolve(spark: SparkSession, path: str, version: int) -> DataFrame:
    m = _load_manifest(path, version)
    if m.get("resolve_as") is not None:  # rollback: delegate to the target
        return _resolve(spark, path, m["resolve_as"])
    if not m.get("delete_files"):
        files = [os.path.join(path, f) for f in m["files"]]
        return spark.read.parquet(*files)
    # MOR read: parent rows minus this commit's equality deletes,
    # unioned with this commit's new rows (new data wins per key).
    parent = _resolve(spark, path, m["parent"])
    deletes = spark.read.parquet(
        *[os.path.join(path, f) for f in m["delete_files"]]
    )
    new_rows = spark.read.parquet(
        *[os.path.join(path, f) for f in m["new_files"]]
    )
    key = m["delete_key"]
    return parent.join(deletes, key, "left_anti").unionByName(new_rows)


def _required_versions(path: str, version: int, acc: set[int]) -> None:
    """Versions transitively needed to RESOLVE ``version``: rollback
    targets, and the parent chain wherever merge-on-read deletes apply."""
    if version in acc:
        return
    acc.add(version)
    m = _load_manifest(path, version)
    if m.get("resolve_as") is not None:
        _required_versions(path, m["resolve_as"], acc)
    if m.get("delete_files") and m.get("parent") is not None:
        _required_versions(path, m["parent"], acc)


def expire_versions(path: str, keep_last: int = 2) -> list[int]:
    """Drop the manifests of versions older than the newest
    ``keep_last`` — EXCEPT any version a kept version still resolves
    through (rollback targets, merge-on-read parents), which must
    survive or the kept versions would become unreadable (Iceberg's
    ``expire_snapshots`` has the same reachability rule). Data files are
    untouched; run :func:`vacuum` afterwards to reclaim them."""
    latest = current_version(path)
    if latest is None:
        return []
    vdir = _versions_dir(path)
    existing = sorted(
        int(f[1:-5]) for f in os.listdir(vdir)
        if f.startswith("v") and f.endswith(".json")
    )
    # intersect with what still exists: a prior expire with a smaller
    # keep_last may already have dropped part of the nominal keep range
    keep = set(range(max(0, latest - keep_last + 1), latest + 1)) & set(existing)
    required: set[int] = set()
    for v in keep:
        _required_versions(path, v, required)
    removed = [v for v in existing if v not in required]
    for v in removed:
        os.remove(os.path.join(vdir, f"v{v}.json"))
    return removed


def vacuum(path: str) -> list[str]:
    """Delete data/delete files referenced by NO remaining manifest
    (orphans from crashed writers + files owned only by expired
    versions — Iceberg's ``remove_orphan_files``). Returns the deleted
    relative paths."""
    vdir = _versions_dir(path)
    referenced: set[str] = set()
    if os.path.isdir(vdir):
        for f in os.listdir(vdir):
            if f.startswith("v") and f.endswith(".json"):
                m = _load_manifest(path, int(f[1:-5]))
                referenced.update(m["files"])
                referenced.update(m.get("delete_files") or [])
    removed: list[str] = []
    for sub in ("data", "deletes"):
        root = os.path.join(path, sub)
        if not os.path.isdir(root):
            continue
        for snap in sorted(os.listdir(root)):
            snap_dir = os.path.join(root, snap)
            if not os.path.isdir(snap_dir):
                continue
            kept_any = False
            for f in sorted(os.listdir(snap_dir)):
                rel = os.path.relpath(os.path.join(snap_dir, f), path)
                if f.endswith(".parquet"):
                    if rel in referenced:
                        kept_any = True
                    else:
                        os.remove(os.path.join(snap_dir, f))
                        removed.append(rel)
            if not kept_any:
                # snapshot dir owns no referenced data: drop sidecars too
                import shutil

                shutil.rmtree(snap_dir, ignore_errors=True)
    return removed


def compact_table(
    spark: SparkSession, path: str, small_bytes: int = 8 * 1024 * 1024
) -> int | None:
    """Rewrite-data-files compaction: consolidate the CURRENT version's
    small files (< ``small_bytes``) into one new snapshot and publish a
    version that references the consolidated files plus the untouched
    large ones — file-level surgery, the large files are never read or
    moved (Iceberg's ``rewrite_data_files``). Resolves merge-on-read
    chains first, so a compacted version reads with zero delete joins.
    Returns the new version, or None when there is nothing to compact.

    Scale note: at 10^12 rows this runs per partition-range with the
    bin packing of sources/compaction.plan_compaction; here the bin is
    simply "every small file" because local snapshots are single-digit
    file counts.
    """
    latest = current_version(path)
    if latest is None:
        return None
    m = _load_manifest(path, latest)
    if m.get("delete_files") or m.get("resolve_as") is not None:
        # MOR/rollback chain: materialize the resolved rows, then the
        # new version is a clean overwrite (COW compaction).
        return commit_version(read_version(spark, path, latest), path, "overwrite")
    small = [
        f for f in m["files"]
        if os.path.getsize(os.path.join(path, f)) < small_bytes
    ]
    if len(small) < 2:
        return None
    big = [f for f in m["files"] if f not in set(small)]
    consolidated = spark.read.parquet(*[os.path.join(path, f) for f in small])
    snap_dir = os.path.join(path, "data", uuid.uuid4().hex)
    consolidated.coalesce(1).write.mode("error").parquet(snap_dir)
    new_files = sorted(
        os.path.join("data", os.path.basename(snap_dir), f)
        for f in os.listdir(snap_dir)
        if f.endswith(".parquet")
    )
    return _publish(path, big + new_files, "compact", latest)
