"""Stateful streaming operator: state persists across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finetoo_sp_spark.datagen import gen_pages
from finetoo_sp_spark.streaming.stateful import host_crawl_state


def test_state_accumulates_across_batches(spark, tmp_path):
    d = str(tmp_path / "pages")
    gen_pages(spark, 120, partitions=3).write.mode("overwrite").parquet(d)

    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)  # force 3 micro-batches
        .parquet(d)
    )
    q = (
        host_crawl_state(stream)
        .writeStream.format("memory")
        .queryName("host_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    updates = spark.sql("SELECT * FROM host_state").toPandas()
    # final per-host totals = max over update rows (totals only grow)
    final = updates.groupby("host")[["total_pages", "total_bytes"]].max()
    expected = (
        spark.read.parquet(d)
        .select(
            F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host"),
            F.length("html").alias("n_bytes"),
        )
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_bytes").alias("b"))
        .toPandas()
        .set_index("host")
    )
    assert final["total_pages"].sum() == 120
    for host, row in expected.iterrows():
        assert final.loc[host, "total_pages"] == row["n"]
        assert final.loc[host, "total_bytes"] == row["b"]
    # hosts spanning multiple micro-batches prove state carried over
    assert (updates.groupby("host")["batches_seen"].max() > 1).any()


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    """A content hash first seen in batch 1 must be dropped when it
    reappears in batch 3 — dedup state carries across micro-batches."""
    d = str(tmp_path / "dup_pages")
    base = gen_pages(spark, 60, partitions=1).select("url", "text")
    # file 1: docs 0-59; file 2: same texts under other urls (all dups);
    # file 3: docs 60-119 (fresh) — maxFilesPerTrigger=1 -> 3 batches
    base.write.mode("overwrite").parquet(d)
    base.select(F.concat(F.lit("https://mirror.example.com/"), "url").alias("url"), "text").write.mode(
        "append"
    ).parquet(d)
    gen_pages(spark, 120, partitions=1).filter("page_id >= 60").select(
        "url", "text"
    ).write.mode("append").parquet(d)

    from finetoo_sp_spark.streaming.dedup import stream_exact_dedup

    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        stream_exact_dedup(stream, n_shards=8)
        .writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.sql("SELECT * FROM stream_dedup").toPandas()
    # 120 distinct texts total; the 60 mirrored dups must be dropped
    assert len(out) == 120
    assert out["content_sha"].nunique() == 120
    assert not out["url"].str.startswith("https://mirror.").any() or (
        # a mirror url may only survive if its batch arrived first —
        # with this file order the originals always precede the mirrors
        False
    )


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the group fn."""

    def __init__(self):
        self.exists = False
        self._row = None

    @property
    def get(self):
        return self._row

    def update(self, row):
        self._row = row
        self.exists = True


def _run_batch(fn, state, frames):
    import pandas as pd

    out = list(fn((0,), iter(frames), state))
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["url", "content_sha", "shard", "tier"]
    )


def test_stream_dedup_batch_determinism_across_chunks():
    """The min-url survivor rule must hold across Arrow chunks of one
    micro-batch: a hash split over two chunks keeps the batch-global
    min url, not the first chunk's."""
    import pandas as pd

    from finetoo_sp_spark.streaming.dedup import _make_dedup_group

    fn = _make_dedup_group(state_cap=100, bloom_bits=1 << 10, k_hashes=3)
    c1 = pd.DataFrame({"url": ["https://z.example.com/1"], "content_sha": ["ab" * 32], "shard": [0]})
    c2 = pd.DataFrame({"url": ["https://a.example.com/1"], "content_sha": ["ab" * 32], "shard": [0]})
    out = _run_batch(fn, _FakeState(), [c1, c2])
    assert len(out) == 1
    assert out["url"].iloc[0] == "https://a.example.com/1"  # batch-global min


def test_stream_dedup_bloom_tier_bounded_state():
    """Past state_cap the shard migrates to the Bloom tier: duplicates
    are STILL dropped (no false negatives), novel-page false drops stay
    under the design bound, and state memory is fixed."""
    import hashlib

    import pandas as pd

    from finetoo_sp_spark.streaming.dedup import _make_dedup_group

    bloom_bits = 1 << 16  # 8 KiB; n=600, k=5 -> theoretical FP ~ 2e-6
    fn = _make_dedup_group(state_cap=50, bloom_bits=bloom_bits, k_hashes=5)
    state = _FakeState()

    def sha(i):
        return hashlib.sha256(f"doc-{i}".encode()).hexdigest()

    def frame(ids):
        return pd.DataFrame(
            {"url": [f"https://h/{i}" for i in ids], "content_sha": [sha(i) for i in ids], "shard": 0}
        )

    out1 = _run_batch(fn, state, [frame(range(200))])  # overflows cap=50
    assert len(out1) == 200 and (out1["tier"] == "exact").all()
    seen_arr, blooms, n_active, n_seen = state.get
    assert seen_arr == [] and len(blooms) == 1 and n_seen == 200
    assert n_active == 200
    assert len(blooms[0]) == bloom_bits // 8  # one layer-0 filter

    # batch 2: 200 exact repeats + 400 novel — repeats must ALL drop
    out2 = _run_batch(fn, state, [frame(list(range(200)) + list(range(200, 600)))])
    assert (out2["tier"] == "bloom").all()
    assert not set(out2["content_sha"]) & set(out1["content_sha"])  # no dup passed
    false_drops = 400 - len(out2)
    assert 0 <= false_drops <= 4  # <=1% observed vs ~2e-6 theoretical

    # batch 3: all 600 again -> nothing survives
    out3 = _run_batch(fn, state, [frame(range(600))])
    assert len(out3) == 0
    _, blooms2, _, n2 = state.get
    # 600 distinct hashes are far below layer-0 capacity: still 1 layer
    assert len(blooms2) == 1 and len(blooms2[0]) == bloom_bits // 8
    assert n2 == 200 + len(out2)


def test_scalable_bloom_false_drop_at_10m_hashes():
    """The round-3 verdict's scale probe: absorb 10M distinct hashes
    per shard through the REAL group function (batches of 500k), then
    measure the false-drop rate on 200k genuinely novel hashes. The
    layered filter must stay under 0.5% (the old fixed 2^23-bit filter
    sits at ~100% at this load: 10M inserts saturate 8M bits), with
    O(log) layer growth and duplicates still always dropped."""
    import numpy as np
    import pandas as pd

    from finetoo_sp_spark.streaming.dedup import (
        DEFAULT_FP_BUDGET,
        _layers_contain,
        _make_dedup_group,
    )

    rng = np.random.default_rng(20260818)
    hexc = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)

    def synth_shas(n):
        a = hexc[rng.integers(0, 16, (n, 64))]
        return [s.decode() for s in a.view("S64").ravel()]

    fn = _make_dedup_group(state_cap=1000, bloom_bits=1 << 23, k_hashes=5)
    state = _FakeState()
    total, batch_sz = 10_000_000, 500_000
    emitted = 0
    for _ in range(total // batch_sz):
        shas = synth_shas(batch_sz)
        frame = pd.DataFrame(
            {"url": [f"u{i}" for i in range(batch_sz)], "content_sha": shas, "shard": 0}
        )
        emitted += len(_run_batch(fn, state, [frame]))
    seen_arr, bloom_list, n_active, n_seen = state.get
    assert seen_arr == []
    # ~10M distinct (random 256-bit collisions are negligible); a few
    # hundred thousand false drops would show up here
    assert n_seen >= total * 0.99
    # geometric layering: 10M inserts at 1 MiB layer 0 -> 5 layers, 31 MiB
    assert 4 <= len(bloom_list) <= 6
    assert sum(len(b) for b in bloom_list) <= 64 << 20

    blooms = [np.frombuffer(b, dtype=np.uint8) for b in bloom_list]
    probe = synth_shas(200_000)
    false_drop = _layers_contain(blooms, probe, 5).mean()
    bound = len(bloom_list) * DEFAULT_FP_BUDGET
    assert false_drop < 0.005, f"false-drop {false_drop:.4%} >= 0.5%"
    assert false_drop <= bound * 1.5, f"{false_drop:.4%} vs theory bound {bound:.4%}"
    # no false negatives ever: re-present a sample of absorbed hashes
    rng2 = np.random.default_rng(7)
    idx = rng2.integers(0, batch_sz, 1000)
    resend = [shas[i] for i in idx]  # last batch's hashes
    assert _layers_contain(blooms, resend, 5).all()


def test_bloom_helpers_deterministic():
    import hashlib

    import numpy as np

    from finetoo_sp_spark.streaming.dedup import _bloom_add, _bloom_contains, _bloom_indexes

    shas = [hashlib.sha256(str(i).encode()).hexdigest() for i in range(50)]
    m = 1 << 12
    a = _bloom_indexes(shas, m, 5)
    b = _bloom_indexes(shas, m, 5)
    assert (a == b).all() and a.max() < m and a.min() >= 0
    bloom = np.zeros(m // 8, dtype=np.uint8)
    _bloom_add(bloom, shas[:25], m, 5)
    assert _bloom_contains(bloom, shas[:25], m, 5).all()  # no false negatives
    # insertion order independence (bitwise OR)
    bloom2 = np.zeros(m // 8, dtype=np.uint8)
    _bloom_add(bloom2, list(reversed(shas[:25])), m, 5)
    assert (bloom == bloom2).all()


def test_versioned_epoch_sink_exactly_once(spark, tmp_path):
    """A replayed foreachBatch epoch (Structured Streaming's
    at-least-once crash semantics) must be skipped BEFORE any write —
    the versioned table sees each epoch exactly once."""
    from finetoo_sp_spark.sources.table import current_version, read_version
    from finetoo_sp_spark.streaming.versioned import (
        committed_epochs,
        versioned_epoch_sink,
    )

    path = str(tmp_path / "vt")
    sink = versioned_epoch_sink(path)
    b0 = spark.range(0, 10).selectExpr("id AS k")
    b1 = spark.range(10, 25).selectExpr("id AS k")
    sink(b0, 0)
    sink(b1, 1)
    assert read_version(spark, path).count() == 25
    # crash replay: epoch 1 delivered again -> skipped, no new version
    v_before = current_version(path)
    sink(b1, 1)
    assert current_version(path) == v_before
    assert read_version(spark, path).count() == 25
    assert committed_epochs(path) == {0, 1}
    # a genuinely new epoch still commits
    sink(spark.range(25, 30).selectExpr("id AS k"), 2)
    assert read_version(spark, path).count() == 30
    # history: version 0 still reads the first batch alone
    assert read_version(spark, path, 0).count() == 10


def test_versioned_sink_through_real_stream(spark, tmp_path, pages_dir=None):
    """Drive the sink through an actual Structured Streaming query
    (availableNow file stream -> foreachBatch)."""
    import os

    from finetoo_sp_spark.sources.table import read_version
    from finetoo_sp_spark.streaming.versioned import versioned_epoch_sink

    src_dir = str(tmp_path / "src")
    spark.range(0, 200).selectExpr("id AS k").repartition(4).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("k long")
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    path = str(tmp_path / "vt2")
    q = (
        stream.writeStream.foreachBatch(versioned_epoch_sink(path))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert read_version(spark, path).count() == 200


def test_publish_cas_two_writers_one_winner(tmp_path):
    """The commit point is a true CAS (os.link, not exists-check +
    replace): of N threads racing the same version number, exactly one
    commits and the rest raise CommitConflict — the winner's manifest
    is never silently overwritten."""
    import json
    import os
    import threading

    from finetoo_sp_spark.sources.table import CommitConflict, _publish

    path = str(tmp_path / "race")
    results = [None] * 8
    barrier = threading.Barrier(8)

    def writer(i):
        barrier.wait()
        try:
            _publish(path, [f"data/w{i}.parquet"], "overwrite", None,
                     extra={"writer": i})
            results[i] = "won"
        except CommitConflict:
            results[i] = "lost"

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results.count("won") == 1
    assert results.count("lost") == 7
    winner = results.index("won")
    with open(os.path.join(path, "_versions", "v0.json")) as f:
        m = json.load(f)
    assert m["writer"] == winner
    assert m["files"] == [f"data/w{winner}.parquet"]
    # no temp files left behind by winners or losers
    leftovers = [f for f in os.listdir(os.path.join(path, "_versions"))
                 if f.endswith(".tmp")]
    assert leftovers == []


def test_concurrent_epoch_sinks_each_epoch_exactly_once(spark, tmp_path):
    """Two interleaved foreachBatch writers on one table (disjoint
    epochs, plus both replaying one shared epoch): every epoch commits
    exactly once; losers retry on the new parent instead of failing."""
    import threading

    from finetoo_sp_spark.sources.table import _load_manifest, current_version, read_version
    from finetoo_sp_spark.streaming.versioned import (
        committed_epochs,
        versioned_epoch_sink,
    )

    path = str(tmp_path / "vt_race")
    sink = versioned_epoch_sink(path)
    batches = {e: spark.range(e * 10, e * 10 + 10).selectExpr("id AS k")
               for e in range(6)}
    barrier = threading.Barrier(2)
    errs = []

    def writer(epochs):
        try:
            barrier.wait()
            for e in epochs:
                sink(batches[e], e)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    # writer A: epochs 0,1,2,5 ; writer B: epochs 3,4,5 (5 is shared —
    # the at-least-once replay case under contention)
    ta = threading.Thread(target=writer, args=([0, 1, 2, 5],))
    tb = threading.Thread(target=writer, args=([3, 4, 5],))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert errs == []
    assert committed_epochs(path) == {0, 1, 2, 3, 4, 5}
    # exactly one manifest per epoch
    latest = current_version(path)
    stamped = [_load_manifest(path, v).get("epoch") for v in range(latest + 1)]
    assert sorted(stamped) == [0, 1, 2, 3, 4, 5]
    # the table content is the union of all six batches, no duplicates
    assert read_version(spark, path).count() == 60
    assert read_version(spark, path).select("k").distinct().count() == 60
