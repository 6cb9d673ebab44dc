"""Benchmark harness: one JSON line with the headline metric + per-query times.

Headline = extraction throughput (pages/sec) over the deterministic
synthetic corpus (datagen.gen_pages), matching BASELINE.json's metric.
The per-query dict times the contract queries on $SPARK_GRAFT_SF_DIR.

Env:
  SPARK_GRAFT_SF_DIR      parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS        local[N] parallelism (default 32)
  SPARK_GRAFT_BENCH_PAGES synthetic corpus size (default 40000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "40000"))

    from finetoo_sp_spark import contract
    from finetoo_sp_spark.datagen import gen_pages
    from finetoo_sp_spark.extraction.extract import extract_pages
    from finetoo_sp_spark.session import get_spark

    spark = get_spark(app_name="finetoo_sp_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # -- quiet-window protocol (VERDICT r03 item 10): probe host steal
    # UNDER LOAD before the timed section (steal only accrues when the
    # vCPUs demand time — an idle sample reads ~0% on a host that will
    # steal 20% once the job starts); when the probe reads noisy (>2%),
    # wait a few windows for the neighbors to quiet down (bounded —
    # never stalls the driver), and annotate every leg with its own
    # steal so a polluted record is self-describing instead of
    # silently 15% low.
    preflight_steal, preflight_waits = _loaded_steal_probe(), 0
    while preflight_steal is not None and preflight_steal > 2.0 and preflight_waits < 5:
        time.sleep(10.0)
        preflight_waits += 1
        preflight_steal = _loaded_steal_probe()

    # -- headline: extraction pages/sec (generate once, cache input) -----
    # one task wave across all cores: the datagen default (n/2000 parts)
    # leaves a third of the slots idle at 40k pages / 32 cpus (measured
    # 59k -> 70k pages/s from this alone); more waves only add overhead
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pages = gen_pages(spark, n_pages, partitions=cpus).select("url", "html").cache()
    pages.count()  # materialize: time extraction, not generation
    extract_s, best_leg_steal = float("inf"), None
    headline_legs: list[dict] = []

    def _headline_leg() -> tuple[int, float, float | None]:
        s0, j0 = _cpu_steal_jiffies()
        t0 = time.time()
        n = extract_pages(pages).select("url", "content_chars").count()
        dt_ = time.time() - t0
        s1, j1 = _cpu_steal_jiffies()
        st = round(100.0 * (s1 - s0) / max(j1 - j0, 1), 2) if j1 > j0 else None
        return n, dt_, st

    # best-of-3 with per-leg pollution retry (VERDICT r04 item 3): the
    # sandbox shares a host whose spare CPU fluctuates; the minimum
    # reflects the engine, the mean reflects the neighbors. Each leg
    # records the steal sampled AROUND its own timed region, and when
    # even the best leg ran under >2% steal the harness re-runs legs
    # (bounded budget, short wait between) so a transient noisy window
    # no longer burns the whole record — the driver artifact stops
    # under-reading by 30% when the neighbors quiet down mid-run.
    leg_retry_budget = int(os.environ.get("SPARK_GRAFT_LEG_RETRIES", "4"))
    headline_retries = 0
    n_out = 0
    for leg_no in range(3 + leg_retry_budget):
        if leg_no >= 3:
            # retry gate matches the headline_polluted threshold (1%):
            # a leg the record would flag is a leg worth re-running
            if best_leg_steal is None or best_leg_steal <= 1.0:
                break  # already have a clean best leg
            time.sleep(8.0)  # give the noisy neighbor a chance to pass
            headline_retries += 1
        n_out, dt, leg_steal = _headline_leg()
        headline_legs.append(
            {
                "pages_per_sec": round(n_out / dt, 1),
                "sec": round(dt, 3),
                "steal_pct": leg_steal,
                "retry": leg_no >= 3,
            }
        )
        if dt < extract_s:
            extract_s, best_leg_steal = dt, leg_steal
    pages_per_sec = n_out / extract_s if extract_s > 0 else 0.0
    pages.unpersist()

    # -- contract queries on the driver tables ---------------------------
    bench_queries = [
        "extract_main_text",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "dedup_embedding_cosine",
        "ann_topk_bruteforce",
        "ann_lsh_bucketed",
        "session_stats",
        "fingerprint_summary",
        "quality_scores",
        "join_placed",
        "divergence_parts",
        "curation_pipeline",
        "web_link_bom",
        "traverse_links_2hop",
        "tfidf_top_terms",
        "binder_manifest",
        "block_comparison",
        "ann_lsh_multiprobe",
        "asof_last_purchase",
        "range_join_trial_events",
        "repetition_scores",
        "embedding_centroids",
        "dedup_minhash_salted",
        "dedup_simhash_salted",
        "pagerank_links",
        "rarity_scores",
        "dedup_lines_c4",
        "multimodal_image_stats",
        "multimodal_image_stats_jpeg",
        "pdf_real_extract",
        "training_shard_manifest",
        "chunk_windows",
        "dedup_incremental",
        "anchor_text_agg",
        "snapshot_churn",
        "incremental_extract",
        # round-3 late additions
        "bm25_topk",
        "classifier_scores",
        "table_extract",
        "jsonld_extract",
        "compliance_flags",
        "skew_report",
        "normalize_mojibake",
        "edit_verify",
        "template_ngrams",
        "curation_v2",
        "phrase_hits",
        "shard_assign",
        "robots_gate",
        "robots_gate_wildcard",
        "robots_gate_agent",
        "compaction_plan",
        "budget_alloc",
        "script_profile",
        "length_buckets",
        "mirror_hosts",
        # round-4 additions
        "dedup_window_stats",
        "dedup_window_removal",
        "url_canonicalize",
        "sitemap_parse",
        "multimodal_audio_stats",
        "robots_sitemaps",
        "embedding_quantize",
        "gopher_rules",
        "bpe_pair_counts",
        "sentence_stats",
        "pii_scan",
        "hll_sketch",
        "kmv_distinct",
        "image_dhash",
        "image_neardup_pairs",
        "cms_heavyhitters",
        "length_quantiles",
        "corpus_report",
        "bpe_encode_tokens",
        "ccnet_lm_filter",
        "video_metadata",
        "image_dup_clusters",
        # round-5 additions
        "multimodal_image_stats_jpeg_progressive",
        "multimodal_image_stats_webp",
        "multimodal_image_stats_gif",
        "image_dhash_mixed_formats",
        "dxf_entities_by_type",
        "pq_codes",
        "ann_ivf_pq_topk",
        "http_robots_gate",
        "image_dimensions",
        "curation_v3",
        "bpe_learn_merges",
        "blocklist_gate",
        "wet_roundtrip",
        "frame_sample_times",
        "table_time_travel",
        "table_upsert_mor",
        "trap_urls",
        "snapshot_drift",
        "og_meta_extract",
        "hreflang_edges",
        "microdata_extract",
        "feed_parse",
        "hits_scores",
        "trustrank_scores",
        "charset_decode",
        "markdown_render",
        "extract_legacy_encoded",
        "boilerplate_strip_host",
        "temperature_mix",
        "redirect_resolve",
        "canonical_clusters",
        "nofollow_links",
        "nfc_normalize",
        "soft404_flags",
        "rrf_quality_fusion",
        "wat_roundtrip",
        "warc_http_charset",
        "http_robots_gate",
        "cdx_index",
        "zipnum_index",
        "http_transfer_decode",
        "warc_revisit_resolve",
        "token_counts_multilingual",
        "lang_id_script",
        "gif_animation_stats",
        "frontier_schedule",
        "table_pruned_scan",
        "registrable_domains",
        "resolve_references",
        "recrawl_plan",
        "resolved_links",
        "domain_quality_report",
        # round-5 session-3 additions
        "multimodal_audio_stats_flac",
        "audio_probe_meta",
        "multimodal_image_stats_bmp_ico",
        "multimodal_image_stats_tiff",
        "cdc_chunk_stats",
        "cdc_dedup",
        "asset_curation_report",
        # round-5 session-4 additions
        "multimodal_image_stats_bmp_rle",
        "webp_animation_stats",
        "multimodal_audio_stats_g711",
        "table_schema_evolution",
        # round-5 session-5 additions
        "apng_animation_stats",
        "audio_fingerprint_dups",
        "community_labels",
        "pdf_encrypted_extract",
        "pdf_objstm_extract",
        "mp4_sample_table",
        "sitemap_media",
        "image_exif_meta",
        "image_gps_redact",
        "meta_refresh_targets",
        "multimodal_image_stats_png_palette",
        "multimodal_image_stats_png16",
        "image_autorotate_stats",
        "multimodal_image_stats_cmyk",
        "multimodal_audio_stats_24bit",
        "audio_id3_meta",
        "subtitle_cues",
        "hls_playlist",
        "caption_keyframe_align",
        "audio_tags_meta",
        "photo_curation_report",
        "svg_asset_meta",
        "srcset_assets",
        "css_asset_refs",
        "link_icon_assets",
    ]
    qs = contract.queries()
    # best-of-N per query (default 2): a single cold sample on this
    # shared-host sandbox can read 2-7x the warm time (BENCH.md round-3
    # noise note) — the min of two passes reflects the engine, and the
    # regression gate below stops flagging neighbor spikes.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    steal0, total0 = _cpu_steal_jiffies()
    times: dict[str, float] = {}
    for _ in range(reps):
        for name in bench_queries:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt

    # production-hash variants: the registered minhash/simhash queries run
    # hash_mode='sha' (DuckDB-verifiable, slower hash); production uses
    # xxhash64 with the identical plan shape — time both for the record.
    from pyspark.sql import functions as F

    from finetoo_sp_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prod = {
        "dedup_minhash_lsh_prod": lambda: dd.minhash_lsh_pairs(
            docs.filter(F.col("doc_id") < 150), "doc_id", "text",
            n=3, k=32, bands=8, threshold=0.12,
        ),
        "dedup_simhash_prod": lambda: dd.simhash_pairs(
            docs, "doc_id", "text", max_hamming=3
        ),
    }
    for _ in range(reps):
        for name, fn in prod.items():
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
    steal1, total1 = _cpu_steal_jiffies()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / max(total1 - total0, 1), 2)
        if total1 > total0
        else None
    )

    # -- regression gate: compare per-query times vs the last recorded
    # round (BENCH_r{N}.json) and flag >1.3x slowdowns in the output so
    # a regression can never ship silently (VERDICT r02 item 10).
    regressions: dict[str, dict] = {}
    prev_queries = _previous_round_queries()
    for name, now in times.items():
        prev = prev_queries.get(name)
        if prev and prev > 0 and now > 1.3 * prev:
            regressions[name] = {"prev": prev, "now": now, "ratio": round(now / prev, 2)}

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "pages_per_sec_extraction",
                "value": round(pages_per_sec, 1),
                "unit": "pages/sec",
                "queries": times,
                "regressions": regressions,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_pages": n_pages,
                "extract_sec": round(extract_s, 3),
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                "query_reps": reps,
                "host_steal_pct": steal_pct,
                "steal_annotated": True,
                "preflight_steal_pct": preflight_steal,
                "preflight_waits": preflight_waits,
                "headline_legs": headline_legs,
                "headline_best_leg_steal_pct": best_leg_steal,
                "headline_polluted": bool(best_leg_steal and best_leg_steal > 1.0),
                "headline_retries": headline_retries,
                "headline_retries_exhausted": bool(
                    headline_retries and best_leg_steal and best_leg_steal > 1.0
                ),
            }
        )
    )


def _steal_window(seconds: float) -> float | None:
    """Steal %% over a short sleep window (None when /proc is absent)."""
    s0, t0 = _cpu_steal_jiffies()
    time.sleep(seconds)
    s1, t1 = _cpu_steal_jiffies()
    if t1 <= t0:
        return None
    return round(100.0 * (s1 - s0) / (t1 - t0), 2)


def _loaded_steal_probe(seconds: float = 2.0) -> float | None:
    """Steal %% with every core briefly DEMANDING time — the honest
    quiet-window detector on a shared host (idle sampling reads ~0%
    regardless of neighbor load, because steal only accrues when our
    vCPUs are runnable and preempted)."""
    import multiprocessing as mp

    def _burn(stop_t: float) -> None:
        while time.time() < stop_t:
            pass

    s0, t0 = _cpu_steal_jiffies()
    if t0 == 0:
        return None
    stop = time.time() + seconds
    procs = [
        mp.Process(target=_burn, args=(stop,), daemon=True)
        for _ in range(os.cpu_count() or 4)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    s1, t1 = _cpu_steal_jiffies()
    if t1 <= t0:
        return None
    return round(100.0 * (s1 - s0) / (t1 - t0), 2)


def _cpu_steal_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat's aggregate cpu line —
    sampled around the timed section so each record carries its own
    noise context ((0, 0) when unreadable)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return (vals[7] if len(vals) > 7 else 0, sum(vals))
    except Exception:  # noqa: BLE001 — missing /proc must not break the bench
        return (0, 0)


def _previous_round_queries() -> dict[str, float]:
    """Per-query seconds from the newest committed BENCH_r{N}.json
    (driver-recorded), empty when none exists or parsing fails."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, str] | None = None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, p)
    if best is None:
        return {}
    try:
        with open(best[1]) as f:
            doc = json.load(f)
        q = doc.get("parsed", doc).get("queries", {})
        return {k: float(v) for k, v in q.items()}
    except Exception:  # noqa: BLE001 — a corrupt record must not break the bench
        return {}


if __name__ == "__main__":
    main()
