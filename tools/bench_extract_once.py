"""spark-submit payload: timed end-to-end extraction at one cluster size.

Usage (master comes from spark-submit --master):
    spark-submit --master local[N] --py-files finetoo_sp_spark.zip \
        tools/bench_extract_once.py <corpus_dir> <out_dir> [warmup_pages]

Generates nothing: the corpus must exist (tools/bench_scaling.py writes it
once so every cluster size reads the identical files). Does a warmup pass
(spawns python workers, JITs the kernel) before the timed run — we time
steady-state throughput, not worker cold-start.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def _cpu_sample() -> tuple[float, float, float]:
    """(busy, steal, total) jiffies from /proc/stat across all cpus."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [float(x) for x in parts]
    user, nice, system, idle, iowait, irq, softirq, steal = (vals + [0] * 8)[:8]
    busy = user + nice + system + irq + softirq
    total = busy + idle + iowait + steal
    return busy, steal, total


def main() -> None:
    corpus_dir, out_dir = sys.argv[1], sys.argv[2]
    warmup_pages = int(sys.argv[3]) if len(sys.argv) > 3 else 10000
    shutil.rmtree(out_dir, ignore_errors=True)

    from pyspark.sql import functions as F

    from finetoo_sp_spark.extraction.extract import extract_pages
    from finetoo_sp_spark.session import get_spark
    from finetoo_sp_spark.sources.lineage import run_resumable_extraction

    spark = get_spark(app_name="finetoo_bench_once", master=None)
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    # Size input splits to ~4 task waves per core for THIS cluster size —
    # otherwise split count quantizes to a fraction of a wave and the last
    # wave idles most slots (at real scale files are >=128MB and split
    # counts are in the thousands, where this is a non-issue).
    total_bytes = sum(
        f.stat().st_size for f in os.scandir(corpus_dir) if f.name.endswith(".parquet")
    )
    target_splits = 4 * cores
    split_bytes = max(1024 * 1024, total_bytes // target_splits)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split_bytes))
    spark.conf.set("spark.sql.files.openCostInBytes", str(min(split_bytes // 4, 1024 * 1024)))

    pages = spark.read.parquet(corpus_dir)

    # warmup: full pipeline shape on a slice (worker spawn + codegen + JIT)
    extract_pages(pages.limit(warmup_pages)).select("url").count()

    b0, s0, t0j = _cpu_sample()
    t0 = time.time()
    metrics = run_resumable_extraction(pages, out_dir)
    elapsed = time.time() - t0
    b1, s1, t1j = _cpu_sample()
    dtot = max(t1j - t0j, 1.0)
    cpu_busy_cores = (b1 - b0) / dtot * os.cpu_count()
    steal_pct = (s1 - s0) / dtot * 100

    n_bad = (
        spark.read.parquet(out_dir + "/data")
        .select("url", "text")
        .join(pages.select("url", "expected_text"), "url")
        .filter(F.col("text") != F.col("expected_text"))
        .count()
    )
    print(
        json.dumps(
            {
                "cores": cores,
                "rows_out": metrics["rows_out"],
                "elapsed_sec": round(elapsed, 2),
                "pages_per_sec": round(metrics["rows_out"] / elapsed, 1),
                "phases": metrics["phases"],
                "cpu_busy_cores": round(cpu_busy_cores, 1),
                "host_steal_pct": round(steal_pct, 1),
                "cpu_sec_per_kpage": round(
                    cpu_busy_cores * elapsed / (metrics["rows_out"] / 1000 or 1), 2
                ),
                "mismatched_text_rows": n_bad,
            }
        )
    )


if __name__ == "__main__":
    main()
