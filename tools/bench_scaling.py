"""Two-cluster-size scaling benchmark (the north rule's N vs 4N evidence).

Runs the identical extraction job via spark-submit --py-files at
local[N] and local[4N] over the same on-disk corpus, reports pages/sec
at both plus scaling efficiency, and appends a BENCH.md section.

Usage: python tools/bench_scaling.py [n_pages] [N]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_corpus(n_pages: int, corpus_dir: str) -> None:
    if os.path.isdir(corpus_dir):
        return
    sys.path.insert(0, REPO)
    from finetoo_sp_spark.datagen import write_pages
    from finetoo_sp_spark.session import get_spark

    spark = get_spark(app_name="bench_corpus_gen")
    spark.sparkContext.setLogLevel("ERROR")
    # fixed 128-way layout: identical files for every cluster size
    write_pages(spark, n_pages, corpus_dir, partitions=128)
    spark.stop()


def run_once(
    master: str, zip_path: str, corpus_dir: str, out_dir: str, cpus: str | None = None
) -> dict:
    """One spark-submit leg; ``cpus`` pins the process to a CPU set so a
    'cluster of N cores' really has only N cores (in plain local mode the
    small leg silently borrows idle cores for JVM work, which understates
    scaling efficiency)."""
    # NOTE: driver memory / JVM flags MUST be on the spark-submit command
    # line — builder.config() in Python runs after the driver JVM exists
    # and is silently ignored (a 1g-heap G1 driver then hits GCLocker
    # stalls + OOM at high thread counts).
    cmd = ([f"taskset", "-c", cpus] if cpus else []) + [
        "spark-submit",
        "--master",
        master,
        "--driver-memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        "--conf",
        "spark.driver.extraJavaOptions=-XX:+UseParallelGC "
        "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=100",
        "--py-files",
        zip_path,
        os.path.join(REPO, "tools", "bench_extract_once.py"),
        corpus_dir,
        out_dir,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from {master}: {proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 480000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_big = 4 * n_small
    corpus_dir = f"/tmp/finetoo_bench_corpus_{n_pages}"
    zip_path = "/tmp/finetoo_sp_spark_bench.zip"

    subprocess.run(
        ["zip", "-qr", zip_path, "finetoo_sp_spark"], cwd=REPO, check=True
    )
    ensure_corpus(n_pages, corpus_dir)

    # alternate configs, best-of-k per config: the sandbox host's spare
    # vCPU capacity fluctuates (shared Firecracker host), and best-of
    # measures the job's capability rather than the neighbors' load.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    results: dict[int, dict] = {}
    for _ in range(repeats):
        for cores in (n_small, n_big):
            out_dir = f"/tmp/finetoo_bench_out_{cores}"
            r = run_once(
                f"local[{cores}]",
                zip_path,
                corpus_dir,
                out_dir,
                cpus=f"0-{cores - 1}",
            )
            shutil.rmtree(out_dir, ignore_errors=True)
            print(f"local[{cores}] (pinned 0-{cores-1}): {r}", file=sys.stderr)
            if cores not in results or r["pages_per_sec"] > results[cores]["pages_per_sec"]:
                results[cores] = r

    pps_small = results[n_small]["pages_per_sec"]
    pps_big = results[n_big]["pages_per_sec"]
    eff = (pps_big / pps_small) / (n_big / n_small)
    summary = {
        "n_pages": n_pages,
        "n_small": n_small,
        "n_big": n_big,
        "pages_per_sec_small": pps_small,
        "pages_per_sec_big": pps_big,
        "scaling_efficiency": round(eff, 3),
        "mismatched_text_rows": results[n_small]["mismatched_text_rows"]
        + results[n_big]["mismatched_text_rows"],
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(summary))

    bench_md = os.path.join(REPO, "BENCH.md")
    with open(bench_md, "a") as f:
        f.write(
            f"\n## Scaling run {summary['ts']}\n\n"
            f"Same job (`tools/bench_extract_once.py`: resumable extraction with\n"
            f"lineage manifests over a {n_pages:,}-page corpus, fixed 128-file\n"
            f"layout, warmup pass excluded from timing), launched via\n"
            f"`spark-submit --py-files` at two parallelism levels, each leg\n"
            f"taskset-pinned to exactly its core budget (best of "
            f"{os.environ.get('SPARK_GRAFT_BENCH_REPEATS', '2')} alternating runs —\n"
            f"the sandbox shares a host whose spare capacity fluctuates):\n\n"
            f"| cluster size | pages/sec | elapsed s | steal % |\n|---|---|---|---|\n"
            f"| local[{n_small}] pinned to {n_small} cpus (N) | {pps_small:,.0f} | {results[n_small]['elapsed_sec']} | {results[n_small].get('host_steal_pct', 'n/a')} |\n"
            f"| local[{n_big}] pinned to {n_big} cpus (4N) | {pps_big:,.0f} | {results[n_big]['elapsed_sec']} | {results[n_big].get('host_steal_pct', 'n/a')} |\n\n"
            f"**Scaling efficiency N->4N: {eff:.2f}** "
            f"(byte-identical text mismatches: {summary['mismatched_text_rows']})\n"
        )


if __name__ == "__main__":
    main()
