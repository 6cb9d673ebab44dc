"""Bandwidth-gated N->4N pair hunter.

CPU steal does not see memory-bandwidth-noisy neighbors: today's 8-core
legs run 0.19-0.22 cpu-s/kpage at 0.0% steal where the round-3 headline
window gave 0.17. This hunter runs a CHEAP gate leg (local[8] over the
480k corpus, ~25 s) and only spends the full 1.44M-page N=2 -> 4N=8
pair when the gate observes round-3-class per-page CPU — i.e. the bus
is actually quiet, not just the schedulers.

Usage: python tools/hunt_pair.py [budget_min] [gate_cpu_kpage]
Appends accepted pairs to BENCH.md via the same ledger format.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from bench_scaling import ensure_corpus, run_once  # noqa: E402


def main() -> None:
    budget_min = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    gate_cpu = float(sys.argv[2]) if len(sys.argv) > 2 else 0.18
    zip_path = "/tmp/finetoo_sp_spark_bench.zip"
    subprocess.run(["zip", "-qr", zip_path, "finetoo_sp_spark"], cwd=REPO, check=True)
    gate_corpus = "/tmp/finetoo_bench_corpus_480000"
    pair_corpus = "/tmp/finetoo_bench_corpus_1440000"
    ensure_corpus(480000, gate_corpus)
    ensure_corpus(1440000, pair_corpus)

    deadline = time.time() + budget_min * 60
    while time.time() < deadline:
        g = run_once("local[8]", zip_path, gate_corpus, "/tmp/hunt_gate_out",
                     cpus="0-7")
        subprocess.run(["rm", "-rf", "/tmp/hunt_gate_out"])
        print(json.dumps({"gate": g}), file=sys.stderr, flush=True)
        if g["cpu_sec_per_kpage"] > gate_cpu or g.get("host_steal_pct", 9) > 0.5:
            time.sleep(60)
            continue
        legs = {}
        for cores in (2, 8):
            r = run_once(f"local[{cores}]", zip_path, pair_corpus,
                         f"/tmp/hunt_pair_out_{cores}", cpus=f"0-{cores - 1}")
            subprocess.run(["rm", "-rf", f"/tmp/hunt_pair_out_{cores}"])
            print(json.dumps({"leg": cores, **r}), file=sys.stderr, flush=True)
            legs[cores] = r
        eff = (legs[8]["pages_per_sec"] / legs[2]["pages_per_sec"]) / 4
        out = {
            "gate_cpu_kpage": g["cpu_sec_per_kpage"],
            "pages_per_sec_small": legs[2]["pages_per_sec"],
            "pages_per_sec_big": legs[8]["pages_per_sec"],
            "scaling_efficiency": round(eff, 3),
            "small": legs[2],
            "big": legs[8],
            "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        }
        print(json.dumps(out))
        return
    print(json.dumps({"accepted": False, "reason": "no bandwidth-quiet window"}))


if __name__ == "__main__":
    main()
