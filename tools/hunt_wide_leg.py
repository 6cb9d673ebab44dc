"""Probe-gated wide-leg hunter for the N->4N scaling pair.

The sandbox host's ability to schedule 32 vCPUs opens and closes within
minutes (BENCH.md pairs 7/8: a 31.6-core clean probe went to 13-15
schedulable cores by launch time). This loop probes under-load capacity
(tools/probe_capacity.py logic, inline) and fires ONE wide leg the
moment a window verifies, then accepts the leg only if its own
under-load telemetry (busy cores + steal) confirms the window held.

Usage: python tools/hunt_wide_leg.py [cores] [budget_min]
Prints one JSON line per attempt to stderr and the accepted (or best
rejected) leg as JSON on stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from bench_scaling import run_once  # noqa: E402


def probe(cores: int, seconds: float = 4.0) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "probe_capacity.py"),
         str(cores), str(seconds)],
        capture_output=True, text=True, timeout=60,
    )
    return json.loads(out.stdout)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    budget_min = float(sys.argv[2]) if len(sys.argv) > 2 else 45.0
    corpus_dir = "/tmp/finetoo_bench_corpus_480000"
    zip_path = "/tmp/finetoo_sp_spark_bench.zip"
    subprocess.run(["zip", "-qr", zip_path, "finetoo_sp_spark"], cwd=REPO, check=True)

    deadline = time.time() + budget_min * 60
    best: dict | None = None
    attempt = 0
    while time.time() < deadline:
        p = probe(cores)
        print(json.dumps({"probe": p}), file=sys.stderr, flush=True)
        if p["achieved_busy_cores"] < cores - 3 or p["steal_pct_under_load"] > 1.5:
            time.sleep(45)
            continue
        attempt += 1
        out_dir = f"/tmp/finetoo_hunt_out_{cores}"
        r = run_once(f"local[{cores}]", zip_path, corpus_dir, out_dir,
                     cpus=f"0-{cores - 1}")
        subprocess.run(["rm", "-rf", out_dir])
        print(json.dumps({"attempt": attempt, "leg": r}), file=sys.stderr, flush=True)
        if best is None or r["pages_per_sec"] > best["pages_per_sec"]:
            best = r
        if r.get("host_steal_pct", 99) < 2.0 and r.get("cpu_busy_cores", 0) >= cores * 0.75:
            print(json.dumps({"accepted": True, **r}))
            return
    if best is not None:
        print(json.dumps({"accepted": False, **best}))
    else:
        print(json.dumps({"accepted": False, "reason": "no window opened"}))


if __name__ == "__main__":
    main()
