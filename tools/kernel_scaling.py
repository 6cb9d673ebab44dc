"""Pure-kernel multiprocessing scaling probe (no Spark, no JVM).

Separates the ENGINE's scaling from the BOX's memory-bus ceiling: each
pinned OS worker runs the full vectorized extraction kernel
(datagen.gen_pages_pandas -> extraction.kernel.extract_batch) in a
sustained loop over its own private batches, so the only shared
resource is the hardware. On a multi-executor cluster every executor
looks like the low-worker case (its own memory channels), so this
curve — not the single-box Spark wall time — is the predictive N->4N
number wherever the Spark plan itself has no serial stage (see
tools/probe_stages.py and the BENCH.md stage breakdown).

Usage: python tools/kernel_scaling.py [workers ...] (default: 2 8 32)
Prints one JSON line per worker count plus a final efficiency summary.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 512          # pages per kernel call (Arrow-batch-sized)
PAGE_SCALE = 8       # ~20 KB realistic pages
WARM_S = 3.0
MEASURE_S = 12.0


def _worker(widx: int, out_q) -> None:
    os.sched_setaffinity(0, {widx})
    import numpy as np

    from finetoo_sp_spark.datagen import gen_pages_pandas
    from finetoo_sp_spark.extraction.kernel import extract_batch

    # private, deterministic input per worker; built once, reused
    ids = np.arange(widx * BATCH, (widx + 1) * BATCH)
    pdf = gen_pages_pandas(ids, page_scale=PAGE_SCALE)
    deadline = time.time() + WARM_S
    while time.time() < deadline:  # warm: JIT numpy caches, allocator
        extract_batch(pdf["url"], pdf["html"])
    n = 0
    t0 = time.time()
    deadline = t0 + MEASURE_S
    while time.time() < deadline:
        extract_batch(pdf["url"], pdf["html"])
        n += BATCH
    out_q.put((n, time.time() - t0))


def run(workers: int) -> float:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(i, q)) for i in range(workers)]
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    pages = sum(n for n, _ in results)
    elapsed = max(dt for _, dt in results)
    return pages / elapsed


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [2, 8, 32]
    pps: dict[int, float] = {}
    for w in counts:
        pps[w] = run(w)
        print(json.dumps({"workers": w, "pages_per_sec": round(pps[w], 1)}),
              flush=True)
    summary = {"pages_per_sec": {str(k): round(v, 1) for k, v in pps.items()}}
    for a in counts:
        for b in counts:
            if b == 4 * a:
                summary[f"eff_{a}_to_{b}"] = round((pps[b] / pps[a]) / 4, 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
