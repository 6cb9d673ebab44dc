"""Under-load CPU capacity probe for the shared sandbox host.

Idle steal sampling does not predict whether the hypervisor will
actually schedule N vCPUs concurrently (BENCH.md scaling pair 7: 1
steal tick/20s at idle, then only 16-20 of 32 pinned cores ever ran).
This probe spins ``cores`` pinned busy processes for ``seconds`` and
reports how many cores the host really delivered, plus steal under
load — the gate a clean wide-leg capture needs.

Usage: python tools/probe_capacity.py [cores] [seconds]
Prints one JSON line: {"requested": N, "achieved_busy_cores": x,
"steal_pct_under_load": y}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _stat() -> tuple[float, float, float]:
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [float(x) for x in parts]
    user, nice, system, idle, iowait, irq, softirq, steal = (vals + [0] * 8)[:8]
    busy = user + nice + system + irq + softirq
    total = busy + idle + iowait + steal
    return busy, steal, total


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    nproc = os.cpu_count() or 32

    spin = (
        "import time,sys\n"
        "deadline=time.time()+float(sys.argv[1])\n"
        "x=1\n"
        "while time.time()<deadline:\n"
        "    for _ in range(20000): x=(x*1103515245+12345)&0x7fffffff\n"
    )
    procs = [
        subprocess.Popen(
            ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", spin, str(seconds)],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for _ in range(cores)
    ]
    time.sleep(0.5)  # let them all start before the measured window
    b0, s0, t0 = _stat()
    time.sleep(max(1.0, seconds - 1.5))
    b1, s1, t1 = _stat()
    for p in procs:
        p.wait()

    dt = t1 - t0
    achieved = (b1 - b0) / dt * nproc if dt else 0.0
    steal_pct = (s1 - s0) / dt * 100 if dt else 0.0
    print(
        json.dumps(
            {
                "requested": cores,
                "achieved_busy_cores": round(achieved, 1),
                "steal_pct_under_load": round(steal_pct, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
