#!/bin/bash
# Wait for a host-steal-quiet window, then run one pinned N/4N pair.
# Usage: bench_when_quiet.sh [n_pages] [N] [max_attempts]
set -u
N_PAGES=${1:-480000}
NSMALL=${2:-8}
ATTEMPTS=${3:-8}
cd "$(dirname "$0")/.."

for i in $(seq 1 "$ATTEMPTS"); do
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 15
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1 - s0))
  echo "attempt $i: steal ticks/15s = $d"
  if [ "$d" -lt 25 ]; then
    SPARK_GRAFT_BENCH_REPEATS=1 python tools/bench_scaling.py "$N_PAGES" "$NSMALL" && exit 0
  fi
  sleep 300
done
echo "no quiet window found in $ATTEMPTS attempts"
exit 1
