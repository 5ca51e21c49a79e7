#!/bin/bash
# Round-5h: post-revert confirms + backward attribution.
#   tr_rev / trd_rev: the shipped train configs on the reverted (monolithic
#     stats) kernel — re-baseline after the statcache negative;
#   prof_grad: op-level time table of the grad step (jax.profiler xplane)
#     so the ~30 ms backward-extra is attributable by category in PARITY.
#
# Usage: bash tools/sweep_r5h.sh [outdir]   (default /tmp/r5h)
set -u
OUT=${1:-/tmp/r5h}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ -s "$OUT/$name.done" ]; then echo "skip $name"; return; fi
  echo "=== $name ($(date +%H:%M:%S))"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log"
  [ $rc -eq 0 ] && echo ok > "$OUT/$name.done" || echo "rc=$rc (kept for retry)"
}

run tr_rev 1500 python bench.py --train
run trd_rev 1500 python bench.py --dropout_train
run prof_grad 1800 python tools/profile_train.py --bs 24 --stage grad
echo "r5h sweep complete: $OUT"
