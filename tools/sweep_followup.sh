#!/bin/bash
# Round-4 follow-up runs (after tools/sweep_infer.sh): retry is handled by
# re-invoking sweep_infer.sh itself (it skips .done items); this script adds
# the round-4 metrics that postdate the main sweep matrix.
#
# Usage: bash tools/sweep_followup.sh [outdir]   (default /tmp/r4sweep)
set -u
OUT=${1:-/tmp/r4sweep}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ -s "$OUT/$name.done" ]; then echo "skip $name"; return; fi
  echo "=== $name ($(date +%H:%M:%S))"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -2 "$OUT/$name.log"
  [ $rc -eq 0 ] && echo ok > "$OUT/$name.done" || echo "rc=$rc (kept for retry)"
}

# dropout through the fused train kernels (round-4 feature): the dropout
# config must no longer fall off the 456-vs-175 cliff
run drop_train 1500 python bench.py --dropout_train
# conv3x3 backward via 9 thin per-tap dot pairs (no d_t tap-matrix build):
# trades the canonicalized-concat VPU work for 3x the MXU tile passes —
# wins if the backward is VPU/fixed-cost-bound like the eval kernel
CUNET_CONV_BWD=taps run tr_taps 1500 python bench.py --train
# the ratcheted 3-metric smoke gate (incl. the headline K=8 tera eval)
run gate_r4    1500 python tools/tpu_smoke.py
echo "followup complete: $OUT"
