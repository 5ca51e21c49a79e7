#!/bin/bash
# Round-4 scatter-conv decision matrix. The r3 sweep's tap-dtype legs
# (taps_f32/taps_bf16/tree2*) silently measured NOTHING: those env knobs
# only affect the SCATTER conv branch, and the shipped default conv mode is
# "taps" (9 thin N=32 dots, kernels/fused_hourglass.py:35-39) — nothing in
# the product path ever set CUNET_KERNEL_CONV3X3=scatter. The r2 scatter
# record (3070 img/s) was an env-override experiment at bt2 that never
# became the default. This matrix re-runs the scatter question properly at
# today's bt8+chunked kernel, with the knobs actually keyed to scatter.
#
# Usage: bash tools/sweep_scatter.sh [outdir]   (default /tmp/r4sweep)
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

export CUNET_KERNEL_CONV3X3=scatter
# scatter at bt8 straight up (vs taps base ~3024)
run scat          420 python tools/ablate_infer.py none
# two-level tap gather: 3+3 adds at 3G/G width instead of 9 at G width
CUNET_SCATTER_ADD=tree2 run scat_tree2 420 python tools/ablate_infer.py none
# + accumulate taps in bf16 (halves tap-add bytes, drops 9 upcasts)
CUNET_SCATTER_ADD=tree2 CUNET_TAPS_ACC=bf16 \
  run scat_tree2_bf16 420 python tools/ablate_infer.py none
# keep the tap matrix f32 (skip the downcast + 9 upcasts, 2x pad bytes)
CUNET_TAPS_F32=1  run scat_f32 420 python tools/ablate_infer.py none
# decompose: the fat dot without the 9 tap adds (epilogue cost bound)
run scat_ab_add   420 python tools/ablate_infer.py scatteradd
# K=16 flagship under the best-guess scatter config
CUNET_SCATTER_ADD=tree2 CUNET_TERA_BATCH_TILE=4 CUNET_CHUNK_LOOP=fori \
  run k16_scat_bt4f 900 python tools/ablate_infer.py none 16
echo "scatter sweep complete: $OUT"
