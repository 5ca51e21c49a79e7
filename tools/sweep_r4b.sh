#!/bin/bash
# Round-4b inference sweep: the scatter-conv epilogue decision, round 2.
# The r4a scatter legs (tools/sweep_scatter.sh) timed out at 420s during
# compile; scat_ab_add DID land and showed the tap-gather epilogue costs
# ~25 ms of the 84.65 ms batch (59.58 ms without it => 4297 img/s bound).
# This matrix re-runs the gather variants at 900s and adds the r4 pre-pad
# mode (CUNET_SCATTER_PAD=pre: pad the 128-lane conv input, not the
# 288-lane tap matrix — padding commutes with the per-position matmul).
#
# Usage: bash tools/sweep_r4b.sh [outdir]   (default /tmp/r4sweep)
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
# gather variants at 900s (420s hit mid-compile in r4a)
run scat2           900 python tools/ablate_infer.py none
CUNET_SCATTER_ADD=tree2 run scat2_tree2 900 python tools/ablate_infer.py none
CUNET_SCATTER_ADD=tree2 CUNET_TAPS_ACC=bf16 \
  run scat2_tree2_bf16 900 python tools/ablate_infer.py none
# pre-pad: 128-lane input pad replaces the 288-lane tap pad
CUNET_SCATTER_PAD=pre run scat_pre 900 python tools/ablate_infer.py none
CUNET_SCATTER_PAD=pre CUNET_SCATTER_ADD=tree2 \
  run scat_pre_tree2 900 python tools/ablate_infer.py none
CUNET_SCATTER_PAD=pre CUNET_SCATTER_ADD=tree2 CUNET_TAPS_ACC=bf16 \
  run scat_pre_t2bf 900 python tools/ablate_infer.py none
# K=16 flagship under the best pre-pad config (r4a: scatter tree2 bt4f
# already beat taps 1675 vs 1586)
CUNET_SCATTER_PAD=pre CUNET_SCATTER_ADD=tree2 CUNET_TERA_BATCH_TILE=4 \
  CUNET_CHUNK_LOOP=fori \
  run k16_scat_pre 900 python tools/ablate_infer.py none 16
# quant W1/I8/G8 training through the now-default unrolled slots
# (VERDICT r3 #7: >=400; scan record was 354.8)
run qt_unroll 1500 python bench.py --quant_train
# bf16 BN prologue: the affine+relu passes run f32 by default; bf16 halves
# their VPU bytes (the probe prices a bf16 pass at ~half the f32 one)
CUNET_SCATTER_PAD=pre CUNET_SCATTER_ADD=tree2 CUNET_KERNEL_BF16_PROLOGUE=1 \
  run bf16pro 900 python tools/ablate_infer.py none
# stage decomposition at the winning config (r4a ab_* logs were clobbered
# by a stale-install import error; these four decide the next VPU cut)
for a in pools affine fifo headdma; do
  CUNET_SCATTER_PAD=pre CUNET_SCATTER_ADD=tree2 \
    run "ab2_$a" 600 python tools/ablate_infer.py "$a"
done
echo "r4b sweep complete: $OUT"
