#!/bin/bash
# Round-4c: the scatter matrix under CUNET_CHUNK_LOOP=fori. Evidence so far:
# every non-fori scatter leg at K8-bt8 times out in Mosaic compile (420 s in
# r4a, retried at 900 s in r4b), while the only scatter config that ever
# compiled quickly was k16_scat_bt4f (fori). The fori chunk loop bounds the
# compiled code size (one chunk body instead of bt/ci unrolled copies).
# tapsf isolates the fori runtime cost vs the unrolled-chunks taps base.
#
# Usage: bash tools/sweep_r4c.sh [outdir]   (default /tmp/r4sweep)
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

export CUNET_CHUNK_LOOP=fori
# fori runtime cost control (taps mode, otherwise the shipped config)
run tapsf 900 python tools/ablate_infer.py none
export CUNET_KERNEL_CONV3X3=scatter
run scatf            900 python tools/ablate_infer.py none
CUNET_SCATTER_ADD=tree2 run scatf_tree2 900 python tools/ablate_infer.py none
CUNET_SCATTER_PAD=pre CUNET_SCATTER_ADD=tree2 \
  run scatf_pre_tree2 900 python tools/ablate_infer.py none
CUNET_SCATTER_PAD=pre CUNET_SCATTER_ADD=tree2 CUNET_TAPS_ACC=bf16 \
  run scatf_pre_t2bf 900 python tools/ablate_infer.py none
CUNET_SCATTER_PAD=pre CUNET_SCATTER_ADD=tree2 CUNET_KERNEL_BF16_PROLOGUE=1 \
  run scatf_pre_t2_b16p 900 python tools/ablate_infer.py none
# K=16 flagship under the best config (VERDICT r3 #6: >=2000)
CUNET_SCATTER_PAD=pre CUNET_SCATTER_ADD=tree2 CUNET_TERA_BATCH_TILE=4 \
  run k16_scatf_pre 900 python tools/ablate_infer.py none 16
# stage decomposition at the fori pre-pad tree2 config
for a in pools affine fifo headdma scatteradd; do
  CUNET_SCATTER_PAD=pre CUNET_SCATTER_ADD=tree2 \
    run "ab3_$a" 900 python tools/ablate_infer.py "$a"
done
unset CUNET_KERNEL_CONV3X3 CUNET_CHUNK_LOOP
# quant W1/I8/G8 training through the now-default unrolled slots
# (VERDICT r3 #7: >=400; scan record was 354.8) — clean default env
run qt_unroll2 1500 python bench.py --quant_train
echo "r4c sweep complete: $OUT"
