#!/bin/bash
# Round-4d: follow-up after r4c's first three legs answered the big question:
#   scatter + CUNET_CHUNK_LOOP=fori = 3344.8 img/s (beats the shipped taps
#   3005); tree2 is slightly SLOWER than flat9 (3302.5); taps+fori and every
#   pre-pad leg VMEM-OOM at bt8 (pre keeps both the padded input copy and
#   the 288-lane tap buffer live per chunk).
# r4d re-targets the remaining experiments at the WORKING winner
# (scatter+fori+flat9+post) instead of the OOM config:
#   - stage ablations for the calibrated pass model,
#   - batch-tile scaling (does bt8 still beat bt4 under fori?),
#   - pre-pad retry at the smaller footprints where it might fit,
#   - VPU-byte cuts (bf16 prologue / bf16 tap accumulate) on the winner,
#   - K=16 flagship (VERDICT r3 #6 target >=2000),
#   - quant-train through the unrolled slots (VERDICT r3 #7 target >=400).
#
# Usage: bash tools/sweep_r4d.sh [outdir]   (default /tmp/r4sweep)
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

export CUNET_CHUNK_LOOP=fori CUNET_KERNEL_CONV3X3=scatter
# batch-tile scaling under fori. Per-leg env goes through `env` (not the
# bash-only prefix-on-a-function form, which leaks the assignment into the
# caller's environment under POSIX sh semantics).
run scatf_bt4 900 env CUNET_TERA_BATCH_TILE=4 python tools/ablate_infer.py none
# VPU-byte cuts on the winner
run scatf_bf16acc 900 env CUNET_TAPS_ACC=bf16 python tools/ablate_infer.py none
run scatf_b16p 900 env CUNET_KERNEL_BF16_PROLOGUE=1 python tools/ablate_infer.py none
# pre-pad retry where it might fit (bt4 halves resident activations;
# chunk 2048 halves the transient)
run scatf_pre_bt4 900 env CUNET_SCATTER_PAD=pre CUNET_TERA_BATCH_TILE=4 \
  python tools/ablate_infer.py none
run scatf_pre_cr2k 900 env CUNET_SCATTER_PAD=pre CUNET_TERA_CHUNK_ROWS=2048 \
  python tools/ablate_infer.py none
# K=16 flagship (bt4 fit measured in r4a at 1675 with tree2; try flat9)
run k16_scatf 900 env CUNET_TERA_BATCH_TILE=4 python tools/ablate_infer.py none 16
# stage decomposition at the WINNER config for the pass model
for a in pools affine fifo headdma scatteradd; do
  run "ab4_$a" 900 python tools/ablate_infer.py "$a"
done
unset CUNET_KERNEL_CONV3X3 CUNET_CHUNK_LOOP
# quant W1/I8/G8 training through the r4-shipped UNROLLED slots. Pinned
# explicitly: after the scatter+fori default flip (commit c045655) a bare
# env would resolve to a different config than this leg's recorded numbers.
run qt_unroll2 1500 env CUNET_KERNEL_CONV3X3=taps CUNET_CHUNK_LOOP=unroll \
  python bench.py --quant_train
echo "r4d sweep complete: $OUT"
