#!/bin/bash
# Round-5a: characterize the new dycol conv mode (VERDICT r4 #1 — kill the
# ~25 ms scatter tap-gather epilogue). First measurements (working tree,
# bt8 fori): dycol plan B (h-pad only) 3898.7 img/s / 65.66 ms vs the r4
# scatter default 3345.9 / 76.51; plan A (w-pad) loses at 2925.9.
# This sweep maps the remaining knobs on the dycol winner:
#   - batch-tile scaling (bt4 vs the default bt8),
#   - chunk rows 8192 (scatter OOMed there; dycol's transient is (m,3G)
#     not (m,9G) so the VMEM wall moved),
#   - bf16 prologue on the winner,
#   - K=16 flagship under dycol at bt4 and bt8 (VERDICT r4 #3: >=2000),
#   - the dx-gather ablation (what's left of the epilogue),
#   - int8 re-measure (VERDICT r4 #8) — scatter form, after the VPU cuts.
#
# Usage: bash tools/sweep_r5a.sh [outdir]   (default /tmp/r5sweep)
set -u
OUT=${1:-/tmp/r5sweep}
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

# dycol is the working-tree default; pin it anyway so the sweep is
# reproducible if the default moves again.
run dyc_bt4 900 env CUNET_KERNEL_CONV3X3=dycol CUNET_TERA_BATCH_TILE=4 \
  python tools/ablate_infer.py none
run dyc_cr8k 900 env CUNET_KERNEL_CONV3X3=dycol CUNET_TERA_CHUNK_ROWS=8192 \
  python tools/ablate_infer.py none
run dyc_b16p 900 env CUNET_KERNEL_CONV3X3=dycol CUNET_KERNEL_BF16_PROLOGUE=1 \
  python tools/ablate_infer.py none
run k16_dyc_bt4 900 env CUNET_KERNEL_CONV3X3=dycol CUNET_TERA_BATCH_TILE=4 \
  python tools/ablate_infer.py none 16
run k16_dyc_bt8 900 env CUNET_KERNEL_CONV3X3=dycol \
  python tools/ablate_infer.py none 16
# what remains of the tap-gather epilogue under dycol (LOWER bound)
run dyc_ab_scatteradd 900 env CUNET_KERNEL_CONV3X3=dycol \
  python tools/ablate_infer.py scatteradd
# stage decomposition at the dycol winner for the calibrated pass model
for a in pools affine fifo headdma; do
  run "dyc_ab_$a" 900 env CUNET_KERNEL_CONV3X3=dycol \
    python tools/ablate_infer.py "$a"
done
# int8 re-measure after the VPU cut (VERDICT r4 #8)
run i8_remeasure 1200 python bench.py --int8
echo "r5a sweep complete: $OUT"
