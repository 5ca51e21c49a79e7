#!/bin/bash
# Round-5c: (1) train-side dycol port (VERDICT r4 #4 — the fwd conv and the
# conv backward's shifted-cotangent build move from the scatter form to
# dycol: 3 canonicalized slices instead of 9, no (m, 9G) tap transient);
# (2) chunk-pair ILP probe on the MXU-issue-bound inference kernel;
# (3) pool/upsample re-measures under the dycol-era balance;
# (4) the ratcheted smoke gate incl. the new tight-parity leg.
#
# Usage: bash tools/sweep_r5c.sh [outdir]   (default /tmp/r5c)
set -u
OUT=${1:-/tmp/r5c}
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

# train with the dycol conv port (new default)
run tr_dycol 1500 python bench.py --train
run trd_dycol 1500 python bench.py --dropout_train
run qt_dycol 1500 python bench.py --quant_train
run k16tr_dycol 1800 env CUNET_TRAIN_CONV3X3=dycol python -c "
import bench; bench.bench_train(layer_num=16, bs=12)"
# control: the r4 scatter train form in this process environment
run tr_scatter 1500 env CUNET_TRAIN_CONV3X3=scatter python bench.py --train
# inference: chunk-pair ILP probe (2 chunks per fori step)
run inf_pair 1200 env CUNET_CHUNK_PAIR=1 python tools/ablate_infer.py none
run k16_pair 1200 env CUNET_CHUNK_PAIR=1 CUNET_TERA_BATCH_TILE=4 \
  python tools/ablate_infer.py none 16
# pool/upsample alternatives under the dycol-era balance
run inf_ups_rep 1200 env CUNET_UPS_MODE=repeat python tools/ablate_infer.py none
run inf_pool_6d 1200 env CUNET_POOL_MODE=max6d python tools/ablate_infer.py none
# gates: throughput floors + both parity legs (incl. the new tight median leg)
run smoke 3000 python tools/tpu_smoke.py
run smoke_parity 1800 python tools/tpu_smoke.py --parity
echo "r5c sweep complete: $OUT"
