#!/bin/bash
# Round-5f: follow-ups from r5e. tr_bn4 OOMed by only 4.67M of 128M VMEM
# (r4 scatter-era: 64.66M over) — tighter train-conv chunking may close it.
# Plus the lowdot (ups/dot commute) real-implementation measurements if the
# r5e uplow ablation shows a prize.
#
# Usage: bash tools/sweep_r5f.sh [outdir]   (default /tmp/r5f)
set -u
OUT=${1:-/tmp/r5f}
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

# bn_tile=4 with 1-image conv chunks at the hi-res stages (r5e OOM was
# 132.67M/128M at the default 8192-row chunks; r4 scatter-era: 192.66M)
run tr_bn4_cc4k 1800 env CUNET_TRAIN_CONV_CHUNK=4096 python -c "
import bench; bench.bench_train(bn_tile=4, bs=24)"
run tr_bn4_cc2k 1800 env CUNET_TRAIN_CONV_CHUNK=2048 python -c "
import bench; bench.bench_train(bn_tile=4, bs=24)"
# K=16 train with the same tile lift (bs12 -> 3 grid steps at bt4)
run k16tr_bn4_cc4k 2400 env CUNET_TRAIN_CONV_CHUNK=4096 python -c "
import bench; bench.bench_train(bn_tile=4, bs=12, layer_num=16)"
# stage decomposition AT THE SHIPPED CONFIG (r5e leg used the tool's old
# lax/scan defaults and crashed): unrolled slots, ghost-BN tile 2
run tr_diag 1800 python tools/train_diag.py --bs 24 --pallas --bn_tile 2 \
  --noscan --remat none --stages fwd_eval,fwd_train,grad,step
# lowdot: the real ups/dot-commute implementation (values correct)
run inf_lowdot 1200 env CUNET_UPS_DOT=low python tools/ablate_infer.py none
run inf_lowdot_bf16 1200 env CUNET_UPS_DOT=low CUNET_LOWDOT_DT=bf16 \
  python tools/ablate_infer.py none
run k16_lowdot 1200 env CUNET_UPS_DOT=low python tools/ablate_infer.py none 16
echo "r5f sweep complete: $OUT"
