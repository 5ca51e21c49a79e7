#!/bin/bash
# Round-5g: bn_tile=4 retry with compute-dtype cross-launch cotangents
# (CUNET_TSBWD_DCOT=compute — the r5f bn4 OOM was 134.53M/128M and the
# f32 d_y_low+d_skips windows are ~10.6M of it), plus the r5f lowdot
# winners promoted to a driver-mode confirmation.
#
# Usage: bash tools/sweep_r5g.sh [outdir]   (default /tmp/r5g)
set -u
OUT=${1:-/tmp/r5g}
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

run tr_bn4_dcot 1800 env CUNET_TSBWD_DCOT=compute python -c "
import bench; bench.bench_train(bn_tile=4, bs=24)"
run k16tr_bn4_dcot 2400 env CUNET_TSBWD_DCOT=compute python -c "
import bench; bench.bench_train(bn_tile=4, bs=12, layer_num=16)"
# control at bt2: does the cotangent downcast alone move throughput?
run tr_bt2_dcot 1500 env CUNET_TSBWD_DCOT=compute python bench.py --train
# stats caching (exact): sa/ss compose from s1 parts + out32; ups-part
# stats at producer res. Affects the fwd launch of every train config.
run tr_statcache 1500 python bench.py --train
run trd_statcache 1500 python bench.py --dropout_train
# K16 eval chunk-rows probe at bt4 (4096 is the K8-tuned default)
run k16_cr2k 1200 env CUNET_TERA_CHUNK_ROWS=2048 python tools/ablate_infer.py none 16
run k16_cr8k 1200 env CUNET_TERA_CHUNK_ROWS=8192 python tools/ablate_infer.py none 16
echo "r5g sweep complete: $OUT"
# K16 driver-mode confirm at the new per-K default chunk rows
run k16_newdefault 1500 python -c "
import bench; bench.main(layer_num=16, metric_tag='cu_net16')"
