#!/bin/bash
# Round-5e battery, queued after the r5d gate runs:
#   (1) train levers under the dycol-era kernels (VERDICT r4 #4): the two
#       r4 VMEM-OOM configs re-tried now that dycol killed the (m, 9G) tap
#       transient — ghost-BN tile 4 and the merged single-launch backward —
#       plus a stage decomposition (fwd_eval/fwd_train/grad/step) so the
#       remaining backward time is attributable;
#   (2) the pltpu.repeat upsample as a default candidate (r5c: 3684 vs
#       ~3650 cat, K8) — confirm on K8 and measure on K16 where the round
#       target is >=2000 img/s (r5 record 1969.6 at bt4);
#   (3) the full driver scoreboard (python bench.py) so the ratcheted
#       smoke floors are set off driver-mode numbers, not sweep legs.
#
# Usage: bash tools/sweep_r5e.sh [outdir]   (default /tmp/r5e)
set -u
OUT=${1:-/tmp/r5e}
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

# (1) train levers
run tr_bn4 1500 python -c "
import bench; bench.bench_train(bn_tile=4, bs=24)"
run tr_single 1500 env CUNET_TSBWD_SINGLE=1 python bench.py --train
run tr_diag 1800 python tools/train_diag.py --bs 24 --pallas \
  --stages fwd_eval,fwd_train,grad,step
# (2) upsample default candidate
run inf_ups_rep 1200 env CUNET_UPS_MODE=repeat python tools/ablate_infer.py none
run inf_ctl 1200 python tools/ablate_infer.py none
run k16_ups_rep 1200 env CUNET_UPS_MODE=repeat python tools/ablate_infer.py none 16
run k16_ctl 1200 python tools/ablate_infer.py none 16
# (2b) ups/dot-commute prize (timing ablation, wrong values): up-block dots
# skip the ups lanes + producers skip the ups write — upper bound for the
# "lowdot" restructure on K8 and K16
run inf_uplow 1200 python tools/ablate_infer.py uplow
run k16_uplow 1200 python tools/ablate_infer.py uplow 16
# (3) full driver scoreboard at current defaults
run bench_all 2400 python bench.py
echo "r5e sweep complete: $OUT"
