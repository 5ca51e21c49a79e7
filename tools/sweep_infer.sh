#!/bin/bash
# Round-3 inference perf sweep. Run when the axon relay is healthy.
# One TPU process per config (env knobs latch at import), generous
# per-run timeouts INSIDE the command (killing a TPU process mid-claim
# wedges the relay 15-35 min — never Ctrl-C / pkill these).
#
# Usage: bash tools/sweep_infer.sh [outdir]   (default /tmp/r3sweep)
set -u
OUT=${1:-/tmp/r3sweep}
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

# 0. regression gate first: today's tree must hold the ratcheted floors
#    before any experiment data is trusted (3 metrics incl. K=8 tera)
run gate        1800 python tools/tpu_smoke.py
# 1. today's baseline (relay throughput varies ~10% day to day; doubles as
#    the ablation reference)
run base        420 python tools/ablate_infer.py none
# 2. MXU/VPU overlap question — shapes the whole optimization strategy
run overlap     600 python tools/mosaic_probe.py overlap
# 3. per-op pass-cost constants
run probe_core  600 python tools/mosaic_probe.py core extra
# 4. chunk-rows scaling (fewer, larger passes at high res)
CUNET_TERA_CHUNK_ROWS=8192  run chunk8k  420 python tools/ablate_infer.py none
CUNET_TERA_CHUNK_ROWS=16384 run chunk16k 420 python tools/ablate_infer.py none
# 5. tap-matrix dtype experiments (scatter-conv epilogue)
CUNET_TAPS_F32=1     run taps_f32  420 python tools/ablate_infer.py none
CUNET_TAPS_ACC=bf16  run taps_bf16 420 python tools/ablate_infer.py none
CUNET_SCATTER_ADD=tree2 run tree2  420 python tools/ablate_infer.py none
CUNET_SCATTER_ADD=tree2 CUNET_TAPS_ACC=bf16 \
  run tree2_bf16 420 python tools/ablate_infer.py none
# pool/upsample lowering recheck at the bt8+chunked kernel (r2 choices were
# measured at bt2)
CUNET_UPS_MODE=broadcast run ups_bcast 420 python tools/ablate_infer.py none
CUNET_POOL_MODE=max6d    run pool_6d   420 python tools/ablate_infer.py none
# 6. stage ablation decomposition at the current default tile
for a in none bottleneck adapters conv scatteradd vec2 fifo pools affine headdma; do
  run "ab_$a" 420 python tools/ablate_infer.py "$a"
done
# 7. K=16 tile scaling (HBM head/stem DMA + chunking may unlock bt>2 now;
#    fori chunk loop keeps the compile bounded at large tiles)
CUNET_TERA_BATCH_TILE=4 run k16_bt4 900 python tools/ablate_infer.py none 16
CUNET_TERA_BATCH_TILE=4 CUNET_CHUNK_LOOP=fori \
  run k16_bt4f 900 python tools/ablate_infer.py none 16
# 8. int8 tile scaling (VERDICT #6: int8 must beat bf16 or stop advertising)
CUNET_TERA_BATCH_TILE=4 CUNET_CHUNK_LOOP=fori \
  run i8_bt4f 900 python bench.py --int8
CUNET_TERA_BATCH_TILE=8 CUNET_CHUNK_LOOP=fori \
  run i8_bt8f 900 python bench.py --int8
# 9. bn_tile=4 ghost-BN train step (conv transients now chunk;
#    VMEM compile check + step timing — VERDICT #4)
run bn4_train 1500 python -c "import bench; bench.bench_train(bn_tile=4)"
# 10. train backward d_t builder variant (compile may fail — that's data)
CUNET_CONV_BWD=catc3 run tr_catc3 1500 python bench.py --train
# 11. persistent-compile-cache probe: if the cache round-trips through the
#    axon remote-compile path, the 25-min unrolled train compile is paid
#    once and the driver bench can ship the 456 img/s unrolled config.
#    Run TWICE; a warm second run (< ~3 min) = cache works.
JAX_COMPILATION_CACHE_DIR=/tmp/axcache run tr_unroll_cold 2700 \
  python -c "import bench; bench.bench_train(use_scan=False)"
JAX_COMPILATION_CACHE_DIR=/tmp/axcache run tr_unroll_warm 2700 \
  python -c "import bench; bench.bench_train(use_scan=False)"
# 12. single-launch whole-slot backward (one launch instead of two per
#    slot; VMEM compile probe + timing)
CUNET_TSBWD_SINGLE=1 run tr_single 1500 python bench.py --train
# 13. on-chip fused-vs-lax grad parity (advisor r2: pool-bwd recompute
#    divergence is only observable on real hardware)
run parity 1200 python tools/tpu_smoke.py --parity
echo "sweep complete: $OUT"
