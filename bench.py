"""Headline benchmark: CU-Net-8 @256x256 inference images/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is the fraction of the bf16 matmul-roofline achieved on this
chip for the model's conv FLOPs (BASELINE.md north star: >=95% of conv-FLOP
roofline on TPU v5e). The reference publishes no speed numbers, so roofline
is the comparison point.

Methodology: ``block_until_ready`` does NOT synchronize through the axon
relay used in this environment, so timing is fetch-forced: the jitted step
returns a scalar reduction of the heatmaps, N steps are dispatched (device
executes in submission order), and the wall clock stops when the LAST
step's scalar materializes on the host. Output finiteness is verified so an
async failure crashes rather than inflating the number.
"""

import json
import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: the r4 sweep measured that it round-trips
# through the axon remote-compile path (tr_unroll_cold 147 s wall ->
# tr_unroll_warm 64 s), which is what makes the unrolled train config
# driver-shippable. Harmless on platforms without it.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/axcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:  # older jax: cache flags absent — run uncached
    pass

from cunet_tpu.config import ModelConfig
from cunet_tpu.models import apply_cu_net, init_cu_net

# bf16 dense peak per chip. v5e: 197 TFLOP/s.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def device_peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_FLOPS.items():
        if k.lower() in kind.lower():
            return v
    return 197e12


def conv_flops_per_image(cfg: ModelConfig) -> float:
    """Analytic MACs*2 of every conv in one forward (validated against XLA
    cost analysis of the lax path to within 0.2%)."""
    from cunet_tpu.models.cu_net import dense_block_channels

    c = cfg.init_chan_num
    g = cfg.growth_rate
    bc = cfg.bottleneck_chan
    flops = 2.0 * 128 * 128 * 7 * 7 * 3 * c  # stem
    down_res = [64, 32, 16, 8]
    for i in range(cfg.layer_num):
        lin, ain = dense_block_channels(cfg, c)[i]
        for r in down_res:  # down blocks: 1x1 + 3x3 + 2 adapters
            flops += 2.0 * r * r * (lin * bc + 9 * bc * g + 2 * ain * c)
        flops += 2.0 * 4 * 4 * (lin * bc + 9 * bc * g + ain * c)  # neck
        ulin, uain = dense_block_channels(cfg, 2 * c)[i]
        for r in down_res:  # up blocks (adapter out = c)
            flops += 2.0 * r * r * (ulin * bc + 9 * bc * g + uain * c)
        if i > 0:
            cin = c + min(i, cfg.order) * c if cfg.order > 0 else c
            flops += 2.0 * 64 * 64 * cin * c  # intermedia
        if (i + 1) in cfg.anchors:
            flops += 2.0 * 64 * 64 * c * cfg.class_num  # head
    return flops


def train_flops_per_image(cfg: ModelConfig) -> float:
    """Training cost model: forward + backward. Backward of a conv is two
    convs' worth (dX + dW), so fwd+bwd ~= 3x fwd; remat=bottleneck recomputes
    the bottleneck 1x1s (~20% of MACs) once more => ~3.2x."""
    return 3.2 * conv_flops_per_image(cfg)


def bench_train(quant: bool = False, bn_tile: int = 2, bs: int = 24,
                use_scan: bool = False, layer_num: int = 8,
                drop: float = 0.0):
    """CU-Net-8 @256 bs24 training step throughput (the reference's headline
    workload: ref:cu-net.py:147-206 RMSprop heatmap regression). With
    ``quant``: the WAGE W1/I8/G8 protocol (ref:cu-net-prev-version-wig.py
    trainer) through the same fused kernels — QuanInput STE in-kernel,
    weight fake-quant outside."""
    from cunet_tpu.config import TrainConfig
    from cunet_tpu.train import create_train_state, make_optimizer, train_step

    from cunet_tpu.models import stack_steady

    # whole-slot fused train kernels (1 fwd + 2 bwd launches per slot),
    # ghost-BN tile 2 = the reference's per-replica DataParallel BN stats.
    # Default = UNROLLED slots (r4: 477-480 img/s at ~2.5 min cold / ~1 min
    # cached compile — the stacked-param + conv-chunk work shrank the old
    # 25-min unrolled compile, and the persistent cache survives the axon
    # remote-compile path). use_scan=True keeps the natively STACKED
    # zero-marshal lax.scan (369-371 img/s) for compile-time-sensitive use.
    cfg = ModelConfig(layer_num=layer_num, order=1, class_num=16,
                      loss_num=layer_num,
                      compute_dtype="bfloat16", remat="none", use_scan=use_scan,
                      use_pallas=True, bn_tile=bn_tile, bn_dtype="compute",
                      drop_rate=drop)
    params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainConfig(lr=2.5e-4, batch_size=bs))
    if use_scan:  # stacked storage requires the scan path
        params, bn = stack_steady(params, cfg), stack_steady(bn, cfg)
    state = create_train_state(params, bn, tx)
    batch = {"image": jnp.ones((bs, 256, 256, 3), jnp.bfloat16),
             "heatmap": jnp.zeros((bs, 64, 64, 16), jnp.float32)}
    if quant:
        from cunet_tpu.config import QuantConfig
        from cunet_tpu.train.quant_step import quant_train_step

        qcfg = QuantConfig(bits_w=1, bits_i=8, bits_g=8, enabled=True)
        step = jax.jit(
            lambda s, b: quant_train_step(s, b, cfg=cfg, qcfg=qcfg, tx=tx),
            donate_argnums=0)  # in-place param/opt updates (HBM traffic)
    else:
        rng = jax.random.PRNGKey(11) if drop > 0 else None
        step = jax.jit(lambda s, b: train_step(s, b, cfg=cfg, tx=tx, rng=rng),
                       donate_argnums=0)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    n_iters = 8
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))  # fetch forces the queue
        times.append((time.perf_counter() - t0) / n_iters)
    dt = statistics.median(times)
    tag = "" if bn_tile == 2 else f"_bn{bn_tile}"
    if drop > 0:  # dropout trains THROUGH the fused kernels (masks in-kernel)
        tag += f"_drop{drop:g}"
    name = f"cu_net{layer_num}"
    print(json.dumps({
        "metric": (f"{name}_256_quant_w1i8g8_train{tag}_images_per_sec_per_chip"
                   if quant else f"{name}_256_train{tag}_images_per_sec_per_chip"),
        "value": round(bs / dt, 2),
        "unit": "images/sec",
        "vs_baseline": round(train_flops_per_image(cfg) * bs / dt
                             / device_peak_flops(), 4),
    }), flush=True)


def main(layer_num: int = 8, metric_tag: str = "cu_net8", int8: bool = False):
    cfg = ModelConfig(
        layer_num=layer_num,
        order=1,
        class_num=16,
        loss_num=layer_num,
        compute_dtype="bfloat16",
        remat="none",
        use_pallas=True,
        pallas_whole_model=True,  # single-launch forward (tera-kernel)
    )
    params, state = init_cu_net(jax.random.PRNGKey(0), cfg)

    import os
    bt_env_set = False
    if int8 and "CUNET_TERA_BATCH_TILE" not in os.environ:
        # the int8 tera-kernel carries packed weights + per-channel scales
        # alongside the bf16 plumbing; bt=2 fits since the HBM head/stem DMA
        # (1703 img/s vs 1658 at bt1); bt=8 compiles too slowly to bench
        os.environ["CUNET_TERA_BATCH_TILE"] = "2"
        bt_env_set = True
    try:
        return _main_body(cfg, metric_tag, int8, params, state)
    finally:
        if bt_env_set:
            # always remove, even on failure, so a raised int8 run cannot
            # leak the tile override into the subsequent headline run
            os.environ.pop("CUNET_TERA_BATCH_TILE", None)


def _main_body(cfg, metric_tag, int8, params, state):
    batch = 256
    quant = None
    if int8:
        # the quantized flagship on the int8 MXU (real low-bit inference —
        # the reference only simulates it, ref:utils/quantize.py:127-149)
        from cunet_tpu.config import QuantConfig
        from cunet_tpu.train.quant_step import quant_eval_params

        quant = QuantConfig(bits_w=1, bits_i=8, bits_g=8, enabled=True,
                            int8_infer=True, int8_impl="pallas")
        params = quant_eval_params(params, quant)

    def fwd(params, state, x):
        outs, _ = apply_cu_net(params, state, x, cfg=cfg, train=False,
                               quant=quant)
        out = outs[-1]
        # scalar pair: (sum, min) lets the host verify finiteness cheaply
        o32 = out.astype(jnp.float32)
        return jnp.sum(o32), jnp.min(o32)

    x = jnp.ones((batch, 256, 256, 3), jnp.bfloat16)
    compiled = jax.jit(fwd).lower(params, state, x).compile()
    # XLA cost analysis cannot see inside Pallas custom-calls; use the
    # model's analytic conv-FLOP count (equals XLA's count on the lax path:
    # 697.87 GFLOP for CU-Net-8 @256, batch 32, loss_num 8).
    flops_per_batch = conv_flops_per_image(cfg) * batch

    # warmup + correctness gate
    s0, m0 = compiled(params, state, x)
    assert np.isfinite(float(s0)) and np.isfinite(float(m0)), "non-finite output"

    n_iters = 15
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = [compiled(params, state, x) for _ in range(n_iters)]
        s_last = float(res[-1][0])  # fetch forces completion of the queue
        times.append((time.perf_counter() - t0) / n_iters)
        assert np.isfinite(s_last)

    dt = statistics.median(times)
    imgs_per_sec = batch / dt
    achieved = flops_per_batch / dt
    roofline_frac = achieved / device_peak_flops()

    line = json.dumps(
        {
            "metric": f"{metric_tag}_256_inference_images_per_sec_per_chip",
            "value": round(imgs_per_sec, 2),
            "unit": "images/sec",
            "vs_baseline": round(roofline_frac, 4),
        }
    )
    print(line, flush=True)
    return line


if __name__ == "__main__":
    import os
    import sys
    import traceback

    if "--train" in sys.argv:
        bench_train()
    elif "--dropout_train" in sys.argv:  # dense-layer dropout in-kernel
        # default drop_impl="prng": masks are generated INSIDE the kernels
        # (ops/dropmask.py) — no HBM mask stream and no host threefry cost,
        # so no global PRNG-impl switch is needed. CUNET_DROP_PRNG=rbg
        # restores the r4 workaround for the legacy masks mode.
        if os.environ.get("CUNET_DROP_PRNG", "") == "rbg":
            jax.config.update("jax_default_prng_impl", "rbg")
        bench_train(drop=0.2)
    elif "--quant_train" in sys.argv:  # WAGE W1/I8/G8 fused-kernel training
        bench_train(quant=True)
    elif "--k16" in sys.argv:  # the human flagship (ref:README.md:43)
        main(layer_num=16, metric_tag="cu_net16")
    elif "--int8" in sys.argv:  # quantized flagship, real int8 MXU execution
        main(metric_tag="cu_net8_int8", int8=True)
    else:
        # Default (driver) mode. The headline bf16 inference metric runs
        # FIRST so a parseable JSON line exists within minutes, then the
        # auxiliary scoreboard runs under an explicit wall-clock budget
        # (each aux metric only starts if there is budget left — one hang
        # cannot erase the headline), and finally the headline line is
        # RE-PRINTED last because the driver parses the last line.
        headline = main()
        budget_s = float(os.environ.get("CUNET_BENCH_BUDGET_S", "900"))
        t_start = time.perf_counter()
        for label, fn in (
            ("train", bench_train),
            ("quant_train", lambda: bench_train(quant=True)),
            ("dropout_train", lambda: bench_train(drop=0.2)),
            ("k16", lambda: main(layer_num=16, metric_tag="cu_net16")),
            ("k16_train", lambda: bench_train(layer_num=16, bs=12)),
            ("int8", lambda: main(metric_tag="cu_net8_int8", int8=True)),
        ):
            if time.perf_counter() - t_start > budget_s:
                print(f"bench[{label}] skipped: aux budget exhausted "
                      f"({budget_s:.0f}s)", file=sys.stderr)
                continue
            try:
                fn()
            except Exception:
                print(f"bench[{label}] failed:", file=sys.stderr)
                traceback.print_exc()
        print(headline, flush=True)
