"""Headline benchmark: CU-Net-8 @256x256 inference images/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is the fraction of the conv-FLOP roofline achieved on this
chip (BASELINE.md north star: >=95% of roofline on TPU v5e). The reference
publishes no speed numbers, so roofline is the comparison point.
"""

import json
import time

import jax
import jax.numpy as jnp

from cunet_tpu.config import ModelConfig
from cunet_tpu.models import apply_cu_net, init_cu_net

# TPU v5e: 197 TFLOP/s bf16 dense. Used for the roofline denominator.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
    "cpu": 1e12,
}


def device_peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_FLOPS.items():
        if k.lower() in kind.lower():
            return v
    return 197e12


def conv_flops_per_image(cfg: ModelConfig) -> float:
    """Analytic MACs*2 of every conv in one forward pass (heads included)."""
    from cunet_tpu.models.cu_net import dense_block_channels

    c = cfg.init_chan_num
    g = cfg.growth_rate
    bc = cfg.bottleneck_chan
    flops = 0.0
    # stem 7x7/2: 128x128 out
    flops += 2 * 128 * 128 * 7 * 7 * 3 * c
    # per U-Net slot i, per block position at resolution r
    down_res = [64, 32, 16, 8]
    up_res = [64, 32, 16, 8]
    neck_res = 4
    for i in range(cfg.layer_num):
        for bl, r in enumerate(down_res):  # down blocks (skip adapter too)
            lin, ain = dense_block_channels(cfg, c)[i]
            hw = r * r
            flops += 2 * hw * (lin * bc + 9 * bc * g + 2 * ain * c)  # 1x1 + 3x3 + 2 adapters
        # neck
        lin, ain = dense_block_channels(cfg, c)[i]
        hw = neck_res * neck_res
        flops += 2 * hw * (lin * bc + 9 * bc * g + ain * c)
        # up blocks: in 2c, adapter out c
        for r in up_res:
            lin, ain = dense_block_channels(cfg, 2 * c)[i]
            hw = r * r
            flops += 2 * hw * (lin * bc + 9 * bc * g + ain * c)
        # intermedia adapter for i>0
        if i > 0:
            cin = c + min(i, cfg.order) * c if cfg.order > 0 else c
            flops += 2 * 64 * 64 * cin * c
        # head at anchored i
        if (i + 1) in cfg.anchors:
            flops += 2 * 64 * 64 * c * cfg.class_num
    return flops


def main():
    cfg = ModelConfig(
        layer_num=8,
        order=1,
        class_num=16,
        loss_num=8,
        compute_dtype="bfloat16",
        remat="none",
    )
    batch = 32
    params, state = init_cu_net(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def fwd(params, state, x):
        outs, _ = apply_cu_net(params, state, x, cfg=cfg, train=False)
        return outs[-1]

    x = jnp.ones((batch, 256, 256, 3), jnp.bfloat16)
    fwd(params, state, x).block_until_ready()  # compile

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(params, state, x)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * n_iters / dt
    flops = conv_flops_per_image(cfg)
    achieved = imgs_per_sec * flops
    roofline_frac = achieved / device_peak_flops()

    print(
        json.dumps(
            {
                "metric": "cu_net8_256_inference_images_per_sec_per_chip",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(roofline_frac, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
