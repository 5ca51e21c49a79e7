"""Differential stage-ablation timing for the inference tera-kernel.

Usage: python tools/ablate_infer.py [ablate_list [layer_num]]

Runs ONE timing of the whole-model Pallas eval with CUNET_ABLATE set to
``ablate_list`` (comma list, see kernels/fused_hourglass.py) and prints a
JSON line with ms per 256-image batch. Each config needs its own process:
the ablation set is latched at module import.

Methodology (PARITY.md): looped microbenchmarks are invalid on Mosaic
(loop-invariant dots hoist), so stages are ablated with shape-preserving
stand-ins and the delta vs baseline is attributed to the stage. Stand-ins
carry their own cost, so deltas are LOWER bounds.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ablate = sys.argv[1] if len(sys.argv) > 1 else ""
if ablate and ablate != "none":
    os.environ["CUNET_ABLATE"] = ablate

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cunet_tpu.config import ModelConfig  # noqa: E402
from cunet_tpu.models import apply_cu_net, init_cu_net  # noqa: E402


def main():
    layer_num = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = ModelConfig(layer_num=layer_num, order=1, class_num=16,
                      loss_num=layer_num, compute_dtype="bfloat16",
                      remat="none", use_pallas=True, pallas_whole_model=True)
    batch = 256
    params, state = init_cu_net(jax.random.PRNGKey(0), cfg)

    def fwd(params, state, x):
        outs, _ = apply_cu_net(params, state, x, cfg=cfg, train=False)
        o32 = outs[-1].astype(jnp.float32)
        return jnp.sum(o32), jnp.min(o32)

    x = jnp.ones((batch, 256, 256, 3), jnp.bfloat16)
    t_c = time.perf_counter()
    compiled = jax.jit(fwd).lower(params, state, x).compile()
    print(f"compile_s: {time.perf_counter() - t_c:.1f}", flush=True)
    s0, _ = compiled(params, state, x)
    if "headdma" not in ablate:      # headdma leaves the output garbage
        assert np.isfinite(float(s0))
    else:
        float(s0)
    n_iters = 15
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = [compiled(params, state, x) for _ in range(n_iters)]
        float(res[-1][0])
        times.append((time.perf_counter() - t0) / n_iters)
    dt = statistics.median(times)
    print(json.dumps({"ablate": ablate or "none", "ms_per_batch":
                      round(dt * 1e3, 2), "img_per_sec": round(batch / dt, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
