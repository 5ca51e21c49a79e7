"""CPU-interpret repro of the on-chip fused-vs-lax grad parity failure.

Runs the EXACT smoke_grad_parity config (tools/tpu_smoke.py:124) at a sweep
of spatial sizes on the CPU backend (kernels auto-interpret off-TPU). If the
divergence reproduces at 256x256 on CPU, it is a chunking/shape bug in the
kernels, not a Mosaic compilation artifact.

Usage: JAX_PLATFORMS=cpu python tools/parity_repro.py [sizes...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def parity_at(hw: int, dtype: str = "bfloat16", nb: int = 4) -> float:
    from cunet_tpu.config import ModelConfig
    from cunet_tpu.models import apply_cu_net, init_cu_net
    from cunet_tpu.train.loss import intermediate_mse

    common = dict(layer_num=2, order=1, class_num=16, loss_num=2,
                  compute_dtype=dtype, remat="none", num_blocks=nb,
                  bn_dtype="compute", bn_tile=2)
    cfg_p = ModelConfig(use_pallas=True, **common)
    cfg_l = ModelConfig(use_pallas=False, **common)
    bs = 4
    params, bn = init_cu_net(jax.random.PRNGKey(0), cfg_l)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(bs, hw, hw, 3), jnp.dtype(dtype))
    t = jnp.asarray(rng.rand(bs, hw // 4, hw // 4, 16), jnp.float32)

    def grads(cfg):
        def loss(p):
            outs, _ = apply_cu_net(p, bn, x, cfg=cfg, train=True)
            return intermediate_mse(outs, t)

        return jax.jit(jax.grad(loss))(params)

    def compare(tag, g_a, g_b):
        la, _ = jax.tree_util.tree_flatten_with_path(g_a)
        lb, _ = jax.tree_util.tree_flatten_with_path(g_b)
        worst, worst_cos = 0.0, 1.0
        rows = []
        for (ka, a), (kb, b) in zip(la, lb):
            a = np.asarray(a, np.float32).ravel()
            b = np.asarray(b, np.float32).ravel()
            denom = np.maximum(np.abs(b), 1e-3)
            rel = float(np.max(np.abs(a - b) / denom))
            na, nb_ = np.linalg.norm(a), np.linalg.norm(b)
            cos = float(a @ b / (na * nb_ + 1e-30))
            rows.append((rel, cos, float(na / (nb_ + 1e-30)),
                         jax.tree_util.keystr(ka)))
            worst = max(worst, rel)
            worst_cos = min(worst_cos, cos)
        rows.sort(reverse=True)
        print(f"hw={hw} {dtype} nb={nb} [{tag}]: worst rel {worst:.4f} "
              f"worst cos {worst_cos:.6f}", flush=True)
        for rel, cos, nr, k in rows[:6]:
            print(f"    rel {rel:10.4f} cos {cos:.6f} |a|/|b| {nr:.4f}  {k}",
                  flush=True)
        return worst

    g_p, g_l = grads(cfg_p), grads(cfg_l)
    worst = compare("fused-vs-lax", g_p, g_l)

    # control: the SAME lax path with a 1-ulp input perturbation. If this
    # shows comparable worst-rel, the metric is chaotic at these shapes
    # (pool-routing flips amplify last-bit forward differences into O(1)
    # elementwise grad rerouting) and fused-vs-lax divergence is inherent,
    # not a kernel bug.
    x_pert = x * np.float32(1 + 2e-7) if dtype == "float32" else \
        (x.astype(jnp.float32) * (1 + 4e-3)).astype(jnp.bfloat16)

    def grads_at(cfg, xx):
        def loss(p):
            outs, _ = apply_cu_net(p, bn, xx, cfg=cfg, train=True)
            return intermediate_mse(outs, t)

        return jax.jit(jax.grad(loss))(params)

    g_l2 = grads_at(cfg_l, x_pert)
    compare("lax-vs-lax-perturbed", g_l2, g_l)
    return worst


if __name__ == "__main__":
    dtype = "bfloat16"
    nb = 4
    sizes = []
    for a in sys.argv[1:]:
        if a.startswith("nb="):
            nb = int(a[3:])
        elif a.isdigit():
            sizes.append(int(a))
        else:
            dtype = a
    for hw in sizes or [128]:
        parity_at(hw, dtype, nb)
