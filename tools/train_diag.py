"""Training-step time decomposition on the real chip.

The train step (ref:cu-net.py:147-206 hot loop) is ~7% of roofline while the
fused inference path is ~34% — this tool splits the step into nested stages
so the gap is attributable:

  fwd_eval   forward, eval-mode BN (running stats)
  fwd_train  forward, train-mode BN (batch stats)  -> stats cost
  grad       value_and_grad (fwd+bwd)              -> backward cost
  step       grad + RMSprop update                 -> optimizer cost

Usage: python tools/train_diag.py [--bs N] [--conv lax|scatter]
       [--remat none|bottleneck|block] [--pallas] [--stages s1,s2,...]
Timing is fetch-forced (block_until_ready is a no-op through the axon relay).
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cunet_tpu.config import ModelConfig, TrainConfig
from cunet_tpu.models import apply_cu_net, init_cu_net
from cunet_tpu.train import create_train_state, make_optimizer, train_step
from cunet_tpu.train.loss import intermediate_mse


def timeit(fn, *args, iters=8, reps=3, fetch):
    out = fn(*args)
    assert np.isfinite(fetch(out))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        assert np.isfinite(fetch(out))
        times.append((time.perf_counter() - t0) / iters)
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=24)
    ap.add_argument("--conv", default="lax", choices=["lax", "scatter"])
    ap.add_argument("--remat", default="bottleneck")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--layer_num", type=int, default=8)
    ap.add_argument("--stages", default="fwd_eval,fwd_train,grad,step")
    ap.add_argument("--pool", default="reduce_window",
                    choices=["reduce_window", "reshape", "slice"],
                    help="maxpool impl: reshape = jnp.max over axes (cheap "
                         "eq-mask VJP); slice = WRONG-NUMERICS stand-in that "
                         "removes pooling cost entirely (ablation only)")
    ap.add_argument("--bn", default="float32", choices=["float32", "compute"])
    ap.add_argument("--bn_tile", type=int, default=0,
                    help="ghost-BN group size; with --pallas dispatches the "
                         "fused train-slot kernels")
    ap.add_argument("--noscan", action="store_true")
    ap.add_argument("--flatten", action="store_true",
                    help="wrap the optimizer in optax.flatten (single-vector "
                         "update instead of ~800 per-leaf kernels)")
    args = ap.parse_args()

    if args.pool != "reduce_window":
        import cunet_tpu.models.cu_net as _cu
        import cunet_tpu.ops.layers as _layers

        if args.pool == "reshape":
            def pool(x):
                n, h, w, c = x.shape
                return jnp.max(x.reshape(n, h // 2, 2, w // 2, 2, c),
                               axis=(2, 4))
        else:
            def pool(x):
                return x[:, ::2, ::2, :]
        _cu.max_pool_2x2 = pool
        _layers.max_pool_2x2 = pool

    cfg = ModelConfig(layer_num=args.layer_num, order=1, class_num=16,
                      loss_num=args.layer_num, compute_dtype=args.dtype,
                      remat=args.remat, use_pallas=args.pallas,
                      conv3x3_impl=args.conv, bn_dtype=args.bn,
                      bn_tile=args.bn_tile, use_scan=not args.noscan)
    bs = args.bs
    params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
    image = jnp.ones((bs, 256, 256, 3), jnp.bfloat16)
    target = jnp.zeros((bs, 64, 64, 16), jnp.float32)
    stages = args.stages.split(",")
    label = (f"bs={bs} conv={args.conv} remat={args.remat} "
             f"pallas={args.pallas} dtype={args.dtype} K={args.layer_num} "
             f"bn={args.bn} bn_tile={args.bn_tile} scan={not args.noscan} "
             f"pool={args.pool}")
    print(f"== {label}")

    def report(name, dt):
        print(f"{name:10s} {dt * 1e3:8.1f} ms  {bs / dt:8.1f} img/s")

    if "fwd_eval" in stages:
        ecfg = cfg if not args.pallas else ModelConfig(
            layer_num=args.layer_num, order=1, class_num=16,
            loss_num=args.layer_num, compute_dtype=args.dtype,
            remat=args.remat, use_pallas=False, conv3x3_impl=args.conv)

        @jax.jit
        def fwd_eval(p, s, x):
            outs, _ = apply_cu_net(p, s, x, cfg=ecfg, train=False)
            return jnp.sum(outs[-1].astype(jnp.float32))

        report("fwd_eval", timeit(fwd_eval, params, bn, image, fetch=float))

    if "fwd_train" in stages:
        @jax.jit
        def fwd_train(p, s, x):
            outs, ns = apply_cu_net(p, s, x, cfg=cfg, train=True)
            return jnp.sum(outs[-1].astype(jnp.float32)) + jnp.sum(
                ns["stem"]["norm"]["mean"])

        report("fwd_train", timeit(fwd_train, params, bn, image, fetch=float))

    if "grad" in stages:
        @jax.jit
        def grad(p, s, x, t):
            def loss_fn(p):
                outs, ns = apply_cu_net(p, s, x, cfg=cfg, train=True)
                return intermediate_mse(outs, t), ns
            (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            # consume EVERY grad leaf or XLA dead-code-eliminates parts of
            # the backward and the measurement lies
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(g))
            return loss + tot

        report("grad", timeit(grad, params, bn, image, target, fetch=float))

    if "step" in stages:
        tx = make_optimizer(TrainConfig(lr=2.5e-4, batch_size=bs))
        if args.flatten:
            import optax

            tx = optax.flatten(tx)
        state = create_train_state(params, bn, tx)
        batch = {"image": image, "heatmap": target}
        step = jax.jit(lambda s, b: train_step(s, b, cfg=cfg, tx=tx))

        def run(s, b):
            ns, m = step(s, b)
            return m["loss"]

        report("step", timeit(run, state, batch, fetch=float))


if __name__ == "__main__":
    main()
