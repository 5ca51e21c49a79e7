"""Capture a jax.profiler trace of the train grad step and print the op-level
time table (via tensorboard_plugin_profile's xplane converter) so backward
hotspots are attributable by HLO op category.

Usage: python tools/profile_train.py [--bs 24] [--stage grad|step|fwd]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=24)
    ap.add_argument("--stage", default="grad")
    ap.add_argument("--out", default="/tmp/cunet-prof")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from cunet_tpu.config import ModelConfig
    from cunet_tpu.models import apply_cu_net, init_cu_net
    from cunet_tpu.train.loss import intermediate_mse

    # the SHIPPED bench_train config (bench.py:113-117): whole-slot Pallas
    # train kernels, unrolled slots, ghost-BN tile 2. The Pallas launches
    # show up as one custom-call each (1 fwd + 2 bwd per slot), so the
    # table attributes time ACROSS launches/slots and to everything XLA
    # runs between them (optimizer, loss, copies) — not inside a kernel.
    cfg = ModelConfig(layer_num=8, order=1, class_num=16, loss_num=8,
                      compute_dtype="bfloat16", remat="none", use_scan=False,
                      use_pallas=True, bn_tile=2, bn_dtype="compute")
    bs = args.bs
    params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
    image = jnp.ones((bs, 256, 256, 3), jnp.bfloat16)
    target = jnp.zeros((bs, 64, 64, 16), jnp.float32)

    if args.stage == "fwd":
        @jax.jit
        def fn(p, s, x, t):
            outs, ns = apply_cu_net(p, s, x, cfg=cfg, train=True)
            return jnp.sum(outs[-1].astype(jnp.float32))
    else:
        @jax.jit
        def fn(p, s, x, t):
            def loss_fn(p):
                outs, ns = apply_cu_net(p, s, x, cfg=cfg, train=True)
                return intermediate_mse(outs, t), ns
            (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            return loss + jnp.sum(g["stem"]["conv"].astype(jnp.float32))

    # warmup/compile
    assert np.isfinite(float(fn(params, bn, image, target)))

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(3):
            out = fn(params, bn, image, target)
        float(out)

    # Parse the Chrome trace directly (the tensorboard_plugin_profile
    # converter is protobuf-version-broken in this env). Device-side
    # complete events carry per-op durations.
    import collections
    import gzip
    import json

    traces = glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"),
                       recursive=True)
    traces.sort(key=os.path.getmtime)
    if not traces:
        print("NO TRACE CAPTURED")
        return
    with gzip.open(traces[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    by = collections.defaultdict(float)
    cnt = collections.Counter()
    tot = 0.0
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and \
                "TPU" in pids.get(e["pid"], ""):
            by[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
            tot += e["dur"]
    print(f"trace: {traces[-1]}  total device-op us (incl. nesting): "
          f"{tot:.0f}")
    for n, d in sorted(by.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{d / 1000:9.3f} ms  x{cnt[n]:<4d} {n[:110]}")


if __name__ == "__main__":
    main()
