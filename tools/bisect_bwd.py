"""Dev-only: probe the train-slot BWD kernels at real dims on TPU, per slot
variant. Usage: python tools/bisect_bwd.py [variant ...]

Variants: steady (L=1, inter, full cotangents), slot0 (L=0, no inter),
last (loss touches only the head -> zero cotangents elsewhere),
grow (slot 1 of order 2: L=1 but growing fifos).
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys; sys.path.insert(0, %(here)r)
import jax, jax.numpy as jnp
from cunet_tpu.config import ModelConfig
from cunet_tpu.models import init_cu_net
from cunet_tpu.models.cu_net import _slot_subtree
from cunet_tpu.kernels.train_slot import fused_slot_train, marshal_slot

variant = %(variant)r
cfg = ModelConfig(layer_num=8, order=1, class_num=16, loss_num=8,
                  compute_dtype="bfloat16", bn_tile=2, bn_dtype="compute")
params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
H0, N = 64, 8
y = jnp.ones((N, H0, H0, 128), jnp.bfloat16)
slot_i = 0 if variant == "slot0" else 1
L = 0 if variant == "slot0" else 1
has_inter = variant != "slot0"
W = marshal_slot(_slot_subtree(params, slot_i, cfg), cfg.num_blocks)
if not has_inter:
    W.pop("inter", None)
res = [64, 32, 16, 8, 4, 8, 16, 32, 64]
fifos = [[jnp.ones((N, r, r, 32), jnp.bfloat16) for _ in range(L)]
         for r in res]
inter_fifo = [jnp.ones((N, H0, H0, 128), jnp.bfloat16)] if has_inter else []

def loss(y, W):
    y_out, hm, inter_out, out32s, stats = fused_slot_train(
        y, inter_fifo, fifos, W, cfg=cfg, L=L, has_inter=has_inter)
    t = jnp.sum(hm.astype(jnp.float32)**2)
    if variant != "last":
        t = (t + jnp.sum(y_out.astype(jnp.float32)**2)
             + sum(jnp.sum(o.astype(jnp.float32)**2) for o in out32s))
        if has_inter:
            t = t + jnp.sum(inter_out.astype(jnp.float32)**2)
    return t

gy = jax.jit(jax.grad(loss))(y, W)
print("CHILD_OK", float(jnp.sum(gy.astype(jnp.float32))))
"""


def run_one(variant: str) -> bool:
    src = CHILD % {"here": HERE, "variant": variant}
    r = subprocess.run([sys.executable, "-c", src], capture_output=True,
                       text=True, timeout=900)
    ok = r.returncode == 0 and "CHILD_OK" in r.stdout
    err = ""
    if not ok:
        for line in (r.stderr + r.stdout).splitlines():
            if "Mosaic failed" in line or "RESOURCE_EXHAUSTED" in line:
                err = line.strip()[:700]
                break
        if not err:
            err = "\n".join((r.stderr + r.stdout).splitlines()[-12:])
    print(f"{variant}: {'OK' if ok else 'FAIL ' + err}", flush=True)
    return ok


if __name__ == "__main__":
    for v in sys.argv[1:] or ["slot0", "last", "steady"]:
        run_one(v)
