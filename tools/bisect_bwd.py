"""Dev-only: bisect the train-slot BWD kernel Mosaic failure at real dims.

Runs the real-dims backward jit in subprocesses with increasing
CUNET_TSBWD_STUB_AFTER (number of reverse-walk steps actually computed) and
reports the first step count that fails to compile.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys; sys.path.insert(0, %r)
import jax, jax.numpy as jnp
from cunet_tpu.config import ModelConfig
from cunet_tpu.models import init_cu_net
from cunet_tpu.models.cu_net import _slot_subtree
from cunet_tpu.kernels.train_slot import fused_slot_train, marshal_slot

cfg = ModelConfig(layer_num=8, order=1, class_num=16, loss_num=8,
                  compute_dtype="bfloat16", bn_tile=2, bn_dtype="compute")
params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
H0, N = 64, 8
y = jnp.ones((N, H0, H0, 128), jnp.bfloat16)
W = marshal_slot(_slot_subtree(params, 1, cfg), cfg.num_blocks)
res = [64, 32, 16, 8, 4, 8, 16, 32, 64]
fifos = [[jnp.ones((N, r, r, 32), jnp.bfloat16)] for r in res]
inter_fifo = [jnp.ones((N, H0, H0, 128), jnp.bfloat16)]

def loss(y, W):
    y_out, hm, inter_out, out32s, stats = fused_slot_train(
        y, inter_fifo, fifos, W, cfg=cfg, L=1, has_inter=True)
    return (jnp.sum(y_out.astype(jnp.float32)**2)
            + jnp.sum(hm.astype(jnp.float32)**2)
            + sum(jnp.sum(o.astype(jnp.float32)**2) for o in out32s))

gy = jax.jit(jax.grad(loss))(y, W)
print("CHILD_OK", float(jnp.sum(gy.astype(jnp.float32))))
""" % (HERE,)


def run_one(stub_after: int) -> bool:
    env = dict(os.environ)
    env["CUNET_TSBWD_STUB_AFTER"] = str(stub_after)
    r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=900)
    ok = r.returncode == 0 and "CHILD_OK" in r.stdout
    err = ""
    if not ok:
        for line in (r.stderr + r.stdout).splitlines():
            if "Mosaic failed" in line:
                err = line[line.index("Mosaic failed"):][:220]
                break
        if not err:
            err = "\n".join((r.stderr + r.stdout).splitlines()[-12:])
    print(f"stub_after={stub_after}: {'OK' if ok else 'FAIL ' + err}",
          flush=True)
    return ok


if __name__ == "__main__":
    for n in [int(a) for a in sys.argv[1:]] or [0, 1, 5, 9, 99]:
        run_one(n)
