"""Quantized (WAGE / BIN) training step.

The reference protocol per batch (ref:cu-net-prev-version-wig.py:153-214 and
SURVEY.md §3.3): quantization() -> forward (activations quantized inline) ->
backward -> restore() -> updateQuanGradWeight() -> optimizer.step(). Here the
whole protocol is one pure function: masters are preprocessed
(meancenter/clamp/round-bits_g), the loss differentiates through
``fake_quant_weight`` whose custom_vjp is the gradient correction, and the
optimizer steps on the masters.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import optax
from jax.sharding import Mesh

from cunet_tpu.config import ModelConfig, QuantConfig
from cunet_tpu.models import apply_cu_net
from cunet_tpu.parallel import batch_sharding, replicated
from cunet_tpu.quant import (
    preprocess_masters,
    quantize_params,
    selected_conv_predicate,
)
from cunet_tpu.train.loss import intermediate_mse
from cunet_tpu.train.state import TrainState


def quant_train_step(
    state: TrainState,
    batch: dict,
    *,
    cfg: ModelConfig,
    qcfg: QuantConfig,
    tx: optax.GradientTransformation,
    policy: str = "reference",
    rng: Optional[jax.Array] = None,
):
    """One quantized optimization step (pure; jit/pjit-able)."""
    pred = selected_conv_predicate(state.params, policy)
    masters = preprocess_masters(state.params, qcfg, pred)

    def loss_fn(params):
        qparams = quantize_params(params, qcfg, pred)
        step_rng = None if rng is None else jax.random.fold_in(rng, state.step)
        outs, new_bn = apply_cu_net(
            qparams, state.bn_state, batch["image"], cfg=cfg, train=True,
            rng=step_rng, quant=qcfg,
        )
        loss = intermediate_mse(outs, batch["heatmap"])
        return loss, (new_bn, outs[-1])

    (loss, (new_bn, last_out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        masters
    )
    updates, new_opt = tx.update(grads, state.opt_state, masters)
    new_params = optax.apply_updates(masters, updates)
    new_state = state.replace(
        step=state.step + 1, params=new_params, bn_state=new_bn, opt_state=new_opt
    )
    return new_state, {"loss": loss, "last_out": last_out}


def make_sharded_quant_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    qcfg: QuantConfig,
    tx: optax.GradientTransformation,
    *,
    donate: bool = False,
    policy: str = "reference",
):
    """Compile ``quant_train_step`` over a mesh, mirroring
    ``make_sharded_train_step``: batch sharded (N over data, H over space),
    state replicated, grads all-reduced over ICI. The reference's BIN/WIG
    trainers run under DataParallel (ref:cu-net-prev-version-wig.py:63); this
    is the quant path's equivalent, so ``--quantize`` honours ``--dp/--sp``."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    fn = functools.partial(quant_train_step, cfg=cfg, qcfg=qcfg, tx=tx, policy=policy)
    return jax.jit(
        fn,
        in_shardings=(rep, {"image": bsh, "heatmap": bsh}),
        out_shardings=(rep, {"loss": rep, "last_out": bsh}),
        donate_argnums=(0,) if donate else (),
    )


def quant_eval_params(params, qcfg: QuantConfig, policy: str = "reference"):
    """Validation-time weights: quantize once for the whole eval epoch
    (ref:cu-net-prev-version-wig.py:230,285)."""
    pred = selected_conv_predicate(params, policy)
    return quantize_params(preprocess_masters(params, qcfg, pred), qcfg, pred)


def quant_eval_step(params, bn_state, batch: dict, *, cfg: ModelConfig, qcfg: QuantConfig):
    """Eval forward with pre-quantized params (pass ``quant_eval_params``
    output) — activation quantizers stay active (ref WIG validate)."""
    outs, _ = apply_cu_net(
        params, bn_state, batch["image"], cfg=cfg, train=False, quant=qcfg
    )
    loss = intermediate_mse(outs, batch["heatmap"])
    return {"loss": loss, "last_out": outs[-1]}
