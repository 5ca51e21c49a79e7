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
    rng: Optional[jax.Array] = None,
):
    """Compile ``quant_train_step`` over a mesh, mirroring
    ``make_sharded_train_step``: batch sharded (N over data, H over space),
    state replicated, grads all-reduced over ICI. The reference's BIN/WIG
    trainers run under DataParallel (ref:cu-net-prev-version-wig.py:63); this
    is the quant path's equivalent, so ``--quantize`` honours ``--dp/--sp``.

    When the fused Pallas train kernels engage (models.cu_net.fused_train_ok
    — with quantization they run the QuanInput STE in-kernel), dispatch to
    the explicit shard_map + pmean construction: GSPMD cannot partition the
    tpu_custom_call."""
    from cunet_tpu.models.cu_net import fused_train_ok

    if fused_train_ok(cfg) and qcfg.enabled:
        return make_shardmap_quant_train_step(
            mesh, cfg, qcfg, tx, donate=donate, policy=policy, rng=rng)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    fn = functools.partial(quant_train_step, cfg=cfg, qcfg=qcfg, tx=tx,
                           policy=policy, rng=rng)
    return jax.jit(
        fn,
        in_shardings=(rep, {"image": bsh, "heatmap": bsh}),
        out_shardings=(rep, {"loss": rep, "last_out": bsh}),
        donate_argnums=(0,) if donate else (),
    )


def make_shardmap_quant_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    qcfg: QuantConfig,
    tx: optax.GradientTransformation,
    *,
    donate: bool = False,
    policy: str = "reference",
    rng: Optional[jax.Array] = None,
):
    """Quantized data-parallel step as an explicit shard_map (the quant twin
    of ``train.step.make_shardmap_train_step``): each device runs the full
    quantized step on its batch shard through the fused kernels, then
    grads / loss / BN state pmean over the data axis. ``space`` must be 1 —
    the Pallas kernels exchange no spatial halos."""
    from jax.sharding import PartitionSpec as P

    from cunet_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS

    if mesh.shape.get(SPACE_AXIS, 1) != 1:
        raise ValueError(
            "the Pallas quant train path shards over data only; build the "
            f"mesh with sp=1 (got space={mesh.shape[SPACE_AXIS]})")

    bspec = {"image": P(DATA_AXIS), "heatmap": P(DATA_AXIS)}

    def body(state, batch):
        pred = selected_conv_predicate(state.params, policy)
        masters = preprocess_masters(state.params, qcfg, pred)

        def loss_fn(params):
            qparams = quantize_params(params, qcfg, pred)
            step_rng = None
            if rng is not None:
                # per-step then per-shard fold so each device's dropout
                # masks decorrelate across its batch shard
                step_rng = jax.random.fold_in(
                    jax.random.fold_in(rng, state.step),
                    jax.lax.axis_index(DATA_AXIS))
            outs, new_bn = apply_cu_net(
                qparams, state.bn_state, batch["image"], cfg=cfg,
                train=True, quant=qcfg, rng=step_rng,
            )
            return intermediate_mse(outs, batch["heatmap"]), (new_bn, outs[-1])

        (loss, (new_bn, last_out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(masters)
        pm = lambda t: jax.tree.map(
            lambda x: jax.lax.pmean(x, DATA_AXIS), t)
        grads = pm(grads)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        new_bn = pm(new_bn)
        updates, new_opt = tx.update(grads, state.opt_state, masters)
        new_params = optax.apply_updates(masters, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, bn_state=new_bn,
            opt_state=new_opt)
        return new_state, {"loss": loss, "last_out": last_out}

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), bspec),
        out_specs=(P(), {"loss": P(), "last_out": P(DATA_AXIS)}),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


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
