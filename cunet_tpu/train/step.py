"""Jittable train / eval steps with mesh sharding.

The hot loop of ref:cu-net.py:147-206 (forward -> intermediate-supervision
MSE -> backward -> RMSprop step) as a single pure function, compiled once by
XLA and sharded over the ``(data, space)`` mesh. DataParallel's per-step
replicate/scatter/gather (ref:cu-net.py:59) has no analog: parameters stay
resident, gradients all-reduce over ICI inside the compiled step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import optax
from jax.sharding import Mesh

from cunet_tpu.config import ModelConfig
from cunet_tpu.models import apply_cu_net
from cunet_tpu.parallel import batch_sharding, replicated
from cunet_tpu.train.loss import intermediate_mse
from cunet_tpu.train.state import TrainState


def _default_apply(cfg: ModelConfig):
    def apply_fn(params, bn_state, image, *, train, rng=None):
        return apply_cu_net(params, bn_state, image, cfg=cfg, train=train, rng=rng)

    return apply_fn


def dense_unet_apply(cfg):
    """Adapter for the single-head naive dense U-Net (the baseline trained
    by ref:naive-dense-unet.py): wraps its single output as a 1-anchor list."""
    from cunet_tpu.models import apply_dense_unet

    def apply_fn(params, bn_state, image, *, train, rng=None):
        out, new_bn = apply_dense_unet(params, bn_state, image, cfg=cfg, train=train)
        return [out], new_bn

    return apply_fn


def train_step(
    state: TrainState,
    batch: dict,
    *,
    cfg: ModelConfig,
    tx: optax.GradientTransformation,
    rng: Optional[jax.Array] = None,
    apply_fn=None,
):
    """One optimization step. ``batch = {'image': NHWC, 'heatmap': NHWC}``.

    Returns (new_state, metrics) where metrics carries the scalar loss and
    the final-anchor heatmaps for on-host accuracy (ref:cu-net.py:191-196
    computes PCK on output[-1] every iteration). ``apply_fn`` overrides the
    model (defaults to the coupled U-Net).
    """
    if apply_fn is None:
        apply_fn = _default_apply(cfg)

    def loss_fn(params):
        step_rng = None if rng is None else jax.random.fold_in(rng, state.step)
        outs, new_bn = apply_fn(
            params, state.bn_state, batch["image"], train=True, rng=step_rng
        )
        loss = intermediate_mse(outs, batch["heatmap"])
        return loss, (new_bn, outs[-1])

    (loss, (new_bn, last_out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        bn_state=new_bn,
        opt_state=new_opt,
    )
    return new_state, {"loss": loss, "last_out": last_out}


def eval_step(params, bn_state, batch: dict, *, cfg: ModelConfig, apply_fn=None):
    """Validation forward: per-anchor losses + final heatmaps
    (ref:cu-net.py:234-238)."""
    if apply_fn is None:
        apply_fn = _default_apply(cfg)
    outs, _ = apply_fn(params, bn_state, batch["image"], train=False)
    loss = intermediate_mse(outs, batch["heatmap"])
    return {"loss": loss, "last_out": outs[-1]}


def make_sharded_train_step(
    mesh: Mesh, cfg: ModelConfig, tx: optax.GradientTransformation, *,
    donate: bool = True, apply_fn=None, rng: Optional[jax.Array] = None,
):
    """Compile ``train_step`` over a mesh: batch sharded (N over data, H over
    space), state replicated. XLA inserts the ICI all-reduce for grads and
    the halo exchanges for spatially-partitioned convs.

    When the fused Pallas train kernels are active (models.cu_net.
    fused_train_ok — the apply path is a tpu_custom_call GSPMD cannot
    partition), dispatches to the explicit shard_map + psum construction
    instead. Configs where the model itself falls back to lax (small
    widths) keep the GSPMD step so spatial meshes keep working."""
    from cunet_tpu.models.cu_net import fused_train_ok

    if fused_train_ok(cfg) and apply_fn is None:
        return make_shardmap_train_step(mesh, cfg, tx, donate=donate,
                                        rng=rng)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    fn = functools.partial(train_step, cfg=cfg, tx=tx, apply_fn=apply_fn,
                           rng=rng)
    return jax.jit(
        fn,
        in_shardings=(rep, {"image": bsh, "heatmap": bsh}),
        out_shardings=(rep, {"loss": rep, "last_out": bsh}),
        donate_argnums=(0,) if donate else (),
    )


def make_shardmap_train_step(
    mesh: Mesh, cfg: ModelConfig, tx: optax.GradientTransformation, *,
    donate: bool = True, apply_fn=None, rng: Optional[jax.Array] = None,
):
    """Data-parallel train step as an explicit shard_map: each device runs
    the full step on its batch shard (through the fused Pallas train
    kernels), then gradients / loss / BN state pmean over the data axis.

    This is the multi-chip construction for model paths GSPMD cannot
    partition (Pallas kernels are opaque custom-calls): collectives are
    explicit, so XLA never has to slice inside the kernel. Semantics match
    the GSPMD step exactly — ghost-BN normalization is already per-tile
    (cfg.bn_tile), and pmean of the per-shard tile-averaged running stats
    equals the global tile average. DataParallel analog: ref:cu-net.py:59.

    The ``space`` axis must be 1 — Pallas kernels do not exchange spatial
    halos across shards."""
    from jax.sharding import PartitionSpec as P

    from cunet_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS

    if mesh.shape.get(SPACE_AXIS, 1) != 1:
        raise ValueError(
            "the Pallas train path shards over data only; build the mesh "
            f"with sp=1 (got space={mesh.shape[SPACE_AXIS]})")
    if apply_fn is None:
        apply_fn = _default_apply(cfg)

    bspec = {"image": P(DATA_AXIS), "heatmap": P(DATA_AXIS)}

    def body(state, batch):
        def loss_fn(params):
            step_rng = None
            if rng is not None:
                # per-step fold (matches train_step) then per-shard fold so
                # each device's dropout masks decorrelate across its batch
                # shard
                step_rng = jax.random.fold_in(
                    jax.random.fold_in(rng, state.step),
                    jax.lax.axis_index(DATA_AXIS))
            outs, new_bn = apply_fn(
                params, state.bn_state, batch["image"], train=True,
                rng=step_rng)
            return intermediate_mse(outs, batch["heatmap"]), (new_bn, outs[-1])

        (loss, (new_bn, last_out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        pm = lambda t: jax.tree.map(
            lambda x: jax.lax.pmean(x, DATA_AXIS), t)
        grads = pm(grads)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        new_bn = pm(new_bn)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
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


def make_shardmap_eval_step(mesh: Mesh, cfg: ModelConfig, *, apply_fn=None):
    """Data-parallel EVAL as an explicit shard_map — the multi-chip serving
    construction for the Pallas inference kernels (tera/giga kernels are
    opaque tpu_custom_calls GSPMD cannot partition, same constraint as
    make_shardmap_train_step). Each device runs the full forward on its
    batch shard; the scalar loss pmeans over the data axis, heatmaps stay
    batch-sharded. Requires sp=1 (no spatial halos through the kernels)."""
    from jax.sharding import PartitionSpec as P

    from cunet_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS

    if mesh.shape.get(SPACE_AXIS, 1) != 1:
        raise ValueError(
            "the Pallas eval path shards over data only; build the mesh "
            f"with sp=1 (got space={mesh.shape[SPACE_AXIS]})")
    if apply_fn is None:
        apply_fn = _default_apply(cfg)

    bspec = {"image": P(DATA_AXIS), "heatmap": P(DATA_AXIS)}

    def body(params, bn_state, batch):
        outs, _ = apply_fn(params, bn_state, batch["image"], train=False)
        loss = jax.lax.pmean(
            intermediate_mse(outs, batch["heatmap"]), DATA_AXIS)
        return {"loss": loss, "last_out": outs[-1]}

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), bspec),
        out_specs={"loss": P(), "last_out": P(DATA_AXIS)},
        check_vma=False,
    )
    return jax.jit(mapped)


def make_sharded_eval_step(mesh: Mesh, cfg: ModelConfig):
    """Sharded validation/serving step. Pallas-kernel configs route through
    the explicit shard_map construction (GSPMD cannot partition the custom
    call); lax configs keep the GSPMD jit (spatial meshes supported)."""
    from cunet_tpu.models.cu_net import fused_eval_ok

    if fused_eval_ok(cfg):
        return make_shardmap_eval_step(mesh, cfg)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    fn = functools.partial(eval_step, cfg=cfg)
    return jax.jit(
        fn,
        in_shardings=(rep, rep, {"image": bsh, "heatmap": bsh}),
        out_shardings={"loss": rep, "last_out": bsh},
    )
