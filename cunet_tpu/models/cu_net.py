"""Order-K coupled U-Net (CU-Net), TPU-native functional implementation.

Re-designed from the behavior of ref:models/cu_net.py (see SURVEY.md §2.1):
``layer_num`` (K) U-Nets share one set of per-position dense blocks, where
U-Net *i* uses layer slot *i* of every block; dense (DenseNet-style)
connections run inside each U-Net and across U-Nets, trimmed to the last
``order`` neighbors via per-block FIFOs.

Differences from the reference by design (TPU-first):

- **Functional**: parameters and BN running stats are explicit pytrees;
  the mutable ``saved_features`` FIFOs (ref:models/cu_net.py:115-144) become
  explicit carries of the Python loop over U-Net index ``i``. The loop is
  unrolled — per-``i`` weights differ and feature shapes grow until
  ``i == order`` — which XLA compiles into one static graph.
- **NHWC / bf16**: channels-last with fp32 accumulation on the MXU.
- **Memory**: ``jax.checkpoint`` remat policies replace both
  ``torch.utils.checkpoint`` (ref:models/cu_net.py:58-61) and the
  shared-storage cuDNN recompute (ref:models/cu_net_prev_version.py:520-599).
- The concat of the dense inputs is never materialized
  (cunet_tpu.ops.bottleneck).

Channel arithmetic (asserted in tests, from ref:models/cu_net.py:79-101):
dense layer ``i`` input = ``in_num + min(i, order) * growth``; adapter ``i``
input = ``in_num + (min(i, order)+1) * growth``; up-block adapters emit
``in_num // 2``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from cunet_tpu.config import ModelConfig
from cunet_tpu.ops import dropmask
from cunet_tpu.ops import (
    batch_norm,
    conv2d,
    dense_bottleneck,
    dense_bottleneck_infer_pallas,
    dense_bottleneck_remat,
    dense_bottleneck_train_pallas,
    init_bn,
    init_bn_state,
    init_conv,
    max_pool_2x2,
    relu,
    upsample_nearest_2x,
)

# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_bottleneck(key, cin: int, cout: int):
    """BN -> ReLU -> 1x1 conv unit (params, state)."""
    k1, k2 = jax.random.split(key)
    params = {
        "norm": init_bn(k1, cin),
        "conv": init_conv(k2, 1, 1, cin, cout),
    }
    return params, {"norm": init_bn_state(cin)}


def _init_dense_layer(key, cin: int, cfg: ModelConfig):
    """Dense layer: bottleneck (1x1 -> neck*growth) + BN/ReLU/3x3 (-> growth).

    ref:models/cu_net.py:38-48.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    bneck_p, bneck_s = _init_bottleneck(k1, cin, cfg.bottleneck_chan)
    params = {
        "bottleneck": bneck_p,
        "norm2": init_bn(k2, cfg.bottleneck_chan),
        "conv2": init_conv(k3, 3, 3, cfg.bottleneck_chan, cfg.growth_rate),
    }
    state = {
        "bottleneck": bneck_s,
        "norm2": init_bn_state(cfg.bottleneck_chan),
    }
    return params, state


def dense_block_channels(cfg: ModelConfig, in_num: int) -> List[Tuple[int, int]]:
    """(layer_in, adapter_in) channel counts per U-Net slot i.

    Mirrors ref:models/cu_net.py:79-101.
    """
    out = []
    for i in range(cfg.layer_num):
        link = min(i, cfg.order)
        out.append(
            (in_num + link * cfg.growth_rate, in_num + (link + 1) * cfg.growth_rate)
        )
    return out


def _init_dense_block(
    key, cfg: ModelConfig, in_num: int, *, requires_skip: bool, is_up: bool
):
    """One block position with K layer slots + K ahead (+K skip) adapters."""
    adapter_out = in_num // 2 if is_up else in_num
    layers_p, layers_s = [], []
    ahead_p, ahead_s = [], []
    skip_p, skip_s = [], []
    for i, (lin, ain) in enumerate(dense_block_channels(cfg, in_num)):
        kl, ka, ks = jax.random.split(jax.random.fold_in(key, i), 3)
        p, s = _init_dense_layer(kl, lin, cfg)
        layers_p.append(p)
        layers_s.append(s)
        p, s = _init_bottleneck(ka, ain, adapter_out)
        ahead_p.append(p)
        ahead_s.append(s)
        if requires_skip:
            p, s = _init_bottleneck(ks, ain, adapter_out)
            skip_p.append(p)
            skip_s.append(s)
    params = {"layers": layers_p, "adapters_ahead": ahead_p}
    state = {"layers": layers_s, "adapters_ahead": ahead_s}
    if requires_skip:
        params["adapters_skip"] = skip_p
        state["adapters_skip"] = skip_s
    return params, state


def _init_intermedia(key, cfg: ModelConfig, chan: int):
    """Cross-U-Net input coupling block (ref:models/cu_net.py:146-164).

    K-1 adapters; adapter j (serving U-Net i=j+1) input channels =
    ``chan + (min(j, order)+1) * chan`` capped at ``chan + order*chan``.
    """
    ad_p, ad_s = [], []
    for j in range(cfg.layer_num - 1):
        # j < order -> chan+(j+1)*chan, else chan+order*chan (ref :156-160)
        cin = chan + (min(j, cfg.order - 1) + 1) * chan if cfg.order > 0 else chan
        p, s = _init_bottleneck(jax.random.fold_in(key, j), cin, chan)
        ad_p.append(p)
        ad_s.append(s)
    return {"adapters": ad_p}, {"adapters": ad_s}


def init_cu_net(key, cfg: ModelConfig):
    """Initialize (params, state) for the full CU-Net wrapper.

    Structure (ref:models/cu_net.py:271-334): stem conv7x7/s2 + BN + ReLU +
    maxpool; one shared hourglass of 4 down / 1 neck / 4 up block positions;
    K BN-ReLU-1x1 heads; K-1 intermedia adapters.
    """
    c = cfg.init_chan_num
    keys = jax.random.split(key, 12)
    params: Dict = {}
    state: Dict = {}
    params["stem"] = {
        "conv": init_conv(keys[0], 7, 7, 3, c),
        "norm": init_bn(keys[1], c),
    }
    state["stem"] = {"norm": init_bn_state(c)}

    down_p, down_s, up_p, up_s = [], [], [], []
    for b in range(cfg.num_blocks):
        p, s = _init_dense_block(
            jax.random.fold_in(keys[2], b), cfg, c, requires_skip=True, is_up=False
        )
        down_p.append(p)
        down_s.append(s)
        p, s = _init_dense_block(
            jax.random.fold_in(keys[3], b), cfg, 2 * c, requires_skip=False, is_up=True
        )
        up_p.append(p)
        up_s.append(s)
    neck_p, neck_s = _init_dense_block(
        keys[4], cfg, c, requires_skip=False, is_up=False
    )
    params["hg"] = {"down": down_p, "neck": neck_p, "up": up_p}
    state["hg"] = {"down": down_s, "neck": neck_s, "up": up_s}

    inter_p, inter_s = _init_intermedia(keys[5], cfg, c)
    params["intermedia"] = inter_p
    state["intermedia"] = inter_s

    heads_p, heads_s = [], []
    for i in range(cfg.layer_num):
        p, s = _init_bottleneck(jax.random.fold_in(keys[6], i), c, cfg.class_num)
        heads_p.append(p)
        heads_s.append(s)
    params["heads"] = heads_p
    state["heads"] = heads_s
    return params, state


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _int8_bottleneck_infer(p, s, feats: Sequence[jnp.ndarray], quant):
    """BN(eval) -> ReLU -> quantize(bits_i) -> REAL int8 1x1 conv on the MXU.

    The reference only simulates low-bit inference with fp GEMMs on
    dequantized values (ref:utils/quantize.py:127-149); here the binarized
    {-1, 0, +1} weights (already materialized by ``quant_eval_params``) run
    as int8 with int32 accumulation — exact integer arithmetic, so this
    matches the float simulation bit-for-bit (asserted in tests)."""
    from cunet_tpu.kernels.quant_matmul import (
        int8_matmul_dequant,
        quantize_activations_i8,
    )
    from cunet_tpu.ops.layers import bn_inference_scale_shift

    inv, shift = bn_inference_scale_shift(p["norm"], s)
    x = jnp.concatenate(list(feats), axis=-1)
    y = relu(x.astype(jnp.float32) * inv + shift)
    y_i8, x_scale = quantize_activations_i8(y, quant.bits_i)
    w2 = p["conv"][0, 0]  # (K, Cout), values in {-1, 0, +1}
    cout = w2.shape[1]
    if quant.int8_impl == "lax":
        out = (
            jax.lax.dot_general(
                y_i8.reshape(-1, w2.shape[0]).astype(jnp.float32),
                w2.astype(jnp.float32),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) * x_scale
        )
    else:
        out = int8_matmul_dequant(
            y_i8.reshape(-1, w2.shape[0]),
            jnp.round(w2).astype(jnp.int8),
            jnp.ones((cout,), jnp.float32),
            x_scale,
        )
    return out.reshape(*x.shape[:-1], cout).astype(x.dtype)


def _bn_nd(cfg):
    """BN normalize dtype per config (None = fp32 torch parity)."""
    return jnp.dtype(cfg.compute_dtype) if cfg.bn_dtype == "compute" else None


def _mosaic_ok(cfg) -> bool:
    """Whether the fused Pallas kernels can Mosaic-compile for this config.

    Tiny debug channel widths (init_chan_num < 128, below one lane tile)
    hit "infer-vector-layout: unsupported shape cast" in the in-kernel
    pool/upsample reshapes on real TPU; the flagship configs (c=128) are
    fine. Interpret mode on CPU (how the tests exercise the kernels) has
    no such limit. use_pallas on unsupported configs silently takes the
    lax path (the CLI prints a note)."""
    return cfg.init_chan_num >= 128 or jax.default_backend() == "cpu"


def fused_train_ok(cfg) -> bool:
    """Whether training dispatches to the fused whole-slot Pallas train
    kernels. Mirrored by ``train.step.make_sharded_train_step`` so configs
    that fall back to the lax path (small widths) keep the GSPMD step
    instead of the shard_map construction (which forbids spatial meshes).
    Dropout runs THROUGH the kernels: precomputed scaled masks are threaded
    as extra kernel inputs (the reference's dense-layer dropout keeps its
    memory-efficient runtime too, ref:models/cu_net.py:63-64)."""
    return cfg.use_pallas and cfg.bn_tile > 0 and _mosaic_ok(cfg)


def fused_eval_ok(cfg) -> bool:
    """Whether an UNQUANTIZED eval forward dispatches to the fused Pallas
    eval kernels (whole-model tera-kernel or per-hourglass). Mirrored by
    ``train.step.make_sharded_eval_step`` so configs whose eval actually
    takes the lax path keep the GSPMD jit (which supports spatial meshes)
    instead of the data-only shard_map construction."""
    return (cfg.use_pallas
            and (cfg.pallas_whole_model or cfg.pallas_hourglass)
            and _mosaic_ok(cfg))


def quant_kernel_bits(quant) -> int:
    """bits_i for the fused train kernels; 0 = no activation quantization.

    Every enabled QuantConfig runs in the kernels: weight quantization is a
    pytree transform OUTSIDE the model (quant.transforms.quantize_params,
    differentiated through its fake-quant custom VJP), so the kernels only
    add the two QuanInput STE insertion points
    (ref:models/cu_net_prev_version_wig.py:96-100, 277-281)."""
    if quant is None or not quant.enabled:
        return 0
    return int(quant.bits_i)


def _apply_bottleneck(params, state, feats: Sequence[jnp.ndarray], *, cfg, train,
                      quant=None):
    """BN->ReLU->1x1 over a virtual concat, with remat per config."""
    p = {"norm": params["norm"], "conv": params["conv"]}
    s = state["norm"]
    if (not train) and quant is not None and quant.enabled and quant.int8_infer:
        return _int8_bottleneck_infer(p, s, feats, quant), {"norm": s}
    if train and cfg.use_pallas and not cfg.bn_tile and _mosaic_ok(cfg):
        # fused train kernel: O(1) residuals, recompute backward (subsumes
        # the remat=bottleneck policy); ghost-BN (bn_tile) goes through the
        # lax path or the whole-slot train kernel instead
        out, new_s = dense_bottleneck_train_pallas(list(feats), p, s)
    elif train and cfg.remat == "bottleneck":
        out, new_s = dense_bottleneck_remat(list(feats), p, s, train=train,
                                            norm_dtype=_bn_nd(cfg),
                                            tile=cfg.bn_tile)
    elif not train and cfg.use_pallas and _mosaic_ok(cfg):
        out, new_s = dense_bottleneck_infer_pallas(list(feats), p, s)
    else:
        out, new_s = dense_bottleneck(list(feats), p, s, train=train,
                                      norm_dtype=_bn_nd(cfg),
                                      tile=cfg.bn_tile)
    return out, {"norm": new_s}


def _apply_dense_layer(
    params, state, feats: Sequence[jnp.ndarray], *, cfg, train, rng=None, quant=None
):
    """Bottleneck 1x1 then BN->ReLU->3x3 conv (ref:models/cu_net.py:52-65).

    When ``quant`` is active with bits_i <= 15, activations are quantized
    between the ReLU and the 3x3 conv — the WIG model's first insertion
    point (ref:models/cu_net_prev_version_wig.py:96-100).
    """
    def inner(params, state, feats):
        b, bs = _apply_bottleneck(
            params["bottleneck"], state["bottleneck"], feats, cfg=cfg, train=train,
            quant=quant,
        )
        y, ns2 = batch_norm(b, params["norm2"], state["norm2"], train=train,
                            norm_dtype=_bn_nd(cfg), tile=cfg.bn_tile)
        y = relu(y)
        if quant is not None and quant.enabled and quant.bits_i <= 15:
            from cunet_tpu.quant.wage import quan_input

            y = quan_input(y, quant.bits_i)
        if cfg.conv3x3_impl == "scatter":
            from cunet_tpu.ops.layers import conv3x3_scatter

            y = conv3x3_scatter(y, params["conv2"])
        else:
            y = conv2d(y, params["conv2"], stride=1, padding=1)
        return y, {"bottleneck": bs, "norm2": ns2}

    if train and cfg.remat == "layer":
        y, new_state = jax.checkpoint(inner)(params, state, list(feats))
    else:
        y, new_state = inner(params, state, list(feats))
    if cfg.drop_rate > 0 and train:
        assert rng is not None, "drop_rate > 0 requires an rng"
        y = y * _dropout_mask(rng, y.shape, cfg.drop_rate, y.dtype,
                              cfg.bn_tile)
    return y, new_state


def _dropout_mask(rng, shape, rate, dtype, bn_tile=0):
    """Scaled dropout mask with values {0, 1/keep} in the compute dtype
    (torch F.dropout multiply semantics, ref:models/cu_net.py:63-64). The
    SAME helper feeds the lax path and the fused train kernels' mask inputs,
    so fused-vs-lax grad parity holds bit-for-bit under dropout.

    ``rng`` is either a JAX PRNG key (drop_impl="masks": threefry bernoulli)
    or a ``("prng", seed, pos)`` handle (drop_impl="prng"): the mask comes
    from the counter-hash generator the fused kernels run in-kernel
    (ops/dropmask.py), reproduced here tile-by-tile (``bn_tile`` = the
    kernels' grid tile) so fused and lax stay bit-identical."""
    if isinstance(rng, tuple) and rng[0] == "prng":
        return dropmask.batch_mask(rng[1], rng[2], shape, bn_tile, rate,
                                   dtype)
    keep = 1.0 - rate
    m = jax.random.bernoulli(rng, keep, shape)
    return (m.astype(jnp.float32) * (1.0 / keep)).astype(dtype)


def _drop_handles(rng, cfg, train):
    """Per-block dropout rng handles for one slot, keyed the way each path
    needs: drop_impl="prng" mixes the traversal POSITION into the handle
    (down j -> j, neck -> nb, up j -> 2nb - j — the fused kernels' indexing);
    "masks" keeps the reference fold_in chain (j / 100 / 200+j)."""
    nb = cfg.num_blocks
    if rng is None or cfg.drop_rate <= 0 or not train:
        fold = lambda tag, pos: (None if rng is None
                                 else jax.random.fold_in(rng, tag))
    elif cfg.drop_impl == "prng":
        seed = dropmask.derive_seed(rng)
        fold = lambda tag, pos: ("prng", seed, pos)
    else:
        fold = lambda tag, pos: jax.random.fold_in(rng, tag)
    down = [fold(j, j) for j in range(nb)]
    neck = fold(100, nb)
    up = {j: fold(200 + j, 2 * nb - j) for j in range(nb)}
    return down, neck, up




def _apply_dual_adapters(p_a, s_a, p_s, s_s, feats, *, cfg, train, quant=None):
    """Ahead + skip adapters over the same feature list. In Pallas eval mode
    both run in ONE fused kernel sharing input reads."""
    if not train and cfg.use_pallas:
        from cunet_tpu.kernels.fused_bottleneck import fused_dual_bottleneck_infer
        from cunet_tpu.ops.layers import bn_inference_scale_shift

        inv_a, sh_a = bn_inference_scale_shift(p_a["norm"], s_a["norm"])
        inv_s, sh_s = bn_inference_scale_shift(p_s["norm"], s_s["norm"])
        a, sk = fused_dual_bottleneck_infer(
            list(feats), inv_a, sh_a, p_a["conv"], inv_s, sh_s, p_s["conv"]
        )
        return (a, sk), (s_a, s_s)
    a, ns_a = _apply_bottleneck(p_a, s_a, feats, cfg=cfg, train=train, quant=quant)
    sk, ns_s = _apply_bottleneck(p_s, s_s, feats, cfg=cfg, train=train, quant=quant)
    return (a, sk), (ns_a, ns_s)


def _fifo_push(fifo: List, out, i: int, order: int) -> List:
    """FIFO update rule of ref:models/cu_net.py:133-137."""
    if i < order:
        return fifo + [out]
    if fifo:
        return fifo[1:] + [out]
    return fifo


def _apply_dense_block(
    params,
    state,
    feats: Sequence[jnp.ndarray],
    i: int,
    fifo: List,
    *,
    cfg,
    train,
    requires_skip: bool,
    rng=None,
    quant=None,
):
    """One dense-block position at U-Net slot ``i`` (ref:models/cu_net.py:115-144).

    Returns ``(ahead[, skip]), new_fifo, new_state_updates`` where
    state updates are {index: subtree} patches for slot ``i``.
    """
    x = list(feats) + list(fifo)
    out, layer_s = _apply_dense_layer(
        params["layers"][i], state["layers"][i], x, cfg=cfg, train=train, rng=rng,
        quant=quant,
    )
    new_fifo = _fifo_push(fifo, out, i, cfg.order)
    x = x + [out]
    if requires_skip:
        (ahead, skip), (ahead_s, skip_s) = _apply_dual_adapters(
            params["adapters_ahead"][i], state["adapters_ahead"][i],
            params["adapters_skip"][i], state["adapters_skip"][i],
            x, cfg=cfg, train=train, quant=quant,
        )
        patches = {"layers": {i: layer_s}, "adapters_ahead": {i: ahead_s},
                   "adapters_skip": {i: skip_s}}
        return (ahead, skip), new_fifo, patches
    ahead, ahead_s = _apply_bottleneck(
        params["adapters_ahead"][i], state["adapters_ahead"][i], x, cfg=cfg,
        train=train, quant=quant,
    )
    patches = {"layers": {i: layer_s}, "adapters_ahead": {i: ahead_s}}
    return (ahead, None), new_fifo, patches


def _merge_block_patches(state_block, patches):
    new = dict(state_block)
    for name, idx_map in patches.items():
        lst = list(new[name])
        for i, sub in idx_map.items():
            lst[i] = sub
        new[name] = lst
    return new


def empty_fifos(cfg: ModelConfig) -> Dict:
    return {
        "down": [[] for _ in range(cfg.num_blocks)],
        "neck": [],
        "up": [[] for _ in range(cfg.num_blocks)],
        "intermedia": [],
    }


def _apply_hourglass(
    params, state, x, i: int, fifos: Dict, *, cfg, train, rng=None, quant=None
):
    """4x (down-block -> maxpool), neck, 4x (upsample -> up-block).

    ref:models/cu_net.py:252-269. Returns (x, new_state, fifos).
    """
    new_state = {"down": list(state["down"]), "up": list(state["up"])}
    skips = []
    r_down, r_neck, r_up = _drop_handles(rng, cfg, train)
    for j in range(cfg.num_blocks):
        (x, skip), fifos["down"][j], patch = _apply_dense_block(
            params["down"][j], state["down"][j], [x], i, fifos["down"][j],
            cfg=cfg, train=train, requires_skip=True, rng=r_down[j],
            quant=quant,
        )
        new_state["down"][j] = _merge_block_patches(state["down"][j], patch)
        skips.append(skip)
        x = max_pool_2x2(x)
    (x, _), fifos["neck"], patch = _apply_dense_block(
        params["neck"], state["neck"], [x], i, fifos["neck"],
        cfg=cfg, train=train, requires_skip=False, rng=r_neck, quant=quant,
    )
    new_state["neck"] = _merge_block_patches(state["neck"], patch)
    for j in reversed(range(cfg.num_blocks)):
        x = upsample_nearest_2x(x)
        (x, _), fifos["up"][j], patch = _apply_dense_block(
            params["up"][j], state["up"][j], [x, skips[j]], i, fifos["up"][j],
            cfg=cfg, train=train, requires_skip=False, rng=r_up[j],
            quant=quant,
        )
        new_state["up"][j] = _merge_block_patches(state["up"][j], patch)
    return x, new_state, fifos


def _apply_intermedia(params, state, x, i: int, fifo: List, *, cfg, train):
    """Cross-U-Net input adapter (ref:models/cu_net.py:166-190).

    i == 0: identity, seeds the FIFO. i > 0: adapter over [x] + FIFO.
    """
    if i == 0:
        if cfg.order != 0:
            fifo = fifo + [x]
        return x, state, fifo
    feats = [x] + list(fifo)
    out, ad_s = _apply_bottleneck(
        params["adapters"][i - 1], state["adapters"][i - 1], feats, cfg=cfg, train=train
    )
    new_state = {"adapters": list(state["adapters"])}
    new_state["adapters"][i - 1] = ad_s
    fifo = _fifo_push(fifo, out, i, cfg.order)
    return out, new_state, fifo


def _apply_head(params, state, y, *, train, quant=None, norm_dtype=None,
                tile=0):
    """Head: BN -> ReLU [-> QuanInput] -> 1x1 conv -> class_num heatmaps
    (ref:models/cu_net.py:192-198; quantized insertion point No.2,
    ref:models/cu_net_prev_version_wig.py:277-281)."""
    z, ns = batch_norm(y, params["norm"], state["norm"], train=train,
                       norm_dtype=norm_dtype, tile=tile)
    z = relu(z)
    if quant is not None and quant.enabled and quant.bits_i <= 15:
        from cunet_tpu.quant.wage import quan_input

        z = quan_input(z, quant.bits_i)
    z = conv2d(z, params["conv"], stride=1, padding=0)
    return z, {"norm": ns}


# ---------------------------------------------------------------------------
# lax.scan over U-Net slots (steady state: i >= max(order, 1))
# ---------------------------------------------------------------------------
#
# Once i >= order every FIFO holds exactly `order` entries and every slot's
# tensor shapes are identical, so the per-slot weights can be stacked and the
# remaining slots run as ONE scanned body. This cuts traced-HLO size (and
# with it compile time) by ~K/(order+1)x for the K=8/K=16 flagships while
# computing exactly what the unrolled loop computes (asserted in tests).


def _slot_get(container, idx: int):
    """Slot ``idx`` of a per-slot container: a plain list (canonical
    storage), or a stacked dict {"prefix": [...], "steady": leading-S tree}
    (see ``stack_steady``)."""
    if isinstance(container, dict) and "steady" in container:
        pl_ = len(container["prefix"])
        if idx < 0:
            # canonical lists allow python negative indexing (slot 0's
            # unused intermedia placeholder reads adapters[-1])
            if container["steady"] is not None:
                return jax.tree_util.tree_map(lambda x: x[idx],
                                              container["steady"])
            return container["prefix"][idx]
        if idx < pl_:
            return container["prefix"][idx]
        return jax.tree_util.tree_map(lambda x: x[idx - pl_],
                                      container["steady"])
    return container[idx]


def is_stacked(tree) -> bool:
    """Whether ``tree`` (params or state) uses stacked steady-slot storage."""
    heads = tree.get("heads")
    return isinstance(heads, dict) and "steady" in heads


def _split_list(lst, prefix_len: int):
    prefix = list(lst[:prefix_len])
    steady = lst[prefix_len:]
    if steady:
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *steady)
    else:
        stacked = None
    return {"prefix": prefix, "steady": stacked}


def stack_steady(tree, cfg: ModelConfig):
    """Canonical per-slot-list pytree -> stacked runtime form.

    Slots >= ``start`` (the lax.scan steady-state range) are stored as ONE
    stacked array per leaf (leading dim S = layer_num - start), so the scan
    consumes them directly with zero per-step marshaling — the counterpart
    of removing the ~13 ms/step ``jnp.stack`` the canonical form costs
    (PARITY.md round-2 training table). Works on params and state alike.
    Checkpoints always store the canonical form (``unstack_steady`` before
    save), so on-disk naming is unchanged."""
    start = max(cfg.order, 1)
    out = {"stem": tree["stem"]}
    hg = {}
    for key in ("down", "up"):
        hg[key] = [{name: _split_list(blk[name], start) for name in blk}
                   for blk in tree["hg"][key]]
    hg["neck"] = {name: _split_list(tree["hg"]["neck"][name], start)
                  for name in tree["hg"]["neck"]}
    out["hg"] = hg
    # adapter j serves slot j+1 -> steady adapters start at index start-1
    out["intermedia"] = {
        "adapters": _split_list(tree["intermedia"]["adapters"], start - 1)
    }
    out["heads"] = _split_list(tree["heads"], start)
    return out


def _unsplit_list(container, total: int):
    prefix = list(container["prefix"])
    steady = container["steady"]
    s_len = total - len(prefix)
    tail = [jax.tree_util.tree_map(lambda x: x[j], steady)
            for j in range(s_len)]
    return prefix + tail


def unstack_steady(tree, cfg: ModelConfig):
    """Inverse of ``stack_steady`` (exact round-trip)."""
    start = max(cfg.order, 1)
    K = cfg.layer_num
    out = {"stem": tree["stem"]}
    hg = {}
    for key in ("down", "up"):
        hg[key] = [{name: _unsplit_list(blk[name], K) for name in blk}
                   for blk in tree["hg"][key]]
    hg["neck"] = {name: _unsplit_list(tree["hg"]["neck"][name], K)
                  for name in tree["hg"]["neck"]}
    out["hg"] = hg
    out["intermedia"] = {
        "adapters": _unsplit_list(tree["intermedia"]["adapters"], K - 1)
    }
    out["heads"] = _unsplit_list(tree["heads"], K)
    del start
    return out


def _slot_subtree(tree, i: int, cfg: ModelConfig):
    """Per-slot params/state view: slot i of every block position, the
    intermedia adapter serving slot i, and head i. Works on canonical and
    stacked storage (static ``i`` indexes the stacked arrays — XLA folds
    the slice)."""
    hg = {}
    for key in ("down", "up"):
        hg[key] = []
        for blk in tree["hg"][key]:
            hg[key].append({name: _slot_get(blk[name], i) for name in blk})
    hg["neck"] = {name: _slot_get(tree["hg"]["neck"][name], i)
                  for name in tree["hg"]["neck"]}
    return {
        "hg": hg,
        "inter": _slot_get(tree["intermedia"]["adapters"], i - 1),
        "head": _slot_get(tree["heads"], i),
    }


def _steady_xs(tree):
    """The scan xs for stacked storage: every steady part, already stacked
    in ``_slot_subtree`` shape (leading dim S)."""
    hg = {}
    for key in ("down", "up"):
        hg[key] = [{name: blk[name]["steady"] for name in blk}
                   for blk in tree["hg"][key]]
    hg["neck"] = {name: tree["hg"]["neck"][name]["steady"]
                  for name in tree["hg"]["neck"]}
    return {
        "hg": hg,
        "inter": tree["intermedia"]["adapters"]["steady"],
        "head": tree["heads"]["steady"],
    }


def _is_slot_container(t) -> bool:
    return isinstance(t, dict) and set(t.keys()) == {"prefix", "steady"}


def _rebuild_seq(t, vals):
    return type(t)(*vals) if hasattr(t, "_fields") else type(t)(vals)


def _is_dc(t) -> bool:
    import dataclasses
    return dataclasses.is_dataclass(t) and not isinstance(t, type)


def _map_dc(t, fn):
    import dataclasses
    return dataclasses.replace(
        t, **{f.name: fn(getattr(t, f.name)) for f in dataclasses.fields(t)})


def canonicalize_slots(tree):
    """Replace every stacked slot container anywhere in ``tree`` (params,
    state, optimizer state — any nesting of dicts/lists/namedtuples) with
    the canonical per-slot list. Checkpoints always store this form, so
    on-disk naming is identical for stacked and canonical runs."""
    if _is_slot_container(tree):
        out = [canonicalize_slots(p) for p in tree["prefix"]]
        steady = tree["steady"]
        if steady is not None:
            S = jax.tree_util.tree_leaves(steady)[0].shape[0]
            out += [jax.tree_util.tree_map(lambda x, j=j: x[j], steady)
                    for j in range(S)]
        return out
    if isinstance(tree, dict):
        return {k: canonicalize_slots(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return _rebuild_seq(tree, [canonicalize_slots(v) for v in tree])
    if _is_dc(tree):  # flax.struct TrainState, optax dataclass states
        return _map_dc(tree, canonicalize_slots)
    return tree


def stack_like(template, tree):
    """Re-stack a canonical ``tree`` into ``template``'s slot layout: at
    every stacked container site in the template, the corresponding
    canonical list is split at the template's prefix length and its tail
    stacked. Inverse of ``canonicalize_slots`` for matching structures."""
    if _is_slot_container(template):
        assert isinstance(tree, (list, tuple)), (
            f"expected per-slot list at stacked site, got {type(tree)}")
        return _split_list(list(tree), len(template["prefix"]))
    if isinstance(template, dict):
        return {k: stack_like(template[k], tree[k]) for k in template}
    if isinstance(template, (list, tuple)):
        return _rebuild_seq(
            template, [stack_like(t, v) for t, v in zip(template, tree)])
    if _is_dc(template):
        import dataclasses
        return dataclasses.replace(
            template,
            **{f.name: stack_like(getattr(template, f.name),
                                  getattr(tree, f.name))
               for f in dataclasses.fields(template)})
    return tree


def _prefix_view(tree):
    """Canonical-shaped view of a stacked tree's growth-phase (prefix)
    slots: per-slot lists of length ``start`` so the unrolled prefix loop
    (which indexes with ``[i]``, always ``i < start``) works unchanged."""
    out = {"stem": tree["stem"]}
    hg = {}
    for key in ("down", "up"):
        hg[key] = [{name: list(blk[name]["prefix"]) for name in blk}
                   for blk in tree["hg"][key]]
    hg["neck"] = {name: list(tree["hg"]["neck"][name]["prefix"])
                  for name in tree["hg"]["neck"]}
    out["hg"] = hg
    out["intermedia"] = {
        "adapters": list(tree["intermedia"]["adapters"]["prefix"])
    }
    out["heads"] = list(tree["heads"]["prefix"])
    return out


def _assemble_stacked_state(hg_prefix, inter_prefix, heads_prefix, old_state,
                            scanned, scan_range, anchors):
    """Rebuild the STACKED state tree after a forward: prefix lists come
    from the unrolled loop, steady parts are the scan's stacked outputs.
    Head state only updates at anchored slots (the reference never runs
    non-anchored heads) — non-anchored steady entries keep the old state."""
    hg = {}
    for key in ("down", "up"):
        hg[key] = [
            {name: {"prefix": list(blk_prefix[name]),
                    "steady": blk_scan[name]} for name in blk_prefix}
            for blk_prefix, blk_scan in zip(hg_prefix[key], scanned["hg"][key])
        ]
    hg["neck"] = {name: {"prefix": list(hg_prefix["neck"][name]),
                         "steady": scanned["hg"]["neck"][name]}
                  for name in hg_prefix["neck"]}
    inter = {"adapters": {"prefix": list(inter_prefix["adapters"]),
                          "steady": scanned["inter"]}}
    mask = jnp.asarray([(i + 1) in anchors for i in scan_range])
    old_steady = old_state["heads"]["steady"]
    head_steady = jax.tree_util.tree_map(
        lambda n, o: jnp.where(mask.reshape((-1,) + (1,) * (o.ndim - 1)),
                               n.astype(o.dtype), o),
        scanned["head"], old_steady)
    heads = {"prefix": list(heads_prefix), "steady": head_steady}
    return hg, inter, heads


def _stack_slots(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _scan_block(p, s, feats, fifo, *, cfg, train, requires_skip, rng, quant):
    """Steady-state dense block: FIFO pop+push (len == order)."""
    x = list(feats) + list(fifo)
    out, layer_s = _apply_dense_layer(
        p["layers"], s["layers"], x, cfg=cfg, train=train, rng=rng, quant=quant
    )
    new_fifo = tuple(fifo[1:]) + (out,) if cfg.order > 0 else fifo
    x = x + [out]
    if requires_skip:
        (ahead, skip), (ahead_s, skip_s) = _apply_dual_adapters(
            p["adapters_ahead"], s["adapters_ahead"],
            p["adapters_skip"], s["adapters_skip"], x, cfg=cfg, train=train,
            quant=quant,
        )
        new_s = {"layers": layer_s, "adapters_ahead": ahead_s,
                 "adapters_skip": skip_s}
        return (ahead, skip), new_fifo, new_s
    ahead, ahead_s = _apply_bottleneck(
        p["adapters_ahead"], s["adapters_ahead"], x, cfg=cfg, train=train,
        quant=quant,
    )
    new_s = {"layers": layer_s, "adapters_ahead": ahead_s}
    return (ahead, None), new_fifo, new_s




def _fold_bn_vec(bn_params, bn_state):
    """Eval-mode BN -> stacked (2, C) [inv; shift] for the fused kernels."""
    from cunet_tpu.ops.layers import bn_inference_scale_shift

    inv, sh = bn_inference_scale_shift(bn_params, bn_state)
    return jnp.stack([inv, sh])


def _fused_block_slot(
    p, s, feats, fifo, *, cfg, requires_skip, upsample_first, pool_ahead,
    pre=None, head=None,
):
    """Whole dense block in ONE Pallas launch (eval): bottleneck + 3x3 +
    adapters, with the hourglass's pool/upsample folded in. Optional fused
    stages: ``pre`` = (pre_features, p_inter, s_inter) intermedia adapter
    whose output becomes feature 0; ``head`` = (p_head, s_head). Returns
    (ahead[, skip], new_fifo, extras) where extras may hold 'pre_out'/'head'."""
    from cunet_tpu.kernels.fused_block import fused_dense_block_infer

    lp, ls = p["layers"], s["layers"]
    emit = cfg.order > 0
    args = dict(
        upsample_first=upsample_first,
        pool_ahead=pool_ahead,
        emit_layer_out=emit,
    )
    if pre is not None:
        pre_features, p_inter, s_inter = pre
        args.update(
            pre_features=list(pre_features),
            pre_vec=_fold_bn_vec(p_inter["norm"], s_inter["norm"]),
            pre_w=p_inter["conv"],
            emit_pre_out=cfg.order > 0,
        )
    if head is not None:
        p_head, s_head = head
        args.update(
            head_vec=_fold_bn_vec(p_head["norm"], s_head["norm"]),
            head_w=p_head["conv"],
        )
    common = (
        list(feats) + list(fifo),
        _fold_bn_vec(lp["bottleneck"]["norm"], ls["bottleneck"]["norm"]),
        lp["bottleneck"]["conv"],
        _fold_bn_vec(lp["norm2"], ls["norm2"]),
        lp["conv2"],
        _fold_bn_vec(p["adapters_ahead"]["norm"], s["adapters_ahead"]["norm"]),
        p["adapters_ahead"]["conv"],
    )
    if requires_skip:
        outs = fused_dense_block_infer(
            *common,
            _fold_bn_vec(p["adapters_skip"]["norm"], s["adapters_skip"]["norm"]),
            p["adapters_skip"]["conv"],
            **args,
        )
    else:
        outs = fused_dense_block_infer(*common, **args)
    outs = list(outs)
    ahead = outs.pop(0)
    skip = outs.pop(0) if requires_skip else None
    layer_out = outs.pop(0) if emit else None
    extras = {}
    if head is not None:
        extras["head"] = outs.pop(0)
    if pre is not None and cfg.order > 0:
        extras["pre_out"] = outs.pop(0)
    new_fifo = tuple(fifo[1:]) + (layer_out,) if emit else fifo
    return ahead, skip, new_fifo, extras




def _hg_wset(bp, bs, skip, fold_vec2=True):
    # BN2's scale folds into w_b's output columns (the producing 1x1 conv is
    # linear and y1 has a single consumer), so the kernels' vec2 stage is an
    # add+relu only — the MXU does the mul for free. The int8 kernel keeps
    # the full affine instead (its weights must stay {-1,0,+1}).
    vec2 = _fold_bn_vec(bp["layers"]["norm2"], bs["layers"]["norm2"])
    inv2 = vec2[0]
    w_b = bp["layers"]["bottleneck"]["conv"]
    if fold_vec2:
        w_b = w_b * inv2[None, None, None, :].astype(w_b.dtype)
        vec2 = jnp.stack([jnp.ones_like(inv2), vec2[1]])
    d = {
        "vec_b": _fold_bn_vec(bp["layers"]["bottleneck"]["norm"],
                              bs["layers"]["bottleneck"]["norm"]),
        "w_b": w_b,
        "vec2": vec2,
        "w3": bp["layers"]["conv2"],
        "vec_a": _fold_bn_vec(bp["adapters_ahead"]["norm"],
                              bs["adapters_ahead"]["norm"]),
        "w_a": bp["adapters_ahead"]["conv"],
    }
    if skip:
        d["vec_s"] = _fold_bn_vec(bp["adapters_skip"]["norm"],
                                  bs["adapters_skip"]["norm"])
        d["w_s"] = bp["adapters_skip"]["conv"]
    return d


def _fused_slot_eval_hg(p, s, y, f, *, cfg, slot_i=None):
    """One Pallas launch for the ENTIRE slot (intermedia + hourglass + head);
    see cunet_tpu.kernels.fused_hourglass. ``slot_i=None`` means steady state
    (scan body: full FIFOs, pop+push); an explicit slot index handles the
    unrolled prefix slots (i=0 has no intermedia; FIFOs append while
    i < order). Returns (y, new_fifos, head_out)."""
    from cunet_tpu.kernels.fused_hourglass import fused_hourglass_infer

    nb = cfg.num_blocks
    steady = slot_i is None
    has_inter = steady or slot_i > 0
    n_fifo = cfg.order if steady else min(slot_i, cfg.order)
    emit = cfg.order > 0
    grow = (not steady) and slot_i < cfg.order  # append vs pop+push

    block_fifos = (
        [list(f["down"][j]) for j in range(nb)]
        + [list(f["neck"])]
        + [list(f["up"][j]) for j in reversed(range(nb))]
    )
    block_wsets = (
        [_hg_wset(p["hg"]["down"][j], s["hg"]["down"][j], True) for j in range(nb)]
        + [_hg_wset(p["hg"]["neck"], s["hg"]["neck"], False)]
        + [_hg_wset(p["hg"]["up"][j], s["hg"]["up"][j], False)
           for j in reversed(range(nb))]
    )
    outs = fused_hourglass_infer(
        y,
        list(f["intermedia"]) if has_inter else [],
        _fold_bn_vec(p["inter"]["norm"], s["inter"]["norm"]) if has_inter else None,
        p["inter"]["conv"] if has_inter else None,
        block_fifos,
        block_wsets,
        _fold_bn_vec(p["head"]["norm"], s["head"]["norm"]),
        p["head"]["conv"],
        num_blocks=nb,
        n_fifo=n_fifo,
        emit_layer_out=emit,
    )
    y_out, hm = outs[0], outs[1]
    if not emit:
        return y_out, f, hm

    def push(fifo, out):
        return tuple(fifo) + (out,) if grow else tuple(fifo[1:]) + (out,)

    k = 2
    if has_inter:
        pre_out = outs[k]; k += 1
        new_inter = push(f["intermedia"], pre_out)
    else:
        # i == 0: intermedia is identity; the FIFO seeds with the stem
        # output itself (ref:models/cu_net.py:169-171)
        new_inter = tuple(f["intermedia"]) + (y,)
    louts = outs[k:]
    new_f = {
        "intermedia": new_inter,
        "down": tuple(push(f["down"][j], louts[j]) for j in range(nb)),
        "neck": push(f["neck"], louts[nb]),
    }
    new_up = [None] * nb
    for kk, j in enumerate(reversed(range(nb))):
        new_up[j] = push(f["up"][j], louts[nb + 1 + kk])
    new_f["up"] = tuple(new_up)
    return y_out, new_f, hm


def _slot_state_from_stats(s, stats, cfg, h0, has_inter):
    """Updated slot-state subtree from the train kernel's per-tile stats.

    ``stats`` are (T, 2, C) fp32 arrays in kernel emission order
    ([inter] + per position (bn1, bn2, bn_a[, bn_s]) + head); running stats
    update with the tile-averaged mean and tile-averaged unbiased variance
    (the bn_tile ghost-BN rule, see ops.layers.batch_norm).
    """
    from cunet_tpu.ops.layers import BN_MOMENTUM

    bt = cfg.bn_tile
    it = iter(stats)

    def upd(old_norm, res):
        st = next(it)
        cnt = bt * res * res
        mean = jnp.mean(st[:, 0], axis=0)
        var_u = jnp.mean(st[:, 1] * (cnt / max(cnt - 1, 1)), axis=0)
        return {
            "mean": (1 - BN_MOMENTUM) * old_norm["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * old_norm["var"] + BN_MOMENTUM * var_u,
        }

    nb = cfg.num_blocks
    new = {"hg": {"down": [], "neck": None, "up": [None] * nb}}
    if has_inter:
        new["inter"] = {"norm": upd(s["inter"]["norm"], h0)}
    else:
        new["inter"] = s["inter"]

    def block_state(bs, res, skip):
        d = {
            "layers": {
                "bottleneck": {"norm": upd(bs["layers"]["bottleneck"]["norm"],
                                           res)},
                "norm2": upd(bs["layers"]["norm2"], res),
            },
            "adapters_ahead": {"norm": upd(bs["adapters_ahead"]["norm"], res)},
        }
        if skip:
            d["adapters_skip"] = {"norm": upd(bs["adapters_skip"]["norm"],
                                              res)}
        return d

    res = h0
    for j in range(nb):
        new["hg"]["down"].append(block_state(s["hg"]["down"][j], res, True))
        res //= 2
    new["hg"]["neck"] = block_state(s["hg"]["neck"], res, False)
    for idx, j in enumerate(reversed(range(nb))):
        res *= 2
        new["hg"]["up"][j] = block_state(s["hg"]["up"][j], res, False)
    new["head"] = {"norm": upd(s["head"]["norm"], h0)}
    try:
        next(it)
        raise AssertionError("unconsumed stats")
    except StopIteration:
        pass
    return new


def _fused_slot_train(p, s, y, f, *, cfg, slot_i=None, bits_i=0, rng=None):
    """One fused train slot: forward kernel + custom-VJP backward kernel
    (cunet_tpu.kernels.train_slot). ``slot_i=None`` = steady state.
    ``bits_i`` > 0 = WIG activation quantizers inside the kernels.
    ``rng`` = this slot's dropout key (required when cfg.drop_rate > 0):
    masks are drawn OUTSIDE the kernel with the exact fold_in chain the lax
    path uses (down j -> fold(r, j), neck -> fold(r, 100), up j ->
    fold(r, 200 + j)), so fused and lax dropout are bit-identical.

    Returns (y_out, new_fifos, head_out, new_slot_state)."""
    from cunet_tpu.kernels.train_slot import fused_slot_train, marshal_slot

    nb = cfg.num_blocks
    steady = slot_i is None
    has_inter = steady or slot_i > 0
    L = cfg.order if steady else min(slot_i, cfg.order)
    grow = (not steady) and slot_i < cfg.order
    assert y.shape[0] % cfg.bn_tile == 0, (
        f"batch {y.shape[0]} not divisible by bn_tile {cfg.bn_tile}")

    masks = drop_seed = None
    if cfg.drop_rate > 0:
        assert rng is not None, "drop_rate > 0 requires an rng"
        if cfg.drop_impl == "prng":
            # in-kernel counter-hash masks: the kernels (fwd + recompute
            # bwd) generate identical bits from this one int32 seed — no
            # HBM mask stream, no host threefry cost (ops/dropmask.py)
            drop_seed = dropmask.derive_seed(rng)
        else:
            n, h0 = y.shape[0], y.shape[1]
            g = cfg.growth_rate

            def mk(key, res):
                return _dropout_mask(key, (n, res, res, g), cfg.drop_rate,
                                     jnp.dtype(cfg.compute_dtype))

            res_of = [h0 // (2 ** j) for j in range(nb + 1)]
            masks = [mk(jax.random.fold_in(rng, j), res_of[j])
                     for j in range(nb)]
            masks.append(mk(jax.random.fold_in(rng, 100), res_of[nb]))
            for idx, j in enumerate(reversed(range(nb))):
                masks.append(mk(jax.random.fold_in(rng, 200 + j),
                                res_of[nb - 1 - idx]))

    W = marshal_slot(p, nb)
    if not has_inter:
        W.pop("inter", None)
    fifos_t = (
        [list(f["down"][j]) for j in range(nb)]
        + [list(f["neck"])]
        + [list(f["up"][j]) for j in reversed(range(nb))]
    )
    y_out, hm, inter_out, out32s, stats = fused_slot_train(
        y, list(f["intermedia"]) if has_inter else [], fifos_t, W,
        cfg=cfg, L=L, has_inter=has_inter, bits_i=bits_i, masks=masks,
        drop_seed=drop_seed,
    )

    new_ss = _slot_state_from_stats(s, list(stats), cfg, y.shape[1], has_inter)

    if cfg.order == 0:
        new_f = f
    else:
        def push(fifo, out):
            return tuple(fifo) + (out,) if grow else tuple(fifo[1:]) + (out,)

        if has_inter:
            new_inter = push(f["intermedia"], inter_out)
        else:
            new_inter = tuple(f["intermedia"]) + (y,)
        new_up = [None] * nb
        for idx, j in enumerate(reversed(range(nb))):
            new_up[j] = push(f["up"][j], out32s[nb + 1 + idx])
        new_f = {
            "intermedia": new_inter,
            "down": tuple(push(f["down"][j], out32s[j]) for j in range(nb)),
            "neck": push(f["neck"], out32s[nb]),
            "up": tuple(new_up),
        }
    return y_out, new_f, hm, new_ss


def _fused_slot_eval(p, s, y, f, *, cfg):
    """One fully-fused eval slot: intermedia rides the first down block as a
    pre-stage, the head rides the last up block as a post-stage; every block
    is one launch with pool/upsample folded. Returns
    (y, new_fifos_dict, head_out)."""
    f_down, f_up = list(f["down"]), list(f["up"])
    skips = []
    inter_fifo = f["intermedia"]
    for j in range(cfg.num_blocks):
        pre = ([y] + list(inter_fifo), p["inter"], s["inter"]) if j == 0 else None
        y_in = [y]
        y, skip, f_down[j], ex = _fused_block_slot(
            p["hg"]["down"][j], s["hg"]["down"][j], y_in, f_down[j],
            cfg=cfg, requires_skip=True, upsample_first=False, pool_ahead=True,
            pre=pre,
        )
        if j == 0 and cfg.order > 0:
            inter_fifo = tuple(inter_fifo[1:]) + (ex["pre_out"],)
        skips.append(skip)
    y, _, f_neck, _ = _fused_block_slot(
        p["hg"]["neck"], s["hg"]["neck"], [y], f["neck"],
        cfg=cfg, requires_skip=False, upsample_first=False, pool_ahead=False,
    )
    hm = None
    for j in reversed(range(cfg.num_blocks)):
        head = (p["head"], s["head"]) if j == 0 else None
        y, _, f_up[j], ex = _fused_block_slot(
            p["hg"]["up"][j], s["hg"]["up"][j], [y, skips[j]], f_up[j],
            cfg=cfg, requires_skip=False, upsample_first=True, pool_ahead=False,
            head=head,
        )
        if j == 0:
            hm = ex["head"]
    new_f = {"down": tuple(f_down), "neck": f_neck, "up": tuple(f_up),
             "intermedia": inter_fifo}
    return y, new_f, hm


def _apply_slots_scanned(
    params, state, y, fifos, scan_range, *, cfg, train, rng, quant
):
    """Run slots ``scan_range`` (all in FIFO steady state) under lax.scan.

    Returns (y, fifos, stacked_head_outs, stacked_new_states).
    """
    if is_stacked(params):
        # natively stacked steady slots: the scan consumes the param/state
        # leaves directly — no per-step jnp.stack marshaling
        xs_params = _steady_xs(params)
        xs_state = _steady_xs(state)
    else:
        xs_params = _stack_slots(
            [_slot_subtree(params, i, cfg) for i in scan_range])
        xs_state = _stack_slots(
            [_slot_subtree(state, i, cfg) for i in scan_range])
    if rng is None:
        xs_rng = jnp.zeros((len(scan_range), 2), jnp.uint32)
    else:
        xs_rng = jnp.stack([jax.random.fold_in(rng, i) for i in scan_range])

    # tuple-ize fifos so the carry structure is static
    carry_fifos = {
        "down": tuple(tuple(f) for f in fifos["down"]),
        "neck": tuple(fifos["neck"]),
        "up": tuple(tuple(f) for f in fifos["up"]),
        "intermedia": tuple(fifos["intermedia"]),
    }

    def body(carry, xs):
        y, f = carry
        p, s, rk = xs
        r = rk if rng is not None else None

        if train and fused_train_ok(cfg):
            # whole-slot fused TRAIN kernels (fwd + custom-VJP bwd);
            # dropout masks are drawn from this slot's key r
            y, new_f, hm, new_ss = _fused_slot_train(
                p, s, y, f, cfg=cfg, bits_i=quant_kernel_bits(quant),
                rng=r)
            return (y, new_f), {"state": new_ss, "head_out": hm}

        if (not train) and cfg.use_pallas and quant is None \
                and _mosaic_ok(cfg):
            # fully-fused slot: one launch for the whole hourglass when
            # pallas_hourglass, else one launch per block
            if cfg.pallas_hourglass:
                y, new_f, hm = _fused_slot_eval_hg(p, s, y, f, cfg=cfg)
            else:
                y, new_f, hm = _fused_slot_eval(p, s, y, f, cfg=cfg)
            ys = {
                "state": {"hg": {"down": list(s["hg"]["down"]),
                                 "neck": s["hg"]["neck"],
                                 "up": list(s["hg"]["up"])},
                          "inter": s["inter"], "head": s["head"]},
                "head_out": hm,
            }
            return (y, new_f), ys

        # intermedia (steady state: i >= 1 and fifo full)
        feats = [y] + list(f["intermedia"])
        y2, inter_s = _apply_bottleneck(
            p["inter"], s["inter"], feats, cfg=cfg, train=train
        )
        f_inter = tuple(f["intermedia"][1:]) + (y2,) if cfg.order > 0 else f["intermedia"]

        # hourglass
        y = y2
        new_down, new_up = [], []
        f_down, f_up = list(f["down"]), list(f["up"])
        skips = []
        r_down, r_neck, r_up = _drop_handles(r, cfg, train)
        for j in range(cfg.num_blocks):
            (y, skip), f_down[j], s_blk = _scan_block(
                p["hg"]["down"][j], s["hg"]["down"][j], [y], f_down[j],
                cfg=cfg, train=train, requires_skip=True, rng=r_down[j],
                quant=quant,
            )
            new_down.append(s_blk)
            skips.append(skip)
            y = max_pool_2x2(y)
        (y, _), f_neck, s_neck = _scan_block(
            p["hg"]["neck"], s["hg"]["neck"], [y], f["neck"],
            cfg=cfg, train=train, requires_skip=False, rng=r_neck,
            quant=quant,
        )
        for j in reversed(range(cfg.num_blocks)):
            y = upsample_nearest_2x(y)
            (y, _), f_up[j], s_blk = _scan_block(
                p["hg"]["up"][j], s["hg"]["up"][j], [y, skips[j]], f_up[j],
                cfg=cfg, train=train, requires_skip=False, rng=r_up[j],
                quant=quant,
            )
            new_up.append(s_blk)
        new_up = list(reversed(new_up))

        hm, head_s = _apply_head(p["head"], s["head"], y, train=train,
                                 quant=quant, norm_dtype=_bn_nd(cfg),
                                 tile=cfg.bn_tile)

        new_f = {"down": tuple(f_down), "neck": f_neck, "up": tuple(f_up),
                 "intermedia": f_inter}
        ys = {
            "state": {"hg": {"down": new_down, "neck": s_neck, "up": new_up},
                      "inter": inter_s, "head": head_s},
            "head_out": hm,
        }
        return (y, new_f), ys

    def wrapped(carry, xs):
        return body(carry, xs)

    if train and cfg.remat == "block":
        wrapped = jax.checkpoint(body)

    # partial unroll duplicates the scan body (compile cost ~xU) to cut
    # per-iteration scan overhead; 1 = plain scan
    unroll = int(os.environ.get("CUNET_SCAN_UNROLL", "1"))
    (y, carry_fifos), ys = jax.lax.scan(
        wrapped, (y, carry_fifos), (xs_params, xs_state, xs_rng),
        unroll=max(1, unroll),
    )
    fifos = {
        "down": [list(f) for f in carry_fifos["down"]],
        "neck": list(carry_fifos["neck"]),
        "up": [list(f) for f in carry_fifos["up"]],
        "intermedia": list(carry_fifos["intermedia"]),
    }
    return y, fifos, ys["head_out"], ys["state"]


def _unstack_scan_states(state, stacked, scan_range, cfg, anchors):
    """Write the scanned slots' BN-state updates back into the list-of-slot
    state pytree. Head states only update at anchored slots (the reference
    never runs non-anchored heads)."""
    new_state = {
        "stem": state["stem"],
        "hg": {
            "down": list(state["hg"]["down"]),
            "neck": dict(state["hg"]["neck"]),
            "up": list(state["hg"]["up"]),
        },
        "intermedia": {"adapters": list(state["intermedia"]["adapters"])},
        "heads": list(state["heads"]),
    }
    for j, i in enumerate(scan_range):
        take = lambda t: jax.tree_util.tree_map(lambda x: x[j], t)
        for b in range(cfg.num_blocks):
            new_state["hg"]["down"][b] = {
                k: _set_idx(new_state["hg"]["down"][b][k], i,
                            take(stacked["hg"]["down"][b][k]))
                for k in new_state["hg"]["down"][b]
            }
            new_state["hg"]["up"][b] = {
                k: _set_idx(new_state["hg"]["up"][b][k], i,
                            take(stacked["hg"]["up"][b][k]))
                for k in new_state["hg"]["up"][b]
            }
        new_state["hg"]["neck"] = {
            k: _set_idx(new_state["hg"]["neck"][k], i, take(stacked["hg"]["neck"][k]))
            for k in new_state["hg"]["neck"]
        }
        new_state["intermedia"] = {
            "adapters": _set_idx(new_state["intermedia"]["adapters"], i - 1,
                                 take(stacked["inter"]))
        }
        if (i + 1) in anchors:
            new_state["heads"] = _set_idx(new_state["heads"], i, take(stacked["head"]))
    return new_state


def _set_idx(lst, i, val):
    out = list(lst)
    out[i] = val
    return out


def _write_slot_state(hg_state, inter_state, heads_state, i, ss, cfg, anchors):
    """Write one slot's updated state subtree (``_slot_subtree`` shape) back
    into the list-of-slots state trees. Head state only updates at anchored
    slots (the reference never runs non-anchored heads)."""
    new_hg = {"down": list(hg_state["down"]), "neck": dict(hg_state["neck"]),
              "up": list(hg_state["up"])}
    for which in ("down", "up"):
        for b in range(cfg.num_blocks):
            blk = dict(new_hg[which][b])
            for k in blk:
                blk[k] = _set_idx(blk[k], i, ss["hg"][which][b][k])
            new_hg[which][b] = blk
    neck = dict(new_hg["neck"])
    for k in neck:
        neck[k] = _set_idx(neck[k], i, ss["hg"]["neck"][k])
    new_hg["neck"] = neck
    new_inter = {"adapters": list(inter_state["adapters"])}
    if i > 0:
        new_inter["adapters"][i - 1] = ss["inter"]
    new_heads = list(heads_state)
    if (i + 1) in anchors:
        new_heads[i] = ss["head"]
    return new_hg, new_inter, new_heads




def _fused_model_eval(params, state, y_stem, *, cfg, quant=None):
    """Single-launch full forward (all K slots in one Pallas program);
    see cunet_tpu.kernels.fused_model. Returns the anchored head list.
    With ``quant`` (int8_infer), params must be ``quant_eval_params`` output
    and the int8 buf kernel executes the quantized model on the MXU."""
    nb = cfg.num_blocks
    anchors = cfg.anchors
    fold = quant is None
    slot_args = []
    for i in range(cfg.layer_num):
        p = _slot_subtree(params, i, cfg)
        s = _slot_subtree(state, i, cfg)
        blocks = (
            [_hg_wset(p["hg"]["down"][j], s["hg"]["down"][j], True, fold)
             for j in range(nb)]
            + [_hg_wset(p["hg"]["neck"], s["hg"]["neck"], False, fold)]
            + [_hg_wset(p["hg"]["up"][j], s["hg"]["up"][j], False, fold)
               for j in reversed(range(nb))]
        )
        inter = None
        if i > 0:
            inter = (
                _fold_bn_vec(p["inter"]["norm"], s["inter"]["norm"]),
                p["inter"]["conv"],
            )
        # the loop variant computes heads for every slot (params carry all K)
        head = (
            _fold_bn_vec(p["head"]["norm"], s["head"]["norm"]),
            p["head"]["conv"],
        )
        slot_args.append({"inter": inter, "blocks": blocks, "head": head})
    import os

    if quant is not None:
        from cunet_tpu.kernels.fused_model_buf import fused_model_buf_infer

        stacked = fused_model_buf_infer(
            y_stem, slot_args,
            num_blocks=nb, layer_num=cfg.layer_num, order=cfg.order,
            class_num=cfg.class_num, quant_bits_i=quant.bits_i,
        )
        return [stacked[:, a - 1] for a in anchors]
    if os.environ.get("CUNET_TERA_IMPL", "buf") == "buf":
        from cunet_tpu.kernels.fused_model_buf import fused_model_buf_infer as impl
    else:
        from cunet_tpu.kernels.fused_model import fused_model_loop_infer as impl

    stacked = impl(
        y_stem, slot_args,
        num_blocks=nb, layer_num=cfg.layer_num, order=cfg.order,
        class_num=cfg.class_num,
    )
    return [stacked[:, a - 1] for a in anchors]


def apply_cu_net(
    params,
    state,
    x: jnp.ndarray,
    *,
    cfg: ModelConfig,
    train: bool,
    rng: Optional[jax.Array] = None,
    quant=None,
) -> Tuple[List[jnp.ndarray], Dict]:
    """Full forward: stem -> K x (intermedia -> hourglass [-> head if anchored]).

    Args:
      x: [N, 256, 256, 3] input batch (NHWC), any float dtype.
    Returns:
      (list of [N, 64, 64, class_num] heatmaps — one per loss anchor, in
      U-Net order; final element is the last U-Net), new_state.

    ref:models/cu_net.py:336-360.
    """
    x = x.astype(jnp.dtype(cfg.compute_dtype))
    new_state = dict(state)

    # stem: conv7x7/2 -> BN -> ReLU -> maxpool2 (ref:models/cu_net.py:299-304)
    y = conv2d(x, params["stem"]["conv"], stride=2, padding=3)
    y, stem_ns = batch_norm(y, params["stem"]["norm"], state["stem"]["norm"],
                            train=train, norm_dtype=_bn_nd(cfg),
                            tile=cfg.bn_tile)
    y = relu(y)
    y = max_pool_2x2(y)
    new_state["stem"] = {"norm": stem_ns}

    int8_whole = (
        quant is not None and quant.enabled and quant.int8_infer
        and quant.int8_impl == "pallas"
    )
    if (not train) and cfg.use_pallas and cfg.pallas_whole_model \
            and (quant is None or int8_whole) and _mosaic_ok(cfg):
        outs = _fused_model_eval(params, state, y, cfg=cfg,
                                 quant=quant if int8_whole else None)
        new_state["hg"] = state["hg"]
        new_state["intermedia"] = state["intermedia"]
        new_state["heads"] = state["heads"]
        assert len(outs) == len(cfg.anchors)
        return outs, new_state

    fifos = empty_fifos(cfg)
    anchors = cfg.anchors
    outs: List[jnp.ndarray] = []

    start = max(cfg.order, 1)
    scan_range = list(range(start, cfg.layer_num))
    use_scan = cfg.use_scan and len(scan_range) >= 2

    stacked = is_stacked(params)
    if stacked and not use_scan:
        raise ValueError(
            "stacked steady-slot params require the lax.scan path "
            "(use_scan=True and layer_num >= start+2); unstack_steady() "
            "first for unrolled execution")
    # the unrolled prefix loop below only touches slots < start; for
    # stacked storage give it canonical-shaped prefix views
    p_run = _prefix_view(params) if stacked else params
    s_run = _prefix_view(state) if stacked else state
    hg_state = s_run["hg"]
    inter_state = s_run["intermedia"]
    heads_state = list(s_run["heads"])

    def block_apply(y, i, hg_state, inter_state, fifos):
        y, inter_state, fifos["intermedia"] = _apply_intermedia(
            p_run["intermedia"], inter_state, y, i, fifos["intermedia"],
            cfg=cfg, train=train,
        )
        r = None if rng is None else jax.random.fold_in(rng, i)
        y, hg_state, fifos = _apply_hourglass(
            p_run["hg"], hg_state, y, i, fifos, cfg=cfg, train=train, rng=r,
            quant=quant,
        )
        return y, hg_state, inter_state, fifos

    unrolled_upto = start if use_scan else cfg.layer_num
    # fused eval kernels fold BN but not the activation quantizers: they
    # must not engage for quantized evaluation
    fused_eval = (not train) and cfg.use_pallas and cfg.pallas_hourglass \
        and quant is None and _mosaic_ok(cfg)
    fused_train = train and fused_train_ok(cfg)
    for i in range(unrolled_upto):
        if fused_train:
            slot_p = _slot_subtree(params, i, cfg)
            slot_s = _slot_subtree(state, i, cfg)
            ri = None if rng is None else jax.random.fold_in(rng, i)
            y, new_f, hm, new_ss = _fused_slot_train(
                slot_p, slot_s, y, fifos, cfg=cfg, slot_i=i,
                bits_i=quant_kernel_bits(quant), rng=ri
            )
            fifos = {
                "down": [list(fe) for fe in new_f["down"]],
                "neck": list(new_f["neck"]),
                "up": [list(fe) for fe in new_f["up"]],
                "intermedia": list(new_f["intermedia"]),
            }
            hg_state, inter_state, heads_state = _write_slot_state(
                hg_state, inter_state, heads_state, i, new_ss, cfg, anchors
            )
            if (i + 1) in anchors:
                outs.append(hm)
            continue
        if fused_eval:
            slot_p = _slot_subtree(params, i, cfg)
            slot_s = _slot_subtree(state, i, cfg)
            y, fifos, hm = _fused_slot_eval_hg(
                slot_p, slot_s, y, fifos, cfg=cfg, slot_i=i
            )
            if (i + 1) in anchors:
                outs.append(hm)
            continue
        if train and cfg.remat == "block":
            y, hg_state, inter_state, fifos = jax.checkpoint(
                block_apply, static_argnums=(1,)
            )(y, i, hg_state, inter_state, fifos)
        else:
            y, hg_state, inter_state, fifos = block_apply(
                y, i, hg_state, inter_state, fifos
            )
        if (i + 1) in anchors:
            hm, head_s = _apply_head(
                p_run["heads"][i], s_run["heads"][i], y, train=train,
                quant=quant, norm_dtype=_bn_nd(cfg), tile=cfg.bn_tile
            )
            heads_state[i] = head_s
            outs.append(hm)

    if use_scan and stacked:
        # steady entries are untouched by the prefix loop; the scan reads
        # them straight off the stacked storage
        y, fifos, head_outs, scanned = _apply_slots_scanned(
            params, state, y, fifos, scan_range,
            cfg=cfg, train=train, rng=rng, quant=quant,
        )
        (new_state["hg"], new_state["intermedia"],
         new_state["heads"]) = _assemble_stacked_state(
            hg_state, inter_state, heads_state, state, scanned,
            scan_range, anchors)
        for j, i in enumerate(scan_range):
            if (i + 1) in anchors:
                outs.append(head_outs[j])
    elif use_scan:
        # merge partially-updated states for the scan's source tree
        mid_state = dict(new_state)
        mid_state["hg"] = hg_state
        mid_state["intermedia"] = inter_state
        mid_state["heads"] = heads_state
        y, fifos, head_outs, stacked_states = _apply_slots_scanned(
            params, mid_state, y, fifos, scan_range,
            cfg=cfg, train=train, rng=rng, quant=quant,
        )
        merged = _unstack_scan_states(mid_state, stacked_states, scan_range,
                                      cfg, anchors)
        new_state.update(
            {k: merged[k] for k in ("hg", "intermedia", "heads")}
        )
        for j, i in enumerate(scan_range):
            if (i + 1) in anchors:
                outs.append(head_outs[j])
    else:
        new_state["hg"] = hg_state
        new_state["intermedia"] = inter_state
        new_state["heads"] = heads_state

    assert len(outs) == len(anchors)
    return outs, new_state


def create_cu_net(key, cfg: ModelConfig):
    """Convenience mirror of ref:models/cu_net.py:362-368."""
    return init_cu_net(key, cfg)
