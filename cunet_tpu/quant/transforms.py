"""Model-level quantization transforms: the functional QuanOp / BinOp.

The reference wraps the model in a stateful controller that mutates conv
weights in place around every step (``QuanOp``, ref:utils/quantize.py:77-175;
``BinOp``, ref:models/cu_net_prev_version.py:17-92). Here the same protocol
is two pure tree transforms used inside the jitted train step:

1. ``preprocess_masters(params)`` — meancenter + clamp + round-to-bits_g the
   selected conv weights (the reference's quantization()/save/restore cycle:
   the optimizer always steps on this master value).
2. inside the loss: ``quantize_params(params)`` — fake-quant each selected
   weight with :func:`cunet_tpu.quant.wage.fake_quant_weight`, whose
   custom_vjp reproduces updateQuanGradWeight().

Deviation (documented): the reference quantizes the forward weights from the
pre-bits_g-rounding clamped value while the optimizer steps on the rounded
master; we quantize from the rounded master itself — a <= 2^-(bits_g-1)
perturbation that keeps the step a single pure function of ``params``.

Selection policy: the reference quantizes every Conv2d except the first and
last in module-traversal order (ref:utils/quantize.py:85-91) — which is the
stem conv and, due to registration order, the *last intermedia adapter*, NOT
the final head. ``policy="reference"`` reproduces that; ``policy="heads_out"``
excludes the stem and all heads instead (the presumable intent).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax

from cunet_tpu.config import QuantConfig
from cunet_tpu.quant.wage import (
    binarize_weight,
    fake_quant_weight,
    meancenter_clamp_weight,
    meancenter_clamp_weight_bin,
)

PathPredicate = Callable[[Tuple], bool]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def selected_conv_predicate(params, policy: str = "reference") -> PathPredicate:
    """Predicate over tree paths choosing which conv kernels are quantized.

    Works on canonical (per-slot list) AND natively stacked steady-slot
    storage (models.cu_net.stack_steady): stacked conv leaves live under a
    ``steady`` key with a leading slot dim. The reference's last-intermedia-
    adapter exclusion is the stacked intermedia leaf's LAST slice; the
    predicate returns the sentinel "all_but_last" for it and
    ``_map_selected`` quantizes all other slices."""
    if policy not in ("reference", "heads_out", "all"):
        raise ValueError(f"unknown selection policy: {policy}")

    adapters = params.get("intermedia", {}).get("adapters", [])
    n_intermedia = len(adapters) if isinstance(adapters, list) else 0

    def pred(path):
        s = _path_str(path)
        if not (s.endswith("/conv") or s.endswith("/conv2")):
            return False
        if s.startswith("stem/"):
            return False  # first conv always excluded
        if policy == "reference":
            if s == f"intermedia/adapters/{n_intermedia - 1}/conv":
                return False  # canonical: last adapter excluded
            if s == "intermedia/adapters/steady/conv":
                return "all_but_last"  # stacked: exclude the last slice
            return True
        if policy == "heads_out":
            return not s.startswith("heads/")
        return True

    return pred


def _map_selected(fn, params, pred: PathPredicate):
    import jax.numpy as jnp

    def mapper(path, leaf):
        if not hasattr(leaf, "ndim"):
            return leaf
        sel = pred(path)
        if leaf.ndim == 4 and sel:
            return fn(leaf)
        if leaf.ndim == 5 and sel:
            # stacked steady-slot storage: vmap over the slot dim
            q = jax.vmap(fn)(leaf)
            if sel == "all_but_last":
                q = jnp.concatenate([q[:-1], leaf[-1:]])
            return q
        return leaf

    return jax.tree_util.tree_map_with_path(mapper, params)


def preprocess_masters(params, qcfg: QuantConfig, pred: PathPredicate):
    """Per-step master-weight preprocessing (meancenter/clamp/round-bits_g);
    the reference's quantization()+restore() net effect on stored weights."""
    if qcfg.bits_w == 1 and qcfg.bits_g > 15:
        # BinOp protocol: no bits_g rounding of masters
        return _map_selected(meancenter_clamp_weight_bin, params, pred)
    return _map_selected(lambda w: meancenter_clamp_weight(w, qcfg.bits_g), params, pred)


def quantize_params(params, qcfg: QuantConfig, pred: PathPredicate):
    """Fake-quant the selected conv weights for the forward pass. Gradients
    through this transform carry the XNOR/STE corrections + bits_g gradient
    quantization (see cunet_tpu.quant.wage)."""
    if qcfg.bits_w == 1 and qcfg.bits_g > 15:
        return _map_selected(lambda w: binarize_weight(w, qcfg.bits_g), params, pred)
    return _map_selected(
        lambda w: fake_quant_weight(w, qcfg.bits_w, qcfg.bits_g), params, pred
    )
