"""PyTorch ``.pth.tar`` -> JAX checkpoint converter.

The reference publishes two pretrained checkpoints
(``face-layer-num-8-order-1``, ``human-layer-num-16-order-1``,
ref:README.md:41-43) saved as ``{train_history, state_dict, optimizer}``
(ref:utils/checkpoint.py:17-19). This tool maps the torch ``state_dict``
parameter names onto the functional pytree of :mod:`cunet_tpu.models.cu_net`
for pretrained-parity evaluation.

Name schemes handled:
- the "current" model (ref:models/cu_net.py): ``features.conv0.weight``,
  ``hg.down_blocks.{b}.layers.{i}.{norm1,conv1,norm2,conv2}``,
  ``...adapters_ahead.{i}.{adapter_norm,adapter_conv}``, ``linears.{i}``,
  ``intermedia.adapters.{j}``;
- the "prev" model (ref:models/cu_net_prev_version.py): dense layers own a
  fused bottleneck module with flat ``norm_weight/norm_bias/conv_weight``
  parameters plus ``norm_running_{mean,var}`` buffers, and layer submodules
  named ``norm.2``/``conv.2``.
- an optional ``module.`` DataParallel prefix on every key (stripped).

Conversions: conv OIHW -> HWIO transpose; BN weight/bias -> scale/bias
params; running stats -> the separate state pytree.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from cunet_tpu.config import ModelConfig


def _conv(t) -> np.ndarray:
    """torch OIHW -> HWIO."""
    a = np.asarray(t, np.float32)
    return np.transpose(a, (2, 3, 1, 0))


class _NameMap:
    """(our tree path) <-> (torch name stem) pairs for one model config."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.entries: List[Tuple[Tuple, str, str]] = []  # (path, stem, kind)
        self._build()

    def _bn(self, path, stem):
        self.entries.append((path, stem, "bn"))

    def _cv(self, path, stem):
        self.entries.append((path, stem, "conv"))

    def _bottleneck(self, path, norm_stem, conv_stem):
        self._bn(path + ("norm",), norm_stem)
        self._cv(path + ("conv",), conv_stem)

    def _dense_block(self, path, base, requires_skip):
        for i in range(self.cfg.layer_num):
            lp = path + ("layers", i)
            self._bottleneck(
                lp + ("bottleneck",), f"{base}.layers.{i}.norm1", f"{base}.layers.{i}.conv1"
            )
            self._bn(lp + ("norm2",), f"{base}.layers.{i}.norm2")
            self._cv(lp + ("conv2",), f"{base}.layers.{i}.conv2")
            self._bottleneck(
                path + ("adapters_ahead", i),
                f"{base}.adapters_ahead.{i}.adapter_norm",
                f"{base}.adapters_ahead.{i}.adapter_conv",
            )
            if requires_skip:
                self._bottleneck(
                    path + ("adapters_skip", i),
                    f"{base}.adapters_skip.{i}.adapter_norm",
                    f"{base}.adapters_skip.{i}.adapter_conv",
                )

    def _build(self):
        cfg = self.cfg
        self._cv(("stem", "conv"), "features.conv0")
        self._bn(("stem", "norm"), "features.norm0")
        for b in range(cfg.num_blocks):
            self._dense_block(("hg", "down", b), f"hg.down_blocks.{b}", True)
            self._dense_block(("hg", "up", b), f"hg.up_blocks.{b}", False)
        self._dense_block(("hg", "neck"), "hg.neck_block", False)
        for i in range(cfg.layer_num):
            self._bottleneck(("heads", i), f"linears.{i}.norm", f"linears.{i}.conv")
        for j in range(cfg.layer_num - 1):
            self._bottleneck(
                ("intermedia", "adapters", j),
                f"intermedia.adapters.{j}.adapter_norm",
                f"intermedia.adapters.{j}.adapter_conv",
            )


def _lookup(sd: Dict, candidates: List[str]):
    for c in candidates:
        if c in sd:
            return sd[c]
    return None


def _bn_names(stem: str, field: str) -> List[str]:
    """Current scheme: ``{stem}.{field}``; prev scheme flattens the fused
    bottleneck's norm into ``{parent}.norm_{field}`` and uses ``norm.2``
    module names for the second norm."""
    out = [f"{stem}.{field}"]
    if stem.endswith(".norm1"):
        out.append(stem[: -len(".norm1")] + f".bottleneck.norm_{field}")
        out.append(stem[: -len(".norm1")] + f".bottleneck.norm_running_{field}")
    if stem.endswith(".norm2"):
        out.append(stem[: -len(".norm2")] + f".norm.2.{field}")
    if stem.endswith(".adapter_norm"):
        base = stem[: -len(".adapter_norm")]
        out.append(f"{base}.norm_{field}")
        out.append(f"{base}.norm_running_{field}")
    return out


def _conv_names(stem: str) -> List[str]:
    out = [f"{stem}.weight"]
    if stem.endswith(".conv1"):
        out.append(stem[: -len(".conv1")] + ".bottleneck.conv_weight")
    if stem.endswith(".conv2"):
        out.append(stem[: -len(".conv2")] + ".conv.2.weight")
    if stem.endswith(".adapter_conv"):
        out.append(stem[: -len(".adapter_conv")] + ".conv_weight")
    return out


def convert_state_dict(
    sd: Dict, cfg: ModelConfig, *, strict: bool = False
) -> Tuple[dict, dict, List[str]]:
    """torch state_dict -> (params, state, missing_paths).

    Missing entries keep nothing (caller merges onto an init tree); with
    ``strict`` a missing entry raises.
    """
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    nm = _NameMap(cfg)
    params: dict = {}
    state: dict = {}
    missing: List[str] = []

    # build nested dicts with int keys as dicts first; convert at the end
    def assign(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for path, stem, kind in nm.entries:
        if kind == "conv":
            t = _lookup(sd, _conv_names(stem))
            if t is None:
                missing.append(stem)
                if strict:
                    raise KeyError(f"missing conv weight: {stem}")
                continue
            assign(params, path, _conv(t))
        else:
            w = _lookup(sd, _bn_names(stem, "weight"))
            b = _lookup(sd, _bn_names(stem, "bias"))
            m = _lookup(sd, _bn_names(stem, "running_mean") + _bn_names(stem, "mean"))
            v = _lookup(sd, _bn_names(stem, "running_var") + _bn_names(stem, "var"))
            if w is None or b is None:
                missing.append(stem)
                if strict:
                    raise KeyError(f"missing bn params: {stem}")
                continue
            assign(params, path, {
                "scale": np.asarray(w, np.float32),
                "bias": np.asarray(b, np.float32),
            })
            assign(state, path[:-1] + (path[-1],), {
                "mean": np.asarray(m, np.float32) if m is not None
                else np.zeros_like(np.asarray(w, np.float32)),
                "var": np.asarray(v, np.float32) if v is not None
                else np.ones_like(np.asarray(w, np.float32)),
            })

    params = _intify(params)
    state = _intify(state)
    return params, state, missing


def _intify(tree):
    """Convert {0: a, 1: b, ...} int-keyed dicts into lists (our pytree uses
    lists for repeated modules)."""
    if not isinstance(tree, dict):
        return tree
    if tree and all(isinstance(k, int) for k in tree):
        return [_intify(tree[k]) for k in sorted(tree)]
    return {k: _intify(v) for k, v in tree.items()}


def merge_into(template, converted):
    """Overlay converted leaves onto an init tree (keeps anything missing)."""
    if isinstance(template, dict):
        out = dict(template)
        for k, v in (converted or {}).items():
            out[k] = merge_into(template.get(k), v) if k in template else v
        return out
    if isinstance(template, list):
        conv = converted or []
        return [
            merge_into(t, conv[i]) if i < len(conv) else t
            for i, t in enumerate(template)
        ]
    return converted if converted is not None else template


def load_torch_checkpoint(path: str, cfg: ModelConfig):
    """Load a reference ``.pth.tar`` and convert. Returns
    (params, state, missing, train_history_dict_or_None)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, state, missing = convert_state_dict(sd, cfg)
    return params, state, missing, ckpt.get("train_history")


def main(argv=None):
    import argparse
    import pickle

    ap = argparse.ArgumentParser("cunet-convert")
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_prefix")
    ap.add_argument("--layer_num", type=int, required=True)
    ap.add_argument("--order", type=int, default=1)
    ap.add_argument("--class_num", type=int, required=True)
    ap.add_argument("--loss_num", type=int, required=True)
    args = ap.parse_args(argv)
    cfg = ModelConfig(layer_num=args.layer_num, order=args.order,
                      class_num=args.class_num, loss_num=args.loss_num)
    params, state, missing, _ = load_torch_checkpoint(args.torch_ckpt, cfg)
    for m in missing:
        print(f"=> not converted: {m}")
    with open(args.out_prefix + ".params.pkl", "wb") as f:
        pickle.dump({"params": params, "state": state}, f)
    print(f"=> wrote {args.out_prefix}.params.pkl")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
