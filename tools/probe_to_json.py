"""Convert a tools/mosaic_probe.py log into pass_model calibration JSON.

Usage: python tools/probe_to_json.py /tmp/r4sweep/probe_core.log > probe.json
       python tools/pass_model.py --probe probe.json

Unit mapping: the probe prints ns/row at its probe width (lanes column);
pass_model prices ns per (8,128) vreg-row group ("vrow"), so
ns_per_vrow = ns_per_row * 8 / ceil(lanes/128).

Kind mapping (probe op -> pass_model class):
  affine_relu -> affine_relu   (the BN prologue pair, f32)
  relu        -> relu
  cast2       -> cast          (probe chains a f32->bf16->f32 ROUND TRIP,
                                i.e. two casts: halved here)
  add_slice32 -> add           (scatter-conv tap-add analog)
  mul         -> copy          (read-modify-write ~= a buffer copy's
                                read+write; closest probed proxy)

fixed_ns_per_pass comes from the overlap probe's per-pass intercept when
present (the "dots=0 vpu=1" minus "dots=0 vpu=0" line pair), else keeps the
first-principles default.
"""

import json
import math
import re
import sys

KIND_MAP = {
    "affine_relu": ("affine_relu", 1.0),
    "relu": ("relu", 1.0),
    "cast2": ("cast", 0.5),
    "add_slice32": ("add", 1.0),
    "mul": ("copy", 1.0),
}

ROW_RE = re.compile(
    r"^(\w+)\s+lanes=\s*(\d+)\s+(\w+)\s+per-op\s+([-\d.]+)\s*us\s+"
    r"rw-bw\s+([-\d.inf]+)\s*GB/s\s+\(\s*([-\d.]+)\s*ns/row\)")
OVERLAP_RE = re.compile(r"^dots=\s*(\d+)\s+vpu=\s*(\d+):\s+([-\d.]+)\s*us")


def main():
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    out = {"measured": True, "ns_per_vrow": {}, "source": sys.argv[1]}
    overlap = {}
    for line in open(sys.argv[1], errors="replace"):
        m = ROW_RE.match(line.strip())
        if m:
            kind, lanes, dtype, _, _, ns_row = m.groups()
            if kind not in KIND_MAP or dtype != "float32":
                continue
            cls, scale = KIND_MAP[kind]
            v = float(ns_row) * scale * 8.0 / math.ceil(int(lanes) / 128)
            # keep the first (canonical-width) measurement per class
            out["ns_per_vrow"].setdefault(cls, round(v, 3))
        m = OVERLAP_RE.match(line.strip())
        if m:
            overlap[(int(m.group(1)), int(m.group(2)))] = float(m.group(3))
    # "add" has no direct probe (jax 0.9 Mosaic cannot lower an unfoldable
    # pure-add chain): a VPU add is the same single-op class as max, so it
    # inherits the relu slope.
    if "add" not in out["ns_per_vrow"] and "relu" in out["ns_per_vrow"]:
        out["ns_per_vrow"]["add"] = out["ns_per_vrow"]["relu"]
    missing = [k for k in ("affine_relu", "relu", "cast", "add", "copy")
               if k not in out["ns_per_vrow"]]
    if missing:
        print(f"warning: probe log lacks {missing}; pass_model keeps its "
              "defaults for those", file=sys.stderr)
    # per-pass fixed cost: single-op chain minus empty chain, if both present
    if (0, 0) in overlap and (0, 1) in overlap:
        out["fixed_ns_per_pass"] = round(
            max(0.0, (overlap[(0, 1)] - overlap[(0, 0)])) * 1000.0, 1)
    if overlap:
        out["overlap_us"] = {f"{d}d{v}v": t for (d, v), t in overlap.items()}
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
