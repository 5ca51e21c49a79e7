"""Convert a tools/mosaic_probe.py log into pass_model calibration JSON.

Usage: python tools/probe_to_json.py /tmp/r4sweep/probe_core.log > probe.json
       python tools/pass_model.py --probe probe.json

Unit mapping: the probe prints ns/row at its probe width (lanes column);
pass_model prices ns per (8,128) vreg-row group ("vrow"), so
ns_per_vrow = ns_per_row * 8 / ceil(lanes/128).

Kind mapping (probe op -> pass_model class). The r4 probe rewrite prices
ops as extras on top of a non-foldable quadratic chain (mosaic_probe.py):
  quad            -> relu/add/copy (one generic VPU op each) and
                     affine_relu at 2x (mul+add-then-max = 2 op classes)
  quad_max        -> relu (direct measurement; overrides the quad proxy)
  quad_cast2      -> cast (per-op already halved by the probe's op count)
  quad_affine_vec -> broadcast FMA (affine_relu = this + relu when present)

fixed_ns_per_pass comes from the overlap probe's per-pass intercept when
present (the "dots=0 vpu=1" minus "dots=0 vpu=0" line pair), else keeps the
first-principles default.
"""

import json
import math
import re
import sys

# (class, scale, priority): higher priority wins when both map to a class
KIND_MAP = {
    "quad": [("relu", 1.0, 0), ("add", 1.0, 0), ("copy", 1.0, 0),
             ("affine_relu", 2.0, 0)],
    # quad_max prices ONLY relu/max: a plain slice add is a generic
    # 1-op/cycle ALU op (the quad class, r5 probe 0.05 ns/row), while max
    # lowers ~7x slower (0.34 ns/row) — pricing adds at the max rate
    # overcounted the conv epilogues ~7x
    "quad_max": [("relu", 1.0, 1)],
    "quad_cast2": [("cast", 1.0, 1)],
    "quad_affine_vec": [("affine_relu", 1.0, 1)],  # + relu added below
    # legacy pre-r4 kinds (foldable chains; kept so old logs still parse)
    "affine_relu": [("affine_relu", 1.0, 2)],
    "relu": [("relu", 1.0, 2)],
    "cast2": [("cast", 0.5, 2)],
    "mul": [("copy", 1.0, 2)],
}

ROW_RE = re.compile(
    r"^(\w+)\s+lanes=\s*(\d+)\s+(\w+)\s+per-op\s+([-\d.]+)\s*us\s+"
    r"rw-bw\s+([-\d.inf]+)\s*GB/s\s+\(\s*([-\d.]+)\s*ns/row\)")
OVERLAP_RE = re.compile(r"^dots=\s*(\d+)\s+vpu=\s*(\d+):\s+([-\d.]+)\s*us")


def main():
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    out = {"measured": True, "ns_per_vrow": {}, "source": sys.argv[1]}
    prio = {}
    affine_parts = {}
    overlap = {}
    for line in open(sys.argv[1], errors="replace"):
        m = ROW_RE.match(line.strip())
        if m:
            kind, lanes, dtype, _, _, ns_row = m.groups()
            if kind not in KIND_MAP or dtype != "float32":
                continue
            if float(ns_row) <= 0:
                # shallow-probe noise (the op hid under the HBM stream);
                # keep the positive measurement from another width
                continue
            for cls, scale, p in KIND_MAP[kind]:
                v = float(ns_row) * scale * 8.0 / math.ceil(int(lanes) / 128)
                if p >= prio.get(cls, -1):
                    out["ns_per_vrow"][cls] = round(v, 3)
                    prio[cls] = p
            if kind in ("quad_affine_vec", "quad_max"):
                affine_parts[kind] = float(ns_row) * 8.0 / math.ceil(
                    int(lanes) / 128)
        m = OVERLAP_RE.match(line.strip())
        if m:
            overlap[(int(m.group(1)), int(m.group(2)))] = float(m.group(3))
    # affine_relu (BN prologue: broadcast FMA then max) = measured
    # broadcast-FMA + measured max, when both direct probes ran
    if len(affine_parts) == 2:
        out["ns_per_vrow"]["affine_relu"] = round(
            affine_parts["quad_affine_vec"] + affine_parts["quad_max"], 3)
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
