"""Collect tools/sweep_infer.sh results into one table.

Usage: python tools/sweep_report.py [/tmp/r3sweep]
"""

import glob
import json
import os
import re
import sys


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3sweep"
    rows = []
    for log in sorted(glob.glob(os.path.join(out, "*.log"))):
        name = os.path.basename(log)[:-4]
        done = os.path.exists(os.path.join(out, name + ".done"))
        last = None
        for line in open(log, errors="replace"):
            line = line.strip()
            if line.startswith("{"):
                try:
                    last = json.loads(line)
                except ValueError:
                    pass
        if last:
            val = last.get("img_per_sec") or last.get("value")
            extra = last.get("ms_per_batch") or last.get("vs_baseline")
            rows.append((name, done, val, extra, last.get("metric",
                                                          last.get("ablate"))))
        else:
            # surface the failure reason compactly
            txt = open(log, errors="replace").read()
            m = re.search(r"(RESOURCE_EXHAUSTED[^\n]{0,120}|"
                          r"Mosaic[^\n]{0,120}|Error[^\n]{0,120})", txt)
            rows.append((name, done, None, None,
                         (m.group(1) if m else "no JSON line")[:120]))
    w = max((len(r[0]) for r in rows), default=4)
    for name, done, val, extra, tag in rows:
        mark = "ok " if done else "!! "
        v = f"{val:9.1f}" if isinstance(val, (int, float)) else "        -"
        e = f"{extra}" if extra is not None else ""
        print(f"{mark}{name:<{w}}  {v}  {e}  {tag}")


if __name__ == "__main__":
    main()
