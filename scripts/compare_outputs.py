"""Compare two result_outputs directories image-by-image (numerics drift A/B).

Used to quantify the effect of a numerics knob (e.g. --params-dtype
bfloat16 vs float32) on the *final optimized images* of identical
run_dataset.py invocations: matches files by name, reports per-image MAE /
max-abs-diff in [0,1] pixel units plus aggregate stats, and (with --json)
emits one machine-readable line for docs/BENCHMARKS.md.

The reference has no analogue (it never varies weight precision); this is
the TPU framework's own measured-gate discipline: a precision default
(serving casts params to bf16 for HBM fit, scripts/serve.py) must carry a
recorded drift number, not a shrug.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image


def load_dir(d: str) -> dict:
    out = {}
    for name in sorted(os.listdir(d)):
        if name.endswith(".png"):
            out[name] = np.asarray(
                Image.open(os.path.join(d, name)).convert("RGB"),
                dtype=np.float32) / 255.0
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dir_a")
    ap.add_argument("dir_b")
    ap.add_argument("--json", action="store_true", help="one JSON line only")
    args = ap.parse_args()
    a, b = load_dir(args.dir_a), load_dir(args.dir_b)
    common = sorted(set(a) & set(b))
    if not common:
        print(f"no common .png files between {args.dir_a} and {args.dir_b}",
              file=sys.stderr)
        return 1
    rows = []
    for name in common:
        if a[name].shape != b[name].shape:
            print(f"shape mismatch for {name}: {a[name].shape} vs "
                  f"{b[name].shape}", file=sys.stderr)
            return 1
        diff = np.abs(a[name] - b[name])
        rows.append((name, float(diff.mean()), float(diff.max())))
    maes = [r[1] for r in rows]
    maxes = [r[2] for r in rows]
    summary = {
        "n_images": len(rows),
        "only_in_a": len(set(a) - set(b)),
        "only_in_b": len(set(b) - set(a)),
        "mean_mae": float(np.mean(maes)),
        "worst_mae": float(np.max(maes)),
        "mean_maxdiff": float(np.mean(maxes)),
        "worst_maxdiff": float(np.max(maxes)),
        "unit": "pixel fraction of [0,1]",
    }
    if args.json:
        print(json.dumps(summary))
        return 0
    for name, mae, mx in rows:
        print(f"{name}: mae={mae:.6f} max={mx:.6f}")
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
