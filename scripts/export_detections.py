#!/usr/bin/env python
"""Run a detectron2/detrex detector over a results folder and dump the
detections JSON consumed by `scripts/evaluate.py`.

This is the external-GPU half of the evaluation protocol, mirroring the
reference's in-detrex scripts (`evaluation/detector_result_gpt.py:95-151`:
DINO-Swin-L-384 4scale, LazyConfig + DetectionCheckpointer).  Run it from
inside a detrex checkout/environment:

  python export_detections.py --results result_outputs \
      --config projects/dino/configs/dino-swin/dino_swin_large_384_4scale_36ep.py \
      --weights dino_swin_large_384_4scale_36ep.pth --out detections.json

Then on the TPU side:

  python scripts/evaluate.py --detections detections.json --dataset gpt
"""
import argparse
import json
import os


# COCO 80-class names indexed by detectron2's contiguous class id
from pathlib import Path
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from diffusion_spacetime_attn_tpu.pipeline.frontend import COCO_CATEGORIES  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="result_outputs")
    ap.add_argument("--config", required=True, help="detrex LazyConfig .py")
    ap.add_argument("--weights", required=True, help="detector checkpoint")
    ap.add_argument("--out", default="detections.json")
    ap.add_argument("--conf", type=float, default=0.3, help="dump threshold")
    args = ap.parse_args()

    try:
        import torch
        from detectron2.checkpoint import DetectionCheckpointer
        from detectron2.config import LazyConfig, instantiate
        from detectron2.data.detection_utils import read_image
    except ImportError as e:
        raise SystemExit(
            f"detectron2/detrex not available here ({e}); run this script "
            "inside the detrex environment (see reference README.md:124-129)"
        )

    cfg = LazyConfig.load(args.config)
    cfg = LazyConfig.apply_overrides(cfg, [f"train.init_checkpoint={args.weights}"])
    model = instantiate(cfg.model)
    model.to(cfg.train.device)
    DetectionCheckpointer(model).load(cfg.train.init_checkpoint)
    model.eval()

    out = {}
    files = [f for f in sorted(os.listdir(args.results)) if f.endswith(".png")]
    with torch.no_grad():
        for f in files:
            img = read_image(os.path.join(args.results, f), format="BGR")
            h, w = img.shape[:2]
            inputs = {
                "image": torch.as_tensor(img.astype("float32").transpose(2, 0, 1)),
                "height": h,
                "width": w,
            }
            inst = model([inputs])[0]["instances"]
            keep = inst.scores >= args.conf
            boxes = inst.pred_boxes.tensor[keep].cpu().numpy()
            classes = inst.pred_classes[keep].cpu().numpy()
            scores = inst.scores[keep].cpu().numpy()
            out[f] = [
                [float(b[0]), float(b[1]), float(b[2]), float(b[3]),
                 COCO_CATEGORIES[int(c)], float(s)]
                for b, c, s in zip(boxes, classes, scores)
                if 0 <= int(c) < len(COCO_CATEGORIES)
            ]
            print(f"{f}: {len(out[f])} detections")
    json.dump(out, open(args.out, "w"))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
