#!/usr/bin/env python
"""Evaluation CLI: object recall + relation accuracy over a results folder
(reference: `evaluation/detector_result_gpt.py` + `relation_result_gpt.py`).

The detector is pluggable:

- `--detections detections.json` (filename → [[x1,y1,x2,y2,category,score],
  ...]) produced by any detector — e.g. detrex DINO-Swin-L as in the
  reference, run wherever the GPU lives (`scripts/export_detections.py`).
- `--detector clip` runs the self-contained CLIP grid detector on TPU — a
  calibrated APPROXIMATION (see docs/EVALUATION.md); it prints the
  calibration caveat and the weight provenance, and can `--dump-detections`
  an interchangeable JSON artifact.

`--clip-score` additionally computes the CLIP fidelity metric.  `--json-out`
writes every computed number (plus provenance flags) as one JSON file.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def tiny_clip_cfg():
    from diffusion_spacetime_attn_tpu.config import (
        CLIPConfig,
        CLIPTextConfig,
        CLIPVisionConfig,
    )

    # image_size=14: the clip-score path feeds global_resize's fixed x7/16
    # composite (32px tiny images -> 14), mirroring run_dataset.py's tiny
    # loss_clip config
    return CLIPConfig(
        vision=CLIPVisionConfig(image_size=14, patch_size=7, width=16,
                                layers=2, heads=2, projection_dim=8),
        text=CLIPTextConfig(width=16, layers=2, heads=2,
                            vocab_size=49408, max_len=7),
        projection_dim=8,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="result_outputs")
    ap.add_argument("--dataset", choices=["gpt", "mscoco", "vsr"], default="gpt")
    ap.add_argument("--data-root", default="/root/reference/datasets")
    ap.add_argument("--detections", default=None, help="detections JSON")
    ap.add_argument("--detector", choices=["clip"], default=None,
                    help="run the on-TPU CLIP grid detector (calibrated "
                         "approximation — prints the caveat)")
    ap.add_argument("--dump-detections", default=None,
                    help="with --detector clip: also write the detections "
                         "JSON (interchangeable with the detrex route)")
    ap.add_argument("--conf-recall", type=float, default=0.4)
    ap.add_argument("--conf-relation", type=float, default=0.5)
    ap.add_argument("--clip-score", action="store_true")
    ap.add_argument("--clip-ckpt", default=None)
    ap.add_argument("--clip-vocab", default=None)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CLIP towers (CPU protocol tests)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from diffusion_spacetime_attn_tpu.eval import protocol

    files = protocol.list_result_files(args.results)
    print(f"{len(files)} result images")
    report = {"results_dir": args.results, "dataset": args.dataset,
              "n_images": len(files)}

    detections = None
    if args.detections:
        detections = json.load(open(args.detections))
        report["detector"] = "external-json"
    elif args.detector == "clip":
        print(f"NOTE: {protocol.CLIP_DETECTOR_CAVEAT}", file=sys.stderr)
        det, provenance = protocol.build_clip_detector(
            args.clip_ckpt, args.clip_vocab,
            cfg=tiny_clip_cfg() if args.tiny else None,
        )
        if provenance == "random":
            print("WARNING: random CLIP weights — detections exercise the "
                  "mechanism only; scores are not meaningful", file=sys.stderr)
        detections = protocol.detect_folder(args.results, det, files,
                                            log=print)
        report["detector"] = "clip-grid (calibrated approximation)"
        report["detector_weights"] = provenance
        if args.dump_detections:
            json.dump(detections, open(args.dump_detections, "w"))
            print(f"wrote {args.dump_detections}")

    if detections is not None:
        scores = protocol.score_results(
            args.results, args.dataset, args.data_root, detections,
            args.conf_recall, args.conf_relation,
        )
        report.update(scores)
        print(f"All object numbers: {scores['gt_objects']}")
        print(f"Generated object numbers: {scores['generated_objects']}")
        print(f"object recall: {scores['object_recall']:.4f}")
        print(f"relation accuracy: {scores['relation_accuracy']:.4f} "
              f"({scores['relations_correct']}/{scores['relations_total']})")

    if args.clip_score:
        loss, tokenize, cs_prov = protocol.build_clip_loss(
            args.clip_ckpt, args.clip_vocab,
            cfg=tiny_clip_cfg() if args.tiny else None)
        if cs_prov == "random":
            print("WARNING: random CLIP weights — score is not meaningful")
        report["clip_score_weights"] = cs_prov
        cs = protocol.clip_score_results(
            args.results, args.dataset, args.data_root, loss, tokenize,
        )
        report.update(cs)
        print(f"mean CLIP score: {cs['mean_clip_score']} "
              f"over {cs['n_scored']} images")

    if args.json_out:
        json.dump(report, open(args.json_out, "w"), indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
