#!/usr/bin/env python
"""One command for the full generate → detect → score loop, recorded as one
JSON artifact (VERDICT r3 next-#1).

Mirrors the reference's end-to-end evaluation flow — `txt2img-gpt.py` sweep
→ detrex detector → `detector_result_gpt.py:164-166` printed recall +
`relation_result_gpt.py` relation accuracy — as a single driver:

  python scripts/run_eval_protocol.py --end 32 --sampler dpm --steps 20 \
      --batch-size 8 --out EVAL_r04.json

Phases (generation runs in a subprocess so its HBM is fully released before
the detector's CLIP tower loads):
  1. `run_dataset.py --mode spacetime` over prompts [start, end)
  2. CLIP grid detector over the generated images → detections JSON
  3. protocol math (object recall @0.4, relation accuracy @0.5) + mean
     CLIP fidelity score
  4. one artifact JSON with every number AND the weight provenance flags —
     with random SD/CLIP weights the scores exercise the PROTOCOL, not
     image quality, and the artifact says so machine-readably.
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["gpt", "mscoco", "vsr"], default="gpt")
    ap.add_argument("--data-root", default="/root/reference/datasets")
    ap.add_argument("--mode", choices=["vanilla", "spatial", "spacetime"],
                    default="spacetime")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=32)
    ap.add_argument("--sampler", choices=["plms", "ddim", "dpm"], default="dpm")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--outdir", default="result_outputs/eval_protocol")
    ap.add_argument("--out", default="EVAL.json", help="artifact JSON path")
    ap.add_argument("--ckpt", default=None, help="SD weights (ingested)")
    ap.add_argument("--layout-ckpt", default=None,
                    help="default: trained checkpoint via "
                         "utils.loader.find_default_layout_checkpoint")
    ap.add_argument("--clip-ckpt", default=None)
    ap.add_argument("--params-dtype", default=None,
                    help="forwarded to run_dataset.py; default bfloat16 in "
                         "spacetime mode (f32 params OOM at b8 with the "
                         "layout+fidelity-CLIP aux models co-resident — "
                         "docs/BENCHMARKS.md round 4), float32 otherwise")
    ap.add_argument("--skip-generate", action="store_true",
                    help="reuse an existing --outdir (resume after a crash "
                         "in the detect/score phases)")
    ap.add_argument("--top-per-category", type=int, default=1)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model configs end to end (CPU protocol test)")
    ap.add_argument("--save-epochs", action="store_true",
                    help="save per-epoch intermediates during generation "
                         "(reference plms.py:280-288 contract); the scorer "
                         "still filters to the LAST epoch, like "
                         "detector_result_gpt.py:144")
    ap.add_argument("--epochs", type=int, default=None,
                    help="optimization epochs used by generation (default: "
                         "SpaceTimeConfig default 3, or 2 with --tiny); the "
                         "scorer filters on final{epochs-1}_s{seed}_")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.params_dtype is None:
        args.params_dtype = (
            "bfloat16" if args.mode == "spacetime" else "float32")
    if args.epochs is None:
        args.epochs = 2 if args.tiny else 3  # run_dataset's SpaceTimeConfig
    last_epoch = args.epochs - 1

    artifact = {
        "protocol": "generate->detect->score",
        "dataset": args.dataset,
        "mode": args.mode,
        "sampler": f"{args.sampler}{args.steps}",
        "batch_size": args.batch_size,
        "prompts": [args.start, args.end],
        "seed": args.seed,
    }

    # ---- phase 1: generation sweep (subprocess: frees HBM afterwards) ----
    t0 = time.perf_counter()
    if not args.skip_generate:
        cmd = [sys.executable, os.path.join(REPO, "scripts", "run_dataset.py"),
               "--dataset", args.dataset, "--data-root", args.data_root,
               "--mode", args.mode, "--sampler", args.sampler,
               "--steps", str(args.steps), "--batch-size", str(args.batch_size),
               "--start", str(args.start), "--end", str(args.end),
               "--seed", str(args.seed), "--outdir", args.outdir,
               "--params-dtype", args.params_dtype]
        if args.ckpt:
            cmd += ["--ckpt", args.ckpt]
        if args.layout_ckpt:
            cmd += ["--layout-ckpt", args.layout_ckpt]
        if args.clip_ckpt:
            cmd += ["--clip-ckpt", args.clip_ckpt]
        if args.tiny:
            cmd += ["--tiny"]
        if args.save_epochs:
            cmd += ["--save-epochs"]
        if args.cpu:
            cmd += ["--cpu"]
        print("+", " ".join(cmd), flush=True)
        r = subprocess.run(cmd, cwd=REPO)
        if r.returncode != 0:
            raise SystemExit(f"generation failed (rc={r.returncode})")
    artifact["generate_seconds"] = round(time.perf_counter() - t0, 1)
    artifact["sd_weights"] = args.ckpt or "random"
    artifact["params_dtype"] = args.params_dtype

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from diffusion_spacetime_attn_tpu.eval import protocol
    from diffusion_spacetime_attn_tpu.utils.loader import (
        find_default_layout_checkpoint,
    )

    artifact["layout_weights"] = (
        args.layout_ckpt or find_default_layout_checkpoint() or "random"
    ) if not args.tiny else (args.layout_ckpt or "random")

    # filter to THIS run's [start, end): outdirs are resumable/reused, and
    # stale images from a previous run must not enter the denominators
    # reference scorer keeps only the LAST epoch + this seed
    # (`detector_result_gpt.py:144` filters "final2_s1_")
    files = protocol.list_result_files(
        args.outdir, (args.start, args.end), epoch=last_epoch, seed=args.seed)
    print(f"{len(files)} generated images in {args.outdir} "
          f"(indices [{args.start}, {args.end}), "
          f"filter final{last_epoch}_s{args.seed}_)")
    if not files:
        raise SystemExit("no result images — generation produced nothing")

    # ---- phase 2: detection (CLIP grid detector, calibrated approx) ----
    print(f"NOTE: {protocol.CLIP_DETECTOR_CAVEAT}", file=sys.stderr)
    from scripts.evaluate import tiny_clip_cfg

    t0 = time.perf_counter()
    det, provenance = protocol.build_clip_detector(
        args.clip_ckpt, cfg=tiny_clip_cfg() if args.tiny else None,
    )
    detections = protocol.detect_folder(
        args.outdir, det, files, top_per_category=args.top_per_category,
        log=lambda m: print(m, flush=True),
    )
    det_path = os.path.join(args.outdir, "detections_clip.json")
    json.dump(detections, open(det_path, "w"))
    artifact["detect_seconds"] = round(time.perf_counter() - t0, 1)
    artifact["detector"] = "clip-grid (calibrated approximation)"
    artifact["detector_weights"] = provenance
    # calibration numbers come from the COMMITTED calibration artifact
    # (scripts/calibrate_clip_detector.py --sweep --out …) so they cannot
    # silently go stale if detector scales/refinement change (ADVICE r4)
    calib_path = os.path.join(REPO, "DETECTOR_CALIBRATION.json")
    if os.path.isfile(calib_path):
        calib = json.load(open(calib_path))["headline"]
        artifact["detector_calibration"] = {
            "oracle_recall_iou50": calib["oracle_recall_iou50"],
            "random_floor_recall_iou50": calib["random_recall_iou50"],
            "source": "DETECTOR_CALIBRATION.json "
                      "(scripts/calibrate_clip_detector.py --sweep)",
        }
    else:
        artifact["detector_calibration"] = {"uncalibrated": True}
    artifact["detections_json"] = det_path

    # ---- phase 3: protocol math + CLIP fidelity ----
    scores = protocol.score_results(
        args.outdir, args.dataset, args.data_root, detections,
        prompt_range=(args.start, args.end), epoch=last_epoch, seed=args.seed,
    )
    artifact.update(scores)
    print(f"object recall: {scores['object_recall']:.4f} "
          f"({scores['generated_objects']}/{scores['gt_objects']})")
    print(f"relation accuracy: {scores['relation_accuracy']:.4f} "
          f"({scores['relations_correct']}/{scores['relations_total']})")

    # CLIP fidelity over the same images (random weights → flagged)
    clip_loss, tokenize, cs_prov = protocol.build_clip_loss(
        args.clip_ckpt, cfg=tiny_clip_cfg() if args.tiny else None)
    cs = protocol.clip_score_results(
        args.outdir, args.dataset, args.data_root, clip_loss, tokenize,
        prompt_range=(args.start, args.end), epoch=last_epoch, seed=args.seed)
    artifact.update(cs)
    artifact["clip_score_weights"] = cs_prov
    print(f"mean CLIP score: {cs['mean_clip_score']} over {cs['n_scored']}")

    json.dump(artifact, open(args.out, "w"), indent=1)
    print(f"wrote {args.out}")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
