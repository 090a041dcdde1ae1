#!/usr/bin/env python
"""Evaluation CLI: object recall + relation accuracy over a results folder
(reference: `evaluation/detector_result_gpt.py` + `relation_result_gpt.py`).

The detector is pluggable: pass `--detections detections.json` (a JSON
mapping image filename → [[x1,y1,x2,y2,category,score], ...]) produced by
any detector (e.g. detrex DINO-Swin-L as in the reference, run wherever the
GPU lives); the protocol math runs here.  `--clip-score` additionally
computes the self-contained CLIP fidelity metric on TPU.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="result_outputs")
    ap.add_argument("--dataset", choices=["gpt", "mscoco", "vsr"], default="gpt")
    ap.add_argument("--data-root", default="/root/reference/datasets")
    ap.add_argument("--detections", default=None, help="detections JSON")
    ap.add_argument("--conf-recall", type=float, default=0.4)
    ap.add_argument("--conf-relation", type=float, default=0.5)
    ap.add_argument("--clip-score", action="store_true")
    ap.add_argument("--clip-ckpt", default=None)
    ap.add_argument("--clip-vocab", default=None)
    args = ap.parse_args()

    from diffusion_spacetime_attn_tpu.eval.metrics import (
        Detection,
        object_recall,
        parse_gpt_ground_truth,
        parse_pkl_ground_truth,
        relation_accuracy,
        result_index,
    )

    if args.dataset == "gpt":
        gt_objects, gt_relations = parse_gpt_ground_truth(
            os.path.join(args.data_root, "gpt.txt")
        )
    else:
        gt_objects, gt_relations = parse_pkl_ground_truth(
            os.path.join(args.data_root, f"{args.dataset}.pkl")
        )

    files = sorted(
        f for f in os.listdir(args.results) if result_index(f) is not None
    )
    indices = [result_index(f) for f in files]
    print(f"{len(files)} result images")

    if args.detections:
        dets_raw = json.load(open(args.detections))
        dets, objs, rels = [], [], []
        for f, idx in zip(files, indices):
            rows = dets_raw.get(f, [])
            dets.append(
                [Detection(tuple(r[:4]), r[4], r[5]) for r in rows]
            )
            objs.append(gt_objects[idx])
            rels.append(gt_relations[idx])
        corr, cnt, rec = object_recall(dets, objs, args.conf_recall)
        print(f"All object numbers: {cnt}")
        print(f"Generated object numbers: {corr}")
        print(f"object recall: {rec:.4f}")
        rc, rn, racc = relation_accuracy(dets, rels, args.conf_relation)
        print(f"relation accuracy: {racc:.4f} ({rc}/{rn})")

    if args.clip_score:
        import jax
        import numpy as np
        from PIL import Image

        from diffusion_spacetime_attn_tpu.config import CLIPConfig
        from diffusion_spacetime_attn_tpu.eval.metrics import clip_scores
        from diffusion_spacetime_attn_tpu.models.clip import CLIP
        from diffusion_spacetime_attn_tpu.pipeline.losses import DCLIPLoss
        from diffusion_spacetime_attn_tpu.pipeline.runners import parse_gpt_prompts
        from diffusion_spacetime_attn_tpu.utils import convert
        from diffusion_spacetime_attn_tpu.utils.testing import (
            randomize_params_on_device,
        )
        from diffusion_spacetime_attn_tpu.utils.tokenizer import make_clip_tokenizer
        import jax.numpy as jnp

        cfg = CLIPConfig()
        clip_model = CLIP(cfg)
        if args.clip_ckpt:
            params = convert.convert_openai_clip(
                convert.load_torch_checkpoint(args.clip_ckpt)
            )
        else:
            print("WARNING: random CLIP weights — score is not meaningful")
            params = randomize_params_on_device(
                jax.eval_shape(
                    clip_model.init, jax.random.PRNGKey(0),
                    jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 77), jnp.int32),
                )["params"],
                jax.random.PRNGKey(0),
            )
        loss = DCLIPLoss(clip_model, params)
        tok = make_clip_tokenizer(args.clip_vocab)
        tokenize = (
            tok.tokenize if hasattr(tok, "tokenize")
            else (lambda t: tok.pad_to(tok.encode(t), 77))
        )
        if args.dataset == "gpt":
            prompts = parse_gpt_prompts(os.path.join(args.data_root, "gpt.txt"))
        else:
            from diffusion_spacetime_attn_tpu.pipeline.runners import parse_line_prompts

            prompts = parse_line_prompts(
                os.path.join(args.data_root, f"{args.dataset}.txt")
            )
        scores = []
        for f, idx in zip(files, indices):
            img = np.asarray(
                Image.open(os.path.join(args.results, f)).convert("RGB"),
                np.float32,
            )[None] / 255.0
            toks = np.asarray(tokenize(prompts[idx]), np.int32)[None]
            scores.append(float(clip_scores(loss, img, toks)[0]))
        print(f"mean CLIP score: {np.mean(scores):.4f} over {len(scores)} images")


if __name__ == "__main__":
    main()
