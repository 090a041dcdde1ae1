#!/usr/bin/env python
"""Layout-predictor single-sentence inference CLI (reference:
`python inference/inference_coco.py --sentence '...'`, README.md:44-64)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sentence",
        default="The silver bed was situated to the right of the white couch.",
    )
    ap.add_argument("--ckpt", default=None, help="layout predictor checkpoint")
    ap.add_argument("--vocab", default=None, help="RoBERTa vocab.json")
    ap.add_argument("--merges", default=None, help="RoBERTa merges.txt")
    ap.add_argument("--cpu", action="store_true", help="run on host CPU")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from diffusion_spacetime_attn_tpu.config import LayoutConfig
    from diffusion_spacetime_attn_tpu.pipeline.frontend import LayoutInference
    from diffusion_spacetime_attn_tpu.utils.loader import (
        find_default_layout_checkpoint,
        load_layout_predictor,
    )
    from diffusion_spacetime_attn_tpu.utils.tokenizer import make_roberta_tokenizer

    if args.ckpt is None:
        args.ckpt = find_default_layout_checkpoint()
        if args.ckpt:
            print(f"using trained layout checkpoint: {args.ckpt}")
        else:
            print("WARNING: no trained checkpoint found (random weights); "
                  "train one with scripts/train_layout.py")
    cfg = LayoutConfig()
    model, params = load_layout_predictor(cfg, args.ckpt)
    tok = make_roberta_tokenizer(args.vocab, args.merges)
    infer = LayoutInference(model, params, tok)
    print(f"Sentence: {args.sentence}")
    res = infer(args.sentence)
    if res is None:
        print("No COCO objects found.")
        return
    for phrase, (x, y) in res.items():
        print(f"{phrase} position: ({x:.3f}, {y:.3f})")


if __name__ == "__main__":
    main()
