#!/usr/bin/env python
"""img2img / inpaint CLI (reference: stock `scripts/img2img.py` and
`scripts/inpaint.py` of the CompVis tree — SURVEY §2.1 "Stock scripts").

  python scripts/img2img.py --init in.png --prompt "a fantasy landscape" \\
      --strength 0.75 --ckpt sd-v1-4.ckpt
  python scripts/img2img.py --init in.png --mask mask.png --prompt "…"   # inpaint
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--init", required=True, help="init image (png/jpg)")
    ap.add_argument("--mask", default=None,
                    help="inpaint mask png: white = keep, black = generate")
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--strength", type=float, default=0.75,
                    help="img2img: fraction of the chain to run")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=7.5)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--outdir", default="outputs")
    ap.add_argument("--ckpt", default=None, help="CompVis sd-v1-4 checkpoint")
    ap.add_argument("--clip-vocab", default=None)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--scores-dtype", default="bfloat16")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from diffusion_spacetime_attn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from diffusion_spacetime_attn_tpu.config import (
        PipelineConfig, SpaceTimeConfig, UNetConfig, VAEConfig,
    )
    from diffusion_spacetime_attn_tpu.pipeline.img2img import img2img, inpaint
    from diffusion_spacetime_attn_tpu.utils.loader import load_stable_diffusion
    from diffusion_spacetime_attn_tpu.utils.tokenizer import make_clip_tokenizer

    cfg = PipelineConfig(
        unet=UNetConfig(dtype=args.dtype, attn_scores_dtype=args.scores_dtype),
        vae=VAEConfig(dtype=args.dtype),
        spacetime=SpaceTimeConfig(
            num_steps=args.steps, guidance_scale=args.scale,
            image_size=args.size, latent_size=args.size // 8,
        ),
    )
    sd = load_stable_diffusion(cfg, args.ckpt)
    ctok = make_clip_tokenizer(args.clip_vocab)
    tokenize = (
        ctok.tokenize if hasattr(ctok, "tokenize")
        else (lambda t: ctok.pad_to(ctok.encode(t), 77))
    )

    def encode(text):
        ids = jnp.asarray(np.asarray(tokenize(text), np.int32))[None]
        return sd.encode_text(ids)

    img = (
        np.asarray(
            Image.open(args.init).convert("RGB").resize((args.size, args.size))
        ).astype(np.float32) / 127.5 - 1.0
    )[None]
    cond, uncond = encode(args.prompt), encode("")
    rng = jax.random.PRNGKey(args.seed)

    if args.mask:
        m = np.asarray(
            Image.open(args.mask).convert("L").resize((args.size, args.size))
        ).astype(np.float32)[None, :, :, None] / 255.0
        out = inpaint(sd, jnp.asarray(img), jnp.asarray(m), cond, uncond, rng)
        tag = "inpaint"
    else:
        out = img2img(sd, jnp.asarray(img), cond, uncond, rng,
                      strength=args.strength)
        tag = "img2img"

    os.makedirs(args.outdir, exist_ok=True)
    arr = (np.asarray(out[0]) * 255.0 + 0.5).astype(np.uint8)
    path = os.path.join(args.outdir, f"{tag}_s{args.seed}.png")
    Image.fromarray(arr).save(path)
    print(path)


if __name__ == "__main__":
    main()
