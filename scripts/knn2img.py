#!/usr/bin/env python
"""Retrieval-augmented text-to-image — TPU-native equivalent of the
reference's `scripts/knn2img.py`.

Prompt → CLIP joint-space text embedding → (optional) k nearest neighbors
from a retrieval database (exact MXU top-k, `pipeline/retrieval.py`) →
conditioning [B, 1+knn, 768] → RDM UNet + f16 VAE sampled with DDIM/PLMS
under zero-embedding CFG (`pipeline/knn2img.py`).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="a painting of a virus monster playing guitar")
    ap.add_argument("--from-file", default=None, help="file of prompts, one per line")
    ap.add_argument("--outdir", default="outputs/knn2img-samples")
    ap.add_argument("--ddim-steps", type=int, default=50)
    ap.add_argument("--plms", action="store_true")
    ap.add_argument("--ddim-eta", type=float, default=0.0)
    ap.add_argument("--n-samples", type=int, default=3, help="batch size")
    ap.add_argument("--scale", type=float, default=5.0)
    ap.add_argument("--database", default=None,
                    help=".npz from scripts/train_searcher.py")
    ap.add_argument("--use-neighbors", action="store_true")
    ap.add_argument("--knn", type=int, default=10)
    ap.add_argument("--clip-ckpt", default=None, help="OpenAI CLIP state_dict")
    ap.add_argument("--rdm-ckpt", default=None,
                    help="orbax/npz RDM weights (random without: smoke mode)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tiny", action="store_true", help="tiny model (CI/CPU smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_spacetime_attn_tpu.config import CLIPConfig
    from diffusion_spacetime_attn_tpu.models.clip import CLIP
    from diffusion_spacetime_attn_tpu.pipeline.knn2img import (
        RetrievalAugmentedDiffusion,
    )
    from diffusion_spacetime_attn_tpu.pipeline.retrieval import Retriever
    from diffusion_spacetime_attn_tpu.pipeline.runners import save_image
    from diffusion_spacetime_attn_tpu.utils.cache import enable_compilation_cache
    from diffusion_spacetime_attn_tpu.utils.profiling import get_logger
    from diffusion_spacetime_attn_tpu.utils.testing import (
        randomize_params_on_device,
    )
    from diffusion_spacetime_attn_tpu.utils.tokenizer import make_clip_tokenizer

    enable_compilation_cache()
    logger = get_logger("knn2img")

    rdm = RetrievalAugmentedDiffusion.create(
        jax.random.PRNGKey(0), steps=args.ddim_steps, dtype=args.dtype,
        tiny=args.tiny, eta=args.ddim_eta)
    if args.rdm_ckpt:
        raise SystemExit("RDM weight conversion: pass an orbax dir trained "
                         "with this framework; the reference's rdm ckpt is "
                         "not shipped")
    rdm.unet_params = randomize_params_on_device(
        rdm.unet_params, jax.random.PRNGKey(1))
    rdm.vae_params = randomize_params_on_device(
        rdm.vae_params, jax.random.PRNGKey(2))

    # --- text encoder (joint space) ---
    clip_cfg = CLIPConfig()
    clip = CLIP(clip_cfg)
    if args.clip_ckpt:
        from diffusion_spacetime_attn_tpu.utils import convert

        clip_params = convert.convert_openai_clip(
            convert.load_torch_checkpoint(args.clip_ckpt))
    else:
        clip_params = randomize_params_on_device(
            jax.eval_shape(
                clip.init, jax.random.PRNGKey(3),
                jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 77), jnp.int32),
            )["params"],
            jax.random.PRNGKey(4),
        )
        logger.info("no --clip-ckpt: random text tower (smoke mode)")
    tok = make_clip_tokenizer()
    tokenize = (tok.tokenize if hasattr(tok, "tokenize")
                else (lambda t: tok.pad_to(tok.encode(t), 77)))

    retriever = None
    if args.use_neighbors:
        assert args.database, "--use-neighbors needs --database"
        retriever = Retriever.from_npz(args.database)
        if args.tiny:
            # smoke mode: crop the database to the tiny context dim
            from diffusion_spacetime_attn_tpu.pipeline.retrieval import normalize

            retriever.embedding = normalize(
                retriever.embedding[:, : rdm.unet.cfg.context_dim])
        D = retriever.embedding.shape[1]
        logger.info("database: %d × %d", retriever.embedding.shape[0], D)

    prompts = ([l.strip() for l in open(args.from_file) if l.strip()]
               if args.from_file else [args.prompt])
    os.makedirs(args.outdir, exist_ok=True)

    encode_text = jax.jit(
        lambda p, ids: clip.apply({"params": p}, ids, method=CLIP.encode_text))
    # params as explicit jit args (closed-over params bake GB constants)
    sample_fn = jax.jit(
        lambda up, vp, c, k: rdm.sample_with_params(
            up, vp, c, k, guidance_scale=args.scale,
            sampler="plms" if args.plms else "ddim"))
    sample = lambda c, k: sample_fn(rdm.unet_params, rdm.vae_params, c, k)

    rng = jax.random.PRNGKey(args.seed)
    count = 0
    for prompt in prompts:
        ids = jnp.asarray(np.tile(np.asarray(tokenize(prompt))[None],
                                  (args.n_samples, 1)))
        txt = encode_text(clip_params, ids)                  # [B, D]
        if args.tiny:  # tiny model has context_dim 16
            txt = txt[:, : rdm.unet.cfg.context_dim]
        cond = rdm.build_conditioning(txt, retriever, args.knn)
        rng, k = jax.random.split(rng)
        imgs = np.asarray(jax.block_until_ready(sample(cond, k)))
        for j in range(imgs.shape[0]):
            save_image(imgs[j], os.path.join(args.outdir, f"{count:05}.png"))
            count += 1
        logger.info("prompt %r → %d samples (context len %d)",
                    prompt, imgs.shape[0], cond.shape[1])


if __name__ == "__main__":
    main()
