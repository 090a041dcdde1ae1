#!/usr/bin/env python
"""txt2img CLI — vanilla, spatial-control and full spatio-temporal modes.

Covers the reference drivers `scripts/txt2img.py` (vanilla) and
`scripts/txt2img-gpt.py` (full method) in one entry point.

Examples:
  python scripts/txt2img.py --prompt "a cat next to a dog" \\
      --ckpt sd-v1-4.ckpt --clip-vocab bpe_simple_vocab_16e6.txt.gz \\
      --mode spacetime --steps 50 --outdir outputs/
  python scripts/txt2img.py --prompt "a photo" --mode vanilla --sampler dpm
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--mode", choices=["vanilla", "spatial", "spacetime"], default="vanilla")
    ap.add_argument("--sampler", choices=["plms", "ddim", "dpm"], default="plms")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=7.5)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--outdir", default="outputs")
    ap.add_argument("--ckpt", default=None, help="CompVis sd-v1-4 checkpoint")
    ap.add_argument("--layout-ckpt", default=None)
    ap.add_argument("--clip-ckpt", default=None, help="OpenAI ViT-B/32 state_dict")
    ap.add_argument("--clip-vocab", default=None, help="CLIP BPE vocab file")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--flash", action="store_true")
    ap.add_argument("--no-mha", dest="mha", action="store_false",
                    help="disable the fused Pallas MHA self-attention "
                         "kernel (on by default: +3%% vanilla, "
                         "docs/BENCHMARKS.md)")
    ap.add_argument("--no-fused-ff", dest="fused_ff", action="store_false",
                    help="disable the fused Pallas GEGLU feed-forward "
                         "kernel (on by default: +2%% on top of mha, "
                         "docs/BENCHMARKS.md)")
    ap.add_argument("--watermark", action="store_true")
    args = ap.parse_args()

    import dataclasses

    import jax

    from diffusion_spacetime_attn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from diffusion_spacetime_attn_tpu.config import (
        LayoutConfig,
        PipelineConfig,
        SpaceTimeConfig,
        UNetConfig,
        VAEConfig,
    )
    from diffusion_spacetime_attn_tpu.models.clip import CLIP
    from diffusion_spacetime_attn_tpu.config import CLIPConfig
    from diffusion_spacetime_attn_tpu.pipeline.frontend import LayoutInference
    from diffusion_spacetime_attn_tpu.pipeline.losses import DCLIPLoss
    from diffusion_spacetime_attn_tpu.pipeline.runners import PromptRunner
    from diffusion_spacetime_attn_tpu.utils import convert
    from diffusion_spacetime_attn_tpu.utils.loader import (
        load_layout_predictor,
        load_stable_diffusion,
    )
    from diffusion_spacetime_attn_tpu.utils.testing import (
        randomize_params_on_device,
    )
    from diffusion_spacetime_attn_tpu.utils.tokenizer import (
        make_clip_tokenizer,
        make_roberta_tokenizer,
    )

    cfg = PipelineConfig(
        unet=UNetConfig(dtype=args.dtype, use_flash=args.flash,
                        use_mha=args.mha, use_fused_ff=args.fused_ff),
        vae=VAEConfig(dtype=args.dtype),
        spacetime=SpaceTimeConfig(num_steps=args.steps, guidance_scale=args.scale),
    )
    if not args.ckpt:
        print("WARNING: no --ckpt; running with random weights (smoke mode)")
    sd = load_stable_diffusion(cfg, args.ckpt)

    clip_model = CLIP(cfg.loss_clip)
    if args.clip_ckpt:
        clip_params = convert.convert_openai_clip(
            convert.load_torch_checkpoint(args.clip_ckpt)
        )
    else:
        # on-device: host numpy params re-transfer through the tunnel per call
        clip_params = randomize_params_on_device(
            jax.eval_shape(
                clip_model.init,
                jax.random.PRNGKey(0),
                jnp.zeros((1, 224, 224, 3)),
                jnp.zeros((1, 77), jnp.int32),
            )["params"],
            jax.random.PRNGKey(9),
        )
    clip_loss = DCLIPLoss(clip_model, clip_params)

    lcfg = LayoutConfig()
    lmodel, lparams = load_layout_predictor(lcfg, args.layout_ckpt)
    rtok = make_roberta_tokenizer()
    layout = LayoutInference(lmodel, lparams, rtok)

    ctok = make_clip_tokenizer(args.clip_vocab)
    if hasattr(ctok, "tokenize"):
        tokenize = ctok.tokenize
    else:
        tokenize = lambda t: ctok.pad_to(ctok.encode(t), 77)

    runner = PromptRunner(
        sd=sd, clip_loss=clip_loss, layout=layout,
        clip_tokenize=tokenize, text_tokenize=tokenize,
        cfg=cfg.spacetime, outdir=args.outdir, mode=args.mode,
    )
    img = runner.run_one(args.prompt, 0, args.seed)
    if img is None and args.mode != "vanilla":
        print("layout failed; falling back to vanilla")
        runner.mode = "vanilla"
        # vanilla needs no objects — bypass layout by direct generation
        cond = runner._encode([args.prompt])
        eps = sd.make_eps_fn(cond, runner._uncond(), args.scale)
        lat = cfg.spacetime.latent_size
        x_T = jax.random.normal(jax.random.PRNGKey(args.seed), (1, lat, lat, 4))
        z = sd.sample_from(eps, x_T, args.sampler, remat=False)
        img = np.asarray(sd.decode_latents(z)[0])
        from diffusion_spacetime_attn_tpu.pipeline.runners import save_image

        save_image(img, os.path.join(args.outdir, f"final_s{args.seed}_index_0.png"))
    if img is not None and args.watermark:
        from PIL import Image

        from diffusion_spacetime_attn_tpu.utils.watermark import embed_watermark

        path = os.path.join(
            args.outdir, f"final{cfg.spacetime.epochs - 1}_s{args.seed}_index_0.png"
        )
        if os.path.exists(path):
            arr = np.asarray(Image.open(path).convert("RGB"))
            Image.fromarray(embed_watermark(arr)).save(path)
    print(f"done → {args.outdir}")


if __name__ == "__main__":
    main()
