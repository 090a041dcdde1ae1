#!/usr/bin/env python
"""One-command real-weights drill: convert checkpoints -> one vanilla image
+ one optimized (spacetime) image + a CLIP-score JSON.

The moment the reference's weight blobs appear (`sd-v1-4.ckpt`,
`checkpoint_90_0.0.pth`, OpenAI `ViT-B-32.pt`), CLIP-fidelity parity — the
BASELINE.md north star — is this one command:

  python scripts/ingest_weights.py \
      --sd-ckpt sd-v1-4.ckpt --layout-ckpt checkpoint_90_0.0.pth \
      --clip-ckpt ViT-B-32.pt --clip-vocab bpe_simple_vocab_16e6.txt.gz \
      --prompt "a black cat sitting on a desk next to a laptop"

Reference flow it packages: `scripts/txt2img-gpt.py:55-72,263-272` (load
the CompVis ckpt + fairseq layout ckpt, run the 3-epoch optimization),
`inference/inference_coco.py:467-477` (layout checkpoint load).

The JSON records 1 - DCLIPLoss.global_loss (reference `plms.py:21-61`
forward_2: x7-nearest-upsample + 16x16 avgpool to 224, cosine vs the
prompt embedding) for BOTH images, so vanilla-vs-method fidelity deltas are
directly comparable to the paper's protocol.  Scores computed with random
CLIP weights (no --clip-ckpt) are flagged `"clip_weights": "random"` —
they order nothing and exist only to prove the plumbing.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_drill(
    sd_ckpt=None,
    layout_ckpt=None,
    clip_ckpt=None,
    clip_vocab=None,
    prompt="a black cat sitting on a desk next to a laptop",
    outdir="ingest_outputs",
    steps=50,
    epochs=3,
    seed=1,
    sampler="plms",
    dtype="bfloat16",
    flash=True,
    pipeline_cfg=None,
    layout_cfg=None,
    tokenize_fn=None,
):
    """Programmatic core (the CLI is a thin argparse wrapper; tests call
    this with tiny configs).  Returns the report dict it also writes."""
    import dataclasses

    import jax
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

    if pipeline_cfg is None:
        pipeline_cfg = PipelineConfig(
            unet=UNetConfig(dtype=dtype, use_flash=flash),
            vae=VAEConfig(dtype=dtype),
        )
    st = dataclasses.replace(
        pipeline_cfg.spacetime, num_steps=steps, epochs=epochs
    )
    cfg = dataclasses.replace(pipeline_cfg, spacetime=st)

    report = {
        "prompt": prompt,
        "steps": steps,
        "epochs": epochs,
        "seed": seed,
        "sampler": sampler,
        "sd_weights": "checkpoint" if sd_ckpt else "random",
        "layout_weights": "checkpoint" if layout_ckpt else "random",
        "clip_weights": "checkpoint" if clip_ckpt else "random",
    }

    sd = load_stable_diffusion(cfg, sd_ckpt)

    clip_model = CLIP(cfg.loss_clip)
    if clip_ckpt:
        clip_params = convert.convert_openai_clip(
            convert.load_torch_checkpoint(clip_ckpt)
        )
    else:
        clip_params = randomize_params_on_device(
            jax.eval_shape(
                clip_model.init,
                jax.random.PRNGKey(0),
                jnp.zeros((1, cfg.loss_clip.vision.image_size,
                           cfg.loss_clip.vision.image_size, 3)),
                jnp.zeros((1, cfg.loss_clip.text.max_len), jnp.int32),
            )["params"],
            jax.random.PRNGKey(9),
        )
    clip_loss = DCLIPLoss(clip_model, clip_params)

    lcfg = layout_cfg or LayoutConfig()
    lmodel, lparams = load_layout_predictor(lcfg, layout_ckpt)
    rtok = make_roberta_tokenizer()
    layout = LayoutInference(lmodel, lparams, rtok)

    if tokenize_fn is not None:
        tokenize = tokenize_fn
    else:
        ctok = make_clip_tokenizer(
            clip_vocab, max_len=cfg.loss_clip.text.max_len
        )
        if hasattr(ctok, "tokenize"):
            tokenize = ctok.tokenize
        else:
            tokenize = lambda t: ctok.pad_to(
                ctok.encode(t), cfg.loss_clip.text.max_len
            )

    runner = PromptRunner(
        sd=sd, clip_loss=clip_loss, layout=layout,
        clip_tokenize=tokenize, text_tokenize=tokenize,
        cfg=cfg.spacetime, outdir=os.path.join(outdir, "vanilla"),
        mode="vanilla", sampler=sampler,
    )

    prompt_tokens = jnp.asarray(
        np.asarray(tokenize(prompt), np.int32)
    )[None]

    def clip_score(img):
        # 1 - forward_2 global loss == cosine(CLIP(img), CLIP(prompt)).
        loss = clip_loss.global_loss(jnp.asarray(img)[None], prompt_tokens)
        return float(np.asarray(loss).reshape(-1)[0] * -1.0 + 1.0)

    img_v = runner.run_one(prompt, 0, seed)
    if img_v is None:
        # layout failed -> vanilla needs no objects; generate directly
        cond = runner._encode([prompt])
        eps = sd.make_eps_fn(cond, runner._uncond(), cfg.spacetime.guidance_scale)
        x_T = jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, cfg.spacetime.latent_size, cfg.spacetime.latent_size, 4),
        )
        z = sd.sample_from(eps, x_T, sampler, remat=False)
        img_v = np.asarray(sd.decode_latents(z)[0])
        from diffusion_spacetime_attn_tpu.pipeline.runners import save_image

        save_image(img_v, os.path.join(outdir, "vanilla",
                                       f"final_s{seed}_index_0.png"))
    report["vanilla_clip_score"] = clip_score(img_v)
    report["vanilla_image"] = os.path.join(outdir, "vanilla")

    runner.mode = "spacetime"
    runner.outdir = os.path.join(outdir, "method")
    img_m = runner.run_one(prompt, 0, seed)
    if img_m is None:
        report["method_clip_score"] = None
        report["method_image"] = None
        report["method_skipped"] = "layout produced no objects for the prompt"
    else:
        report["method_clip_score"] = clip_score(img_m)
        report["method_image"] = os.path.join(outdir, "method")

    os.makedirs(outdir, exist_ok=True)
    json_path = os.path.join(outdir, "clip_scores.json")
    with open(json_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return report


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sd-ckpt", default=None,
                    help="CompVis sd-v1-4.ckpt (.ckpt/.safetensors)")
    ap.add_argument("--layout-ckpt", default=None,
                    help="fairseq checkpoint_90_0.0.pth / HF RoBERTa .pth / "
                         "orbax dir")
    ap.add_argument("--clip-ckpt", default=None,
                    help="OpenAI ViT-B/32 state_dict for the fidelity loss")
    ap.add_argument("--clip-vocab", default=None,
                    help="CLIP BPE vocab (bpe_simple_vocab_16e6.txt.gz)")
    ap.add_argument("--prompt",
                    default="a black cat sitting on a desk next to a laptop")
    ap.add_argument("--outdir", default="ingest_outputs")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--sampler", choices=["plms", "ddim", "dpm"],
                    default="plms")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--no-flash", dest="flash", action="store_false",
                    help="disable splash attention in the optimization "
                         "chain (1.8x slower; docs/BENCHMARKS.md)")
    args = ap.parse_args()

    from diffusion_spacetime_attn_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    if not args.sd_ckpt:
        print("WARNING: no --sd-ckpt; random weights (plumbing drill only)")
    run_drill(
        sd_ckpt=args.sd_ckpt, layout_ckpt=args.layout_ckpt,
        clip_ckpt=args.clip_ckpt, clip_vocab=args.clip_vocab,
        prompt=args.prompt, outdir=args.outdir, steps=args.steps,
        epochs=args.epochs, seed=args.seed, sampler=args.sampler,
        dtype=args.dtype, flash=args.flash,
    )


if __name__ == "__main__":
    main()
