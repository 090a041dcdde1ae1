#!/usr/bin/env python
"""Dataset sweep CLI: gpt / mscoco / vsr (reference:
`scripts/txt2img-{gpt,mscoco,vsr}.py`), with resumable progress.

The reference restarts a crashed 500-prompt sweep by hand-editing the
`start` variable (`txt2img-gpt.py:303`); here a JSON manifest in the output
dir records completed indices and `--resume` skips them.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["gpt", "mscoco", "vsr"], required=True)
    ap.add_argument(
        "--data-root", default="/root/reference/datasets",
        help="directory holding gpt.txt / mscoco.txt / vsr.txt",
    )
    ap.add_argument("--mode", choices=["vanilla", "spatial", "spacetime"], default="spacetime")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=None)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sampler", choices=["plms", "ddim", "dpm"], default="plms",
                    help="works in every mode incl. spacetime (dpm @20 steps: "
                         "~2.5x faster optimization chain)")
    ap.add_argument("--outdir", default="result_outputs")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--layout-ckpt", default=None)
    ap.add_argument("--clip-ckpt", default=None)
    ap.add_argument("--clip-vocab", default=None)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--flash", default=None, action="store_true",
                    help="splash self-attention; default ON in spacetime mode "
                         "(1.8x faster grad-through-chain), OFF otherwise "
                         "(XLA+bf16 scores wins forward-only)")
    ap.add_argument("--no-flash", dest="flash", action="store_false")
    ap.add_argument("--mha", default=None, action="store_true",
                    help="fused full-softmax Pallas MHA self-attention; "
                         "default ON outside spacetime mode (+3%% vanilla, "
                         "docs/BENCHMARKS.md)")
    ap.add_argument("--no-mha", dest="mha", action="store_false")
    ap.add_argument("--fused-ff", default=None, action="store_true",
                    help="fused Pallas GEGLU feed-forward; default ON "
                         "outside spacetime mode (+2%% on top of mha)")
    ap.add_argument("--no-fused-ff", dest="fused_ff", action="store_false")
    ap.add_argument("--scores-dtype", default="bfloat16",
                    help="self-attention score buffer dtype (bfloat16: +10%% vanilla throughput, enables batch 8)")
    ap.add_argument("--params-dtype", default="float32",
                    help="cast all model params (bfloat16 saves ~2.7 GB at "
                         "v1 scale — spacetime b8 with the layout predictor "
                         "and fidelity CLIP co-resident OOMs at f32 params; "
                         "see docs/BENCHMARKS.md round 4 for the numerics "
                         "A/B)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--save-epochs", action="store_true",
                    help="also save intermediate final{0..epochs-2}_… images "
                         "(the reference saves EVERY optimization epoch's "
                         "image, plms.py:280-288; eval filters on the last)")
    ap.add_argument(
        "--batch-size", type=int, default=1,
        help=">1 packs prompts into fixed-shape device batches (one compile)",
    )
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model configs (protocol smoke / CPU tests)")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (the axon TPU plugin ignores JAX_PLATFORMS)")
    args = ap.parse_args()

    import jax

    from diffusion_spacetime_attn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

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
    from diffusion_spacetime_attn_tpu.pipeline.runners import (
        PromptRunner,
        parse_gpt_prompts,
        parse_line_prompts,
    )
    from diffusion_spacetime_attn_tpu.utils import convert
    from diffusion_spacetime_attn_tpu.utils.loader import (
        load_layout_predictor,
        load_stable_diffusion,
    )
    from diffusion_spacetime_attn_tpu.utils.profiling import JsonLogger
    from diffusion_spacetime_attn_tpu.utils.testing import (
        randomize_params_on_device,
    )
    from diffusion_spacetime_attn_tpu.utils.tokenizer import (
        make_clip_tokenizer,
        make_roberta_tokenizer,
    )

    if args.dataset == "gpt":
        prompts = parse_gpt_prompts(os.path.join(args.data_root, "gpt.txt"))
    else:
        prompts = parse_line_prompts(
            os.path.join(args.data_root, f"{args.dataset}.txt")
        )

    use_flash = (args.mode == "spacetime") if args.flash is None else args.flash
    # fused MHA: forward-path win (the chain's self-attn keeps splash).
    # fused GEGLU FF: wins serving AND in-chain (A/B in docs/BENCHMARKS.md
    # round 3) — default-on in every mode.
    use_mha = (args.mode != "spacetime") if args.mha is None else args.mha
    use_fused_ff = True if args.fused_ff is None else args.fused_ff
    if args.tiny:
        from diffusion_spacetime_attn_tpu.config import (
            CLIPConfig,
            CLIPTextConfig,
            CLIPVisionConfig,
        )

        cfg = PipelineConfig(
            unet=UNetConfig(model_channels=32, channel_mult=(1, 2),
                            num_res_blocks=1, attention_resolutions=(1, 2),
                            num_heads=2, context_dim=16),
            vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
            text_encoder=CLIPTextConfig(width=16, layers=2, heads=2,
                                        vocab_size=49408, max_len=7),
            loss_clip=CLIPConfig(
                vision=CLIPVisionConfig(image_size=14, patch_size=7, width=16,
                                        layers=2, heads=2, projection_dim=8),
                text=CLIPTextConfig(width=16, layers=2, heads=2,
                                    vocab_size=49408, max_len=7),
                projection_dim=8,
            ),
            spacetime=SpaceTimeConfig(num_steps=args.steps, latent_size=16,
                                      image_size=32, epochs=2),
        )
    else:
        cfg = PipelineConfig(
            unet=UNetConfig(dtype=args.dtype, use_flash=use_flash,
                            use_mha=use_mha, use_fused_ff=use_fused_ff,
                            attn_scores_dtype=args.scores_dtype),
            vae=VAEConfig(dtype=args.dtype),
            spacetime=SpaceTimeConfig(num_steps=args.steps),
        )
    sd = load_stable_diffusion(cfg, args.ckpt)
    if args.params_dtype != "float32":
        import dataclasses as _dc

        from diffusion_spacetime_attn_tpu.utils.loader import cast_params

        sd = _dc.replace(
            sd,
            unet_params=cast_params(sd.unet_params, args.params_dtype),
            vae_params=cast_params(sd.vae_params, args.params_dtype),
            text_params=cast_params(sd.text_params, args.params_dtype),
        )
        print(f"params cast to {args.params_dtype}")
    clip_loss = None
    if args.mode == "spacetime":
        # the DCLIP loss model is only on the tape in spacetime mode; keep
        # it off-chip otherwise (HBM headroom for larger prompt batches)
        clip_model = CLIP(cfg.loss_clip)
        if args.clip_ckpt:
            clip_params = convert.convert_openai_clip(
                convert.load_torch_checkpoint(args.clip_ckpt)
            )
        else:
            # on-device generation: host numpy params re-transfer through
            # the tunnel on every jitted call (see utils/loader.py)
            clip_params = randomize_params_on_device(
                jax.eval_shape(
                    clip_model.init, jax.random.PRNGKey(0),
                    jnp.zeros((1, clip_model.cfg.vision.image_size,
                               clip_model.cfg.vision.image_size, 3)),
                    jnp.zeros((1, clip_model.cfg.text.max_len), jnp.int32),
                )["params"],
                jax.random.PRNGKey(9),
            )
        if args.params_dtype != "float32":
            from diffusion_spacetime_attn_tpu.utils.loader import cast_params

            clip_params = cast_params(clip_params, args.params_dtype)
        clip_loss = DCLIPLoss(clip_model, clip_params)
    lcfg = (LayoutConfig(hidden=32, layers=2, heads=2, ffn_dim=64, max_len=32)
            if args.tiny else LayoutConfig())
    if args.layout_ckpt is None and not args.tiny:
        from diffusion_spacetime_attn_tpu.utils.loader import (
            find_default_layout_checkpoint,
        )

        args.layout_ckpt = find_default_layout_checkpoint()
        if args.layout_ckpt:
            print(f"using trained layout checkpoint: {args.layout_ckpt}")
    lmodel, lparams = load_layout_predictor(lcfg, args.layout_ckpt)
    layout = LayoutInference(lmodel, lparams, make_roberta_tokenizer())
    ctok = make_clip_tokenizer(args.clip_vocab, max_len=cfg.text_encoder.max_len)
    tokenize = (
        ctok.tokenize if hasattr(ctok, "tokenize")
        else (lambda t: ctok.pad_to(ctok.encode(t), cfg.text_encoder.max_len))
    )
    runner = PromptRunner(
        sd=sd, clip_loss=clip_loss, layout=layout,
        clip_tokenize=tokenize, text_tokenize=tokenize,
        cfg=cfg.spacetime, outdir=args.outdir, mode=args.mode,
        sampler=args.sampler, save_epoch_images=args.save_epochs,
    )

    manifest_path = os.path.join(args.outdir, f"manifest_{args.dataset}.json")
    done = set()
    if args.resume and os.path.exists(manifest_path):
        done = set(json.load(open(manifest_path))["done"])
        print(f"resuming: {len(done)} prompts already complete")
    os.makedirs(args.outdir, exist_ok=True)
    log = JsonLogger(os.path.join(args.outdir, "run_log.jsonl"))

    end = min(args.end or len(prompts), len(prompts))
    todo = [i for i in range(args.start, end) if i not in done]
    import time

    if args.batch_size > 1:
        from diffusion_spacetime_attn_tpu.pipeline.batch_runner import BatchedRunner

        br = BatchedRunner(runner, batch_size=args.batch_size)
        t0 = time.perf_counter()

        def checkpoint(chunk):
            # per-chunk manifest update: a killed sweep resumes losing at
            # most one batch
            done.update(chunk)
            json.dump({"done": sorted(done)}, open(manifest_path, "w"))

        produced = br.run(prompts, indices=todo, seed=args.seed, log=log,
                          on_chunk_done=checkpoint)
        log.log("sweep_done", produced=produced,
                seconds=round(time.perf_counter() - t0, 3))
    else:
        for idx in todo:
            t0 = time.perf_counter()
            img = runner.run_one(prompts[idx], idx, args.seed)
            log.log(
                "prompt_done", idx=idx, ok=img is not None,
                seconds=round(time.perf_counter() - t0, 3),
            )
            done.add(idx)
            json.dump({"done": sorted(done)}, open(manifest_path, "w"))
    print(f"sweep complete: {len(done)} prompts")


if __name__ == "__main__":
    main()
