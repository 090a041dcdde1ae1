#!/usr/bin/env python
"""Serving CLI: HTTP txt2img with dynamic request batching.

The TPU-native deployment story the reference lacks (its "serving" is a
shell loop per GPU, `scripts/txt2img-gpt.py:303-305`): one shape-specialized
XLA program at a fixed batch size, a dynamic batcher packing concurrent
requests into it, per-request seeds reproducible regardless of batching.

  python scripts/serve.py --ckpt sd-v1-4.ckpt --batch 8 --sampler dpm \\
      --steps 20 --port 8000
  curl -X POST localhost:8000/txt2img -d '{"prompt":"a cat","seed":3}'
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mode", choices=["vanilla", "spatial"], default="vanilla",
                    help="spatial: layout-predicted per-object attention control")
    ap.add_argument("--layout-ckpt", default=None)
    ap.add_argument("--sampler", choices=["plms", "ddim", "dpm"], default="plms")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=7.5)
    ap.add_argument("--max-wait", type=float, default=0.2,
                    help="seconds to wait filling a batch")
    ap.add_argument("--ckpt", default=None, help="CompVis sd-v1-4 checkpoint")
    ap.add_argument("--clip-vocab", default=None)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--scores-dtype", default="bfloat16")
    ap.add_argument("--watermark", default=None, help="payload to embed")
    ap.add_argument("--tiny", action="store_true", help="tiny model smoke mode")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (the axon TPU plugin ignores JAX_PLATFORMS)")
    args = ap.parse_args()

    from diffusion_spacetime_attn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffusion_spacetime_attn_tpu.config import (
        CLIPTextConfig, PipelineConfig, SpaceTimeConfig, UNetConfig, VAEConfig,
    )
    from diffusion_spacetime_attn_tpu.serving import (
        BatchingService, TextToImageEngine, serve,
    )
    from diffusion_spacetime_attn_tpu.utils.loader import load_stable_diffusion
    from diffusion_spacetime_attn_tpu.utils.profiling import get_logger
    from diffusion_spacetime_attn_tpu.utils.tokenizer import make_clip_tokenizer

    logger = get_logger("serve")
    if args.tiny:
        cfg = PipelineConfig(
            unet=UNetConfig(model_channels=32, channel_mult=(1, 2),
                            num_res_blocks=1, attention_resolutions=(1, 2),
                            num_heads=2, context_dim=16),
            vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
            text_encoder=CLIPTextConfig(width=16, layers=2, heads=2,
                                        vocab_size=49408, max_len=7),
            spacetime=SpaceTimeConfig(num_steps=4, latent_size=16,
                                      image_size=32),
        )
    else:
        cfg = PipelineConfig(
            unet=UNetConfig(dtype=args.dtype, attn_scores_dtype=args.scores_dtype),
            vae=VAEConfig(dtype=args.dtype),
            spacetime=SpaceTimeConfig(num_steps=args.steps,
                                      guidance_scale=args.scale),
        )
    sd = load_stable_diffusion(cfg, args.ckpt)

    ctok = make_clip_tokenizer(args.clip_vocab,
                               max_len=cfg.text_encoder.max_len)
    tokenize = (
        ctok.tokenize if hasattr(ctok, "tokenize")
        else (lambda t: ctok.pad_to(ctok.encode(t), cfg.text_encoder.max_len))
    )

    prepare_host = None
    if args.mode == "spatial":
        from diffusion_spacetime_attn_tpu.config import LayoutConfig
        from diffusion_spacetime_attn_tpu.pipeline.frontend import LayoutInference
        from diffusion_spacetime_attn_tpu.pipeline.runners import PromptRunner
        from diffusion_spacetime_attn_tpu.utils.loader import load_layout_predictor
        from diffusion_spacetime_attn_tpu.utils.tokenizer import (
            make_roberta_tokenizer,
        )

        lcfg = LayoutConfig()
        lmodel, lparams = load_layout_predictor(lcfg, args.layout_ckpt)
        layout = LayoutInference(lmodel, lparams, make_roberta_tokenizer(),
                                 lcfg.max_len)
        host_runner = PromptRunner(
            sd=sd, clip_loss=None, layout=layout,
            clip_tokenize=tokenize, text_tokenize=tokenize,
            cfg=cfg.spacetime, mode="spatial",
        )
        prepare_host = host_runner.prepare_host

    engine = TextToImageEngine(
        sd=sd, tokenize=tokenize, batch_size=args.batch,
        sampler=args.sampler, watermark=args.watermark,
        prepare_host=prepare_host,
    )
    logger.info("compiling batch-%d %s program…", args.batch, args.sampler)
    logger.info("warmup done in %.1fs", engine.warmup())
    service = BatchingService(engine, max_wait_s=args.max_wait).start()
    logger.info("serving on %s:%d (POST /txt2img, GET /healthz)",
                args.host, args.port)
    serve(service, args.host, args.port)


if __name__ == "__main__":
    main()
