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
    ap.add_argument("--mode", choices=["vanilla", "spatial", "spacetime"],
                    default="vanilla",
                    help="spatial: layout-predicted per-object attention "
                         "control; spacetime: full per-request temporal "
                         "weight optimization (grads through the chain)")
    ap.add_argument("--layout-ckpt", default=None)
    ap.add_argument("--clip-ckpt", default=None,
                    help="OpenAI CLIP ViT-B/32 weights for the spacetime "
                         "fidelity loss (random without: smoke mode)")
    ap.add_argument("--sampler", choices=["plms", "ddim", "dpm"], default="plms")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=7.5)
    ap.add_argument("--max-wait", type=float, default=0.2,
                    help="seconds to wait filling a batch")
    ap.add_argument("--max-queue", type=int, default=None,
                    help="bounded request queue size (default 8x batch); "
                         "full queue -> HTTP 503")
    ap.add_argument("--request-timeout", type=float, default=None,
                    help="seconds a request may wait in the queue before it "
                         "is expired (HTTP 504)")
    ap.add_argument("--warmup-only", action="store_true",
                    help="compile the serving program (populating the "
                         "persistent cache at /tmp/dsta_jax_cache) and exit "
                         "— run this before routing traffic so the spacetime "
                         "engine's cold compile (~20 min) never blocks a "
                         "request")
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
        from diffusion_spacetime_attn_tpu.config import (
            CLIPConfig, CLIPVisionConfig,
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
            spacetime=SpaceTimeConfig(num_steps=4, latent_size=16,
                                      image_size=32, epochs=2),
        )
    else:
        cfg = PipelineConfig(
            unet=UNetConfig(dtype=args.dtype, attn_scores_dtype=args.scores_dtype,
                            # splash: 1.8x faster grad chain, batches to 8;
                            # fused MHA: forward-only serving win (+3%)
                            use_flash=args.mode == "spacetime",
                            use_mha=args.mode != "spacetime",
                            use_fused_ff=args.mode != "spacetime"),
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
    host_runner = None
    if args.mode in ("spatial", "spacetime"):
        from diffusion_spacetime_attn_tpu.config import LayoutConfig
        from diffusion_spacetime_attn_tpu.pipeline.frontend import LayoutInference
        from diffusion_spacetime_attn_tpu.pipeline.runners import PromptRunner
        from diffusion_spacetime_attn_tpu.utils.loader import load_layout_predictor
        from diffusion_spacetime_attn_tpu.utils.tokenizer import (
            make_roberta_tokenizer,
        )

        clip_loss = None
        if args.mode == "spacetime":
            import jax.numpy as jnp

            from diffusion_spacetime_attn_tpu.models.clip import CLIP
            from diffusion_spacetime_attn_tpu.pipeline.losses import DCLIPLoss
            from diffusion_spacetime_attn_tpu.utils import convert
            from diffusion_spacetime_attn_tpu.utils.testing import (
                randomize_params_on_device,
            )

            clip_model = CLIP(cfg.loss_clip)
            if args.clip_ckpt:
                clip_params = convert.convert_openai_clip(
                    convert.load_torch_checkpoint(args.clip_ckpt))
            else:
                # on-device: host numpy params re-transfer per call
                clip_params = randomize_params_on_device(
                    jax.eval_shape(
                        clip_model.init, jax.random.PRNGKey(0),
                        jnp.zeros((1, clip_model.cfg.vision.image_size,
                                   clip_model.cfg.vision.image_size, 3)),
                        jnp.zeros((1, clip_model.cfg.text.max_len), jnp.int32),
                    )["params"],
                    jax.random.PRNGKey(9),
                )
                logger.info("no --clip-ckpt: random fidelity-loss CLIP (smoke)")
            clip_loss = DCLIPLoss(clip_model, clip_params)

        lcfg = LayoutConfig()
        lmodel, lparams = load_layout_predictor(lcfg, args.layout_ckpt)
        layout = LayoutInference(lmodel, lparams, make_roberta_tokenizer(),
                                 lcfg.max_len)
        host_runner = PromptRunner(
            sd=sd, clip_loss=clip_loss, layout=layout,
            clip_tokenize=tokenize, text_tokenize=tokenize,
            cfg=cfg.spacetime, mode=args.mode, sampler=args.sampler,
        )
        prepare_host = host_runner.prepare_host

    if args.mode == "spacetime":
        from diffusion_spacetime_attn_tpu.serving import SpaceTimeEngine

        engine = SpaceTimeEngine(
            runner=host_runner, batch_size=args.batch,
            watermark=args.watermark,
        )
    else:
        engine = TextToImageEngine(
            sd=sd, tokenize=tokenize, batch_size=args.batch,
            sampler=args.sampler, watermark=args.watermark,
            prepare_host=prepare_host,
        )
    logger.info("compiling batch-%d %s program…", args.batch, args.sampler)
    logger.info("warmup done in %.1fs", engine.warmup())
    if args.warmup_only:
        logger.info("--warmup-only: compile cache populated, exiting")
        return
    service = BatchingService(
        engine, max_wait_s=args.max_wait, max_queue=args.max_queue,
        request_timeout_s=args.request_timeout,
    ).start()
    logger.info("serving on %s:%d (POST /txt2img, GET /healthz)",
                args.host, args.port)
    serve(service, args.host, args.port)


if __name__ == "__main__":
    main()
