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
    ap.add_argument("--params-dtype", default=None,
                    help="cast model params (default: bfloat16 in spacetime "
                         "mode — the ~1.7 GB saver that keeps full-method "
                         "serving off the HBM edge, docs/SERVING.md; "
                         "float32 elsewhere). Pass float32 to override.")
    ap.add_argument("--soak", type=int, default=None, metavar="N",
                    help="after warmup, run N sequential requests through "
                         "the engine (varying prompts+seeds), print one "
                         "JSON line per batch and a summary, then exit — "
                         "the zero-OOM serving soak (docs/SERVING.md)")
    ap.add_argument("--loadtest", type=int, default=None, metavar="N",
                    help="after warmup, run the open-loop tail-latency load "
                         "test (serving/loadtest.py): N requests per rate "
                         "stage through the BatchingService, print the "
                         "p50/p95/p99 + queue-depth + saturation artifact "
                         "as JSON, then exit (docs/SERVING.md)")
    ap.add_argument("--loadtest-fractions", default="0.5,0.8,1.0,1.3",
                    help="comma-separated offered-rate fractions of the "
                         "measured single-batch capacity")
    ap.add_argument("--loadtest-out", default=None,
                    help="also write the loadtest artifact to this path")
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
    # bf16 params by default in spacetime mode: f32 params put b2
    # full-method serving at the HBM edge (intermittent ResourceExhausted,
    # docs/SERVING.md); the cast saves ~1.7 GB and is A/B'd for numerics
    # drift in docs/BENCHMARKS.md round 4
    params_dtype = args.params_dtype or (
        "bfloat16" if args.mode == "spacetime" else "float32")
    if params_dtype != "float32":
        import dataclasses as _dc

        from diffusion_spacetime_attn_tpu.utils.loader import cast_params

        sd = _dc.replace(
            sd,
            unet_params=cast_params(sd.unet_params, params_dtype),
            vae_params=cast_params(sd.vae_params, params_dtype),
            text_params=cast_params(sd.text_params, params_dtype),
        )
        logger.info("params cast to %s", params_dtype)

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
            if params_dtype != "float32":
                from diffusion_spacetime_attn_tpu.utils.loader import (
                    cast_params,
                )

                clip_params = cast_params(clip_params, params_dtype)
            clip_loss = DCLIPLoss(clip_model, clip_params)

        lcfg = LayoutConfig()
        if args.layout_ckpt is None and not args.tiny:
            from diffusion_spacetime_attn_tpu.utils.loader import (
                find_default_layout_checkpoint,
            )

            args.layout_ckpt = find_default_layout_checkpoint()
            if args.layout_ckpt:
                logger.info("using trained layout checkpoint: %s",
                            args.layout_ckpt)
        lmodel, lparams = load_layout_predictor(lcfg, args.layout_ckpt)
        layout = LayoutInference(lmodel, lparams, make_roberta_tokenizer())
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
    if args.loadtest:
        import json as _json

        from diffusion_spacetime_attn_tpu.serving.loadtest import run_loadtest

        artifact = run_loadtest(
            engine,
            capacity_fractions=tuple(
                float(x) for x in args.loadtest_fractions.split(",")),
            stage_requests=args.loadtest,
            max_wait_s=args.max_wait,
            max_queue=args.max_queue,
            request_timeout_s=args.request_timeout,
        )
        artifact.update(mode=args.mode, sampler=args.sampler,
                        params_dtype=params_dtype, steps=args.steps)
        out = _json.dumps(artifact, indent=2)
        print(out, flush=True)
        if args.loadtest_out:
            with open(args.loadtest_out, "w") as f:
                f.write(out + "\n")
        return
    if args.soak:
        import json as _json
        import time as _time

        prompts = ["a cat above a dog", "a bird to the left of a car",
                   "an apple on top of a laptop", "a clock above a bed",
                   "a dog to the right of a horse", "a vase next to a book"]
        done, t_all = 0, _time.perf_counter()
        batch_times, batch_sizes = [], []
        while done < args.soak:
            n = min(args.batch, args.soak - done)
            batch_prompts = [prompts[(done + i) % len(prompts)]
                             for i in range(n)]
            seeds = [1000 + done + i for i in range(n)]
            t0 = _time.perf_counter()
            imgs = engine.generate_batch(batch_prompts, seeds)
            dt = _time.perf_counter() - t0
            batch_times.append(dt)
            batch_sizes.append(n)
            done += n
            print(_json.dumps({
                "soak_batch": len(batch_times), "requests_done": done,
                "n": n, "seconds": round(dt, 2),
                "img_shape": list(imgs.shape)}), flush=True)
        print(_json.dumps({
            "soak_ok": True, "mode": args.mode, "batch_size": args.batch,
            "params_dtype": params_dtype, "requests": done,
            "batches": len(batch_times),
            "total_seconds": round(_time.perf_counter() - t_all, 1),
            # steady per-request time from FULL batches only: the
            # remainder batch (soak %% batch != 0) is the fastest wall-clock
            # batch and dividing it by args.batch understates the number.
            "s_per_request_steady": round(min(full), 2) if (full := [
                dt / n for dt, n in zip(batch_times, batch_sizes)
                if n == args.batch]) else None,
        }), flush=True)
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
