#!/usr/bin/env python
"""Capture a jax.profiler trace of one pipeline program.

The reference has no profiling story (SURVEY §5: ad-hoc time.time spans);
here: run N steady-state iterations of the chosen mode under
`jax.profiler.trace` and write a TensorBoard/Perfetto trace directory.

  python scripts/profiler.py --mode vanilla --batch 8 --steps 50
  tensorboard --logdir /tmp/dsta_trace   (or upload to ui.perfetto.dev)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["vanilla", "spatial", "spacetime"],
                    default="vanilla")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sampler", choices=["plms", "ddim", "dpm"], default="plms")
    ap.add_argument("--iters", type=int, default=2,
                    help="traced steady-state iterations (compile excluded)")
    ap.add_argument("--trace-dir", default="/tmp/dsta_trace")
    ap.add_argument("--tiny", action="store_true", help="tiny model (CPU smoke)")
    ap.add_argument("--hlo-out", default=None,
                    help="also write the optimized HLO text of the traced "
                         "program (compiled.as_text(); XLA_FLAGS dump flags "
                         "kill the axon plugin) — feed to "
                         "analyze_trace.py --hlo for source-level attribution")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_spacetime_attn_tpu.config import (
        CLIPTextConfig, PipelineConfig, SpaceTimeConfig, UNetConfig, VAEConfig,
    )
    from diffusion_spacetime_attn_tpu.ops.attention import SpatialControl
    from diffusion_spacetime_attn_tpu.pipeline.pipeline import StableDiffusion
    from diffusion_spacetime_attn_tpu.utils.cache import enable_compilation_cache
    from diffusion_spacetime_attn_tpu.utils.profiling import get_logger, trace
    from diffusion_spacetime_attn_tpu.utils.testing import (
        randomize_params_on_device,
    )

    enable_compilation_cache()
    logger = get_logger("profile")

    if args.tiny:
        cfg = PipelineConfig(
            unet=UNetConfig(model_channels=32, channel_mult=(1, 2),
                            num_res_blocks=1, attention_resolutions=(1, 2),
                            num_heads=2, context_dim=16),
            vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
            text_encoder=CLIPTextConfig(width=16, layers=2, heads=2,
                                        vocab_size=100, max_len=7),
            spacetime=SpaceTimeConfig(num_steps=4, latent_size=16,
                                      image_size=32),
        )
    else:
        cfg = PipelineConfig(
            unet=UNetConfig(dtype="bfloat16", attn_scores_dtype="bfloat16",
                            use_flash=args.mode == "spacetime",
                            use_mha=args.mode != "spacetime",
                            use_fused_ff=args.mode != "spacetime"),
            vae=VAEConfig(dtype="bfloat16"),
            spacetime=SpaceTimeConfig(num_steps=args.steps),
        )

    sd = StableDiffusion.create(cfg, jax.random.PRNGKey(0), abstract=True)
    sd = dataclasses.replace(
        sd,
        unet_params=randomize_params_on_device(sd.unet_params, jax.random.PRNGKey(1)),
        vae_params=randomize_params_on_device(sd.vae_params, jax.random.PRNGKey(2)),
    )
    from diffusion_spacetime_attn_tpu.ops.schedule import make_schedule

    sd = dataclasses.replace(sd, schedule=make_schedule(cfg.schedule, args.steps))

    B, N, L, D = args.batch, 4, cfg.text_encoder.max_len, cfg.unet.context_dim
    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.randn(B, L, D) * 0.02, jnp.float32)
    uncond = jnp.asarray(rng.randn(B, L, D) * 0.02, jnp.float32)
    control = None
    coef = None
    if args.mode in ("spatial", "spacetime"):
        control = SpatialControl(
            local_contexts=jnp.asarray(rng.randn(B, N, L, D) * 0.02, jnp.float32),
            centers=jnp.asarray(rng.rand(B, N, 2), jnp.float32),
            coef=jnp.full((B, N), 1.25, jnp.float32),
            active=jnp.ones((B, N), jnp.float32),
        )
        coef = jnp.full((B, N, args.steps), 1.25, jnp.float32)

    params = (sd.unet_params, sd.vae_params)
    lat = cfg.spacetime.latent_size

    if args.mode == "spacetime":
        def run(ps, key, coef):
            s = dataclasses.replace(sd, unet_params=ps[0], vae_params=ps[1])
            eps = s.make_eps_fn(cond, uncond, 7.5, control, coef)
            z = s.sample_from(eps, jax.random.normal(
                key, (B, lat, lat, 4), jnp.float32), args.sampler, remat=True)
            return jnp.sum(s.decode_latents(z))

        fn = jax.jit(jax.value_and_grad(run, argnums=2))
        call = lambda k: fn(params, k, coef)
    else:
        def run(ps, key):
            s = dataclasses.replace(sd, unet_params=ps[0], vae_params=ps[1])
            eps = s.make_eps_fn(cond, uncond, 7.5, control, coef)
            z = s.sample_from(eps, jax.random.normal(
                key, (B, lat, lat, 4), jnp.float32), args.sampler, remat=False)
            return s.decode_latents(z)

        fn = jax.jit(run)
        call = lambda k: fn(params, k)

    logger.info("compiling…")
    jax.block_until_ready(call(jax.random.PRNGKey(0)))
    if args.hlo_out:
        if args.mode == "spacetime":
            compiled = fn.lower(params, jax.random.PRNGKey(0), coef).compile()
        else:
            compiled = fn.lower(params, jax.random.PRNGKey(0)).compile()
        with open(args.hlo_out, "w") as f:
            f.write(compiled.as_text())
        logger.info("optimized HLO → %s", args.hlo_out)
    logger.info("tracing %d iterations → %s", args.iters, args.trace_dir)
    with trace(args.trace_dir):
        for i in range(args.iters):
            jax.block_until_ready(call(jax.random.PRNGKey(i + 1)))
    logger.info("done — view with tensorboard --logdir %s", args.trace_dir)


if __name__ == "__main__":
    main()
