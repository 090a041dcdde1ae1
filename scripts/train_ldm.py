#!/usr/bin/env python
"""LDM (UNet) training CLI — TPU-native equivalent of the reference's
Lightning harness (`attention_optimization/stable-diffusion/main.py`).

The reference trains latent-diffusion models from OmegaConf configs over
image datasets with a GPU Lightning Trainer; here: one jitted data-parallel
train step over a `Mesh(('data',))` (batch sharded, params replicated,
GSPMD gradient all-reduce over ICI), orbax checkpoints, resume.

Data: a directory of images with a `captions.jsonl` ({"file":…, "text":…}
per line), or --synthetic for a smoke run on random latents.  Images are
VAE-encoded and captions CLIP-encoded on device, exactly the reference's
first/cond-stage `get_input` path (`ddpm.py:560-`).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None,
                    help="directory with images + captions.jsonl")
    ap.add_argument("--synthetic", action="store_true",
                    help="random latents/contexts (smoke/benchmark mode)")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=4, help="per device")
    ap.add_argument("--base-lr", type=float, default=1e-4)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--no-ema", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--ckpt-dir", default="saved/ldm")
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--resume-step", type=int, default=None)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--unet-ckpt", default=None,
                    help="warm start from sd-v1-4 (CompVis ckpt or HF dir)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny UNet (CI/CPU smoke)")
    ap.add_argument("--conditioning", default="text",
                    choices=["text", "class", "superres", "none"],
                    help="text: CLIP cross-attn (SD-style, default); "
                         "class: trained ClassEmbedder context (cin256-style, "
                         "cond_stage_trainable); superres: LR image concat on "
                         "the input channels (ImageNetSR-style, BSRGAN-light "
                         "degradation in synthetic mode); none: unconditional")
    ap.add_argument("--num-classes", type=int, default=1000)
    ap.add_argument("--fsdp", action="store_true",
                    help="shard weights + Adam moments + EMA over the data "
                         "axis (ZeRO-style; ~ndev x less state memory per "
                         "chip, GSPMD gathers at use)")
    ap.add_argument("--sr-factor", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_spacetime_attn_tpu.config import (
        LDMTrainConfig, PipelineConfig, ScheduleConfig, UNetConfig, VAEConfig,
    )
    from diffusion_spacetime_attn_tpu.models.unet import UNet
    from diffusion_spacetime_attn_tpu.ops.schedule import make_schedule
    from diffusion_spacetime_attn_tpu.parallel.mesh import make_mesh
    from diffusion_spacetime_attn_tpu.training.ldm_trainer import LDMTrainer
    from diffusion_spacetime_attn_tpu.utils.cache import enable_compilation_cache
    from diffusion_spacetime_attn_tpu.utils.profiling import JsonLogger, get_logger

    enable_compilation_cache()
    logger = get_logger("train_ldm")

    # superres concatenates the LR conditioning image on the input channels
    # (the reference's conditioning_key='concat' ImageNetSR configs)
    in_ch = 4 + (3 if args.conditioning == "superres" else 0)
    if args.tiny:
        unet_cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                              num_res_blocks=1, attention_resolutions=(1, 2),
                              num_heads=2, context_dim=16, dtype=args.dtype,
                              in_channels=in_ch)
        latent_hw, ctx_shape = 16, (7, 16)
    else:
        unet_cfg = UNetConfig(dtype=args.dtype, in_channels=in_ch)
        latent_hw, ctx_shape = 64, (77, 768)
    if args.conditioning == "class":
        ctx_shape = (1,)                       # class id per sample
    elif args.conditioning == "superres":
        ctx_shape = (latent_hw, latent_hw, 3)  # LR image at latent resolution
    elif args.conditioning == "none":
        ctx_shape = (1,)                       # ignored placeholder

    sched_cfg = ScheduleConfig()
    schedule = make_schedule(sched_cfg, 50)
    train_cfg = LDMTrainConfig(
        batch_size=args.batch_size, base_lr=args.base_lr,
        accum_steps=args.accum, use_ema=not args.no_ema,
    )

    unet = UNet(unet_cfg, radius=0.2)

    if args.conditioning == "text":
        def eps_model(params, x, t, context):
            return unet.apply({"params": params}, x, t, context)
    elif args.conditioning == "class":
        # class embedder trained jointly with the UNet (the reference's
        # cond_stage_trainable ClassEmbedder, `encoders/modules.py:21-33`)
        from diffusion_spacetime_attn_tpu.models.encoders import ClassEmbedder

        class_embed = ClassEmbedder(n_classes=args.num_classes,
                                    embed_dim=unet_cfg.context_dim)

        def eps_model(params, x, t, context):
            ctx = class_embed.apply({"params": params["cond"]},
                                    context[:, 0].astype(jnp.int32))
            return unet.apply({"params": params["unet"]}, x, t, ctx)
    elif args.conditioning == "superres":
        def eps_model(params, x, t, context):
            # concat conditioning (`DiffusionWrapper` conditioning_key
            # 'concat'): LR image stacked on the noisy-latent channels
            return unet.apply(
                {"params": params},
                jnp.concatenate([x, context.astype(x.dtype)], axis=-1), t, None)
    else:  # none
        def eps_model(params, x, t, context):
            return unet.apply({"params": params}, x, t, None)

    ndev = len(jax.devices())
    mesh = make_mesh(data=ndev) if ndev > 1 else None
    ctx_rank = {"text": 3, "class": 2, "superres": 4, "none": 2}[args.conditioning]
    if args.fsdp and mesh is None:
        logger.warning("--fsdp ignored: single device (no mesh to shard "
                       "state over) — training runs fully replicated")
    trainer = LDMTrainer(train_cfg, sched_cfg, schedule, eps_model,
                         mesh=mesh, ckpt_dir=args.ckpt_dir,
                         context_rank=ctx_rank,
                         fsdp=args.fsdp and mesh is not None)
    logger.info("devices=%d lr=%.2e (scaled)", ndev, trainer.lr)

    # ---- params ----
    B = args.batch_size * ndev
    x_spec = jnp.zeros((B, latent_hw, latent_hw, in_ch))
    t_spec = jnp.zeros((B,), jnp.int32)
    c_spec = (None if args.conditioning in ("superres", "none")
              else jnp.zeros((B,) + ctx_shape))
    if args.conditioning == "class":
        c_spec = jnp.zeros((B, 1, unet_cfg.context_dim))
    if args.unet_ckpt:
        from diffusion_spacetime_attn_tpu.utils import convert

        state_dict = convert.load_torch_checkpoint(args.unet_ckpt)
        params = convert.convert_sd_unet(
            state_dict,
            channel_mult=unet_cfg.channel_mult,
            num_res_blocks=unet_cfg.num_res_blocks,
            attention_ds=unet_cfg.attention_resolutions,
        )
    else:
        params = unet.init(jax.random.PRNGKey(0), x_spec, t_spec, c_spec)["params"]
    if args.conditioning == "class":
        params = {
            "unet": params,
            "cond": class_embed.init(
                jax.random.PRNGKey(1), jnp.zeros((1,), jnp.int32))["params"],
        }

    state = trainer.init(params)
    start = 0
    if args.resume_step is not None:
        state = trainer.restore(args.resume_step, state)
        start = args.resume_step
        logger.info("resumed from step %d", start)

    # ---- data ----
    if args.synthetic or not args.data_dir:
        if args.conditioning == "superres":
            from diffusion_spacetime_attn_tpu.training.degradation import (
                degradation_bsrgan_light,
            )

            def next_batch(i):
                r = np.random.RandomState(i)
                # synthetic HQ image → real BSRGAN-light LR conditioning
                hq = r.rand(B, latent_hw * args.sr_factor,
                            latent_hw * args.sr_factor, 3).astype(np.float32)
                lrs = np.stack([
                    degradation_bsrgan_light(hq[b], sf=args.sr_factor,
                                             seed=i * B + b)[0]
                    for b in range(B)
                ])
                return (jnp.asarray(r.randn(B, latent_hw, latent_hw, 4),
                                    jnp.float32),
                        jnp.asarray(lrs * 2.0 - 1.0, jnp.float32))
        elif args.conditioning == "class":
            def next_batch(i):
                r = np.random.RandomState(i)
                return (jnp.asarray(r.randn(B, latent_hw, latent_hw, 4),
                                    jnp.float32),
                        jnp.asarray(
                            r.randint(0, args.num_classes, (B, 1)), jnp.float32))
        elif args.conditioning == "none":
            def next_batch(i):
                r = np.random.RandomState(i)
                return (jnp.asarray(r.randn(B, latent_hw, latent_hw, 4),
                                    jnp.float32),
                        jnp.zeros((B, 1), jnp.float32))
        else:
            def next_batch(i):
                r = np.random.RandomState(i)
                return (jnp.asarray(r.randn(B, latent_hw, latent_hw, 4), jnp.float32),
                        jnp.asarray(r.randn(B, *ctx_shape), jnp.float32))
    elif args.conditioning == "class":
        # ImageNet-style extracted tree (`ldm/data/imagenet.py` semantics):
        # {data_dir}/{synset}/*.JPEG, class id = sorted-synset index
        from diffusion_spacetime_attn_tpu.pipeline.pipeline import StableDiffusion
        from diffusion_spacetime_attn_tpu.training.image_data import imagenet_tree

        import dataclasses as _dc

        pipe_cfg = PipelineConfig(unet=unet_cfg, vae=VAEConfig(dtype=args.dtype))
        sd = StableDiffusion.create(pipe_cfg, jax.random.PRNGKey(0))
        # params as jit ARGUMENTS (closing over them inlines them into the
        # remote-compile request over the tunnel — see CLAUDE.md)
        encode_images = jax.jit(
            lambda vp, imgs, rng: _dc.replace(sd, vae_params=vp)
            .encode_images(imgs, rng))
        ds = imagenet_tree(args.data_dir, size=latent_hw * 8)
        it = ds.batches(B, seed=0)

        def next_batch(i):
            imgs, labels = next(it)
            z = encode_images(sd.vae_params, jnp.asarray(imgs),
                              jax.random.PRNGKey(i))
            return z, jnp.asarray(labels[:, None], jnp.float32)
    else:
        if args.conditioning != "text":
            raise SystemExit(
                f"--data-dir loading implements text and class conditioning; "
                f"use --synthetic with --conditioning {args.conditioning} or "
                f"add a loader for that mode")
        from PIL import Image

        from diffusion_spacetime_attn_tpu.pipeline.pipeline import StableDiffusion
        from diffusion_spacetime_attn_tpu.utils.tokenizer import make_clip_tokenizer

        pipe_cfg = PipelineConfig(unet=unet_cfg, vae=VAEConfig(dtype=args.dtype))
        sd = StableDiffusion.create(pipe_cfg, jax.random.PRNGKey(0))
        ctok = make_clip_tokenizer()
        tokenize = (
            ctok.tokenize if hasattr(ctok, "tokenize")
            else (lambda t: ctok.pad_to(ctok.encode(t), 77))
        )
        import dataclasses as _dc

        rows = [json.loads(l) for l in
                open(os.path.join(args.data_dir, "captions.jsonl"))]
        # params as jit ARGUMENTS (see CLAUDE.md: never close params over jit)
        encode_images = jax.jit(
            lambda vp, imgs, rng: _dc.replace(sd, vae_params=vp)
            .encode_images(imgs, rng))
        encode_text = jax.jit(
            lambda tp, ids: _dc.replace(sd, text_params=tp).encode_text(ids))

        def next_batch(i):
            r = np.random.RandomState(i)
            pick = [rows[j] for j in r.randint(0, len(rows), B)]
            imgs = np.stack([
                np.asarray(
                    Image.open(os.path.join(args.data_dir, p["file"]))
                    .convert("RGB").resize((512, 512))
                ) / 127.5 - 1.0
                for p in pick
            ]).astype(np.float32)
            ids = np.stack([tokenize(p["text"]) for p in pick]).astype(np.int32)
            z = encode_images(sd.vae_params, jnp.asarray(imgs),
                              jax.random.PRNGKey(i))
            ctx = encode_text(sd.text_params, jnp.asarray(ids))
            return z, ctx

    # ---- loop ----
    os.makedirs(args.ckpt_dir, exist_ok=True)
    jlog = JsonLogger(os.path.join(args.ckpt_dir, "train_log.jsonl"))
    key = jax.random.PRNGKey(42)
    for i in range(start, args.steps):
        x0, ctx = next_batch(i)
        state, metrics = trainer.train_step(state, x0, ctx, jax.random.fold_in(key, i))
        if (i + 1) % args.log_every == 0 or i == start:
            m = {k: float(v) for k, v in metrics.items()}
            logger.info("step %d %s", i + 1, m)
            jlog.log("ldm_train_step", step=i + 1, **m)
        if (args.ckpt_every and (i + 1) % args.ckpt_every == 0) or i + 1 == args.steps:
            trainer.save(state, i + 1)
            logger.info("checkpoint @ %d", i + 1)


if __name__ == "__main__":
    main()
