#!/usr/bin/env python
"""First-stage autoencoder training CLI — the reference trains its
AutoencoderKL via `main.py` with `configs/autoencoder/autoencoder_kl_*.yaml`
and taming's LPIPSWithDiscriminator; here: `training/vae_trainer.py`
(LPIPS + KL + PatchGAN, adaptive adversarial weight, one jitted step doing
both optimizer updates) with orbax checkpoints.

Data: a directory of images, or --synthetic for random-image smoke runs.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--paths-txt", default=None,
                    help="LSUN-style split file of relative image paths "
                         "under --data-dir (ldm/data/lsun.py)")
    ap.add_argument("--flip-p", type=float, default=0.5)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--base-lr", type=float, default=4.5e-6)
    ap.add_argument("--fsdp", action="store_true",
                    help="shard AE+disc weights and both Adam states over "
                         "the data axis (ZeRO-style; multi-device only)")
    ap.add_argument("--kl-weight", type=float, default=1e-6)
    ap.add_argument("--disc-start", type=int, default=50001)
    ap.add_argument("--disc-weight", type=float, default=0.5)
    ap.add_argument("--lpips-ckpt", default=None,
                    help="torch LPIPS/VGG weights (random without: smoke)")
    ap.add_argument("--ckpt-dir", default="saved/vae")
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--tiny", action="store_true", help="tiny model (CI/CPU)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_spacetime_attn_tpu.config import VAEConfig
    from diffusion_spacetime_attn_tpu.models.vae import AutoencoderKL
    from diffusion_spacetime_attn_tpu.training.vae_trainer import (
        VAETrainConfig, VAETrainer,
    )
    from diffusion_spacetime_attn_tpu.utils.cache import enable_compilation_cache
    from diffusion_spacetime_attn_tpu.utils.profiling import JsonLogger, get_logger

    enable_compilation_cache()
    logger = get_logger("train_vae")

    if args.tiny:
        vcfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                         z_channels=2, embed_dim=2)
        hw = 32
    else:
        vcfg = VAEConfig()
        hw = args.image_size

    vae = AutoencoderKL(vcfg)
    cfg = VAETrainConfig(base_lr=args.base_lr, kl_weight=args.kl_weight,
                         disc_start=args.disc_start,
                         disc_weight=args.disc_weight,
                         disc_ndf=8 if args.tiny else 64,
                         disc_layers=2 if args.tiny else 3,
                         perceptual_weight=0.0 if (args.tiny and not args.lpips_ckpt)
                         else 1.0)
    ndev = len(jax.devices())
    if ndev > 1:
        from diffusion_spacetime_attn_tpu.parallel.mesh import make_mesh

        trainer = VAETrainer(vae, cfg, mesh=make_mesh(data=ndev),
                             fsdp=args.fsdp)
        logger.info("data-parallel over %d devices", ndev)
    else:
        trainer = VAETrainer(vae, cfg)
    state = trainer.init(jax.random.PRNGKey(0), image_hw=hw)

    B = args.batch_size * ndev  # per-device batch semantics (like train_ldm)
    if args.synthetic or not (args.data_dir or args.paths_txt):
        def next_batch(i):
            r = np.random.RandomState(i % 37)
            return jnp.asarray(r.rand(B, hw, hw, 3) * 2 - 1, jnp.float32)
    else:
        # LSUN-style pipeline (`ldm/data/lsun.py` semantics): txt split or
        # directory listing → center-crop/resize/flip → [-1, 1]
        from diffusion_spacetime_attn_tpu.training.image_data import (
            ImagePathsDataset,
            lsun_split,
        )

        if args.paths_txt:
            ds = lsun_split(args.paths_txt, args.data_dir or ".", size=hw,
                            flip_p=args.flip_p)
        else:
            files = sorted(
                os.path.join(args.data_dir, f)
                for f in os.listdir(args.data_dir)
                if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
            )
            ds = ImagePathsDataset(paths=files, size=hw, flip_p=args.flip_p)
        it = ds.batches(B, seed=0)

        def next_batch(i):
            return jnp.asarray(next(it)[0], jnp.float32)

    os.makedirs(args.ckpt_dir, exist_ok=True)
    jlog = JsonLogger(os.path.join(args.ckpt_dir, "metrics.jsonl"))
    for i in range(args.steps):
        state, m = trainer.train_step(state, next_batch(i),
                                      jax.random.PRNGKey(i))
        if i % args.log_every == 0:
            vals = {k: float(v) for k, v in m.items()}
            logger.info("step %d %s", i, vals)
            jlog.log("train_vae", step=i, **vals)
        if args.ckpt_every and (i + 1) % args.ckpt_every == 0:
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(
                    os.path.abspath(f"{args.ckpt_dir}/step_{i + 1}"),
                    jax.tree_util.tree_map(np.asarray,
                                           state._asdict() | {}),
                )
            logger.info("checkpointed step %d", i + 1)


if __name__ == "__main__":
    main()
