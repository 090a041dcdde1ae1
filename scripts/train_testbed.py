#!/usr/bin/env python
"""Train the closed-loop testbed models: tiny VAE + tiny CLIP + tiny LDM.

This produces the trained checkpoint that `scripts/method_eval_testbed.py`
uses to evidence the paper's core claim in-environment (VERDICT r4 #1):
that spacetime attention optimization (`plms.py:182-293`) improves object
recall / relation accuracy / CLIP fidelity over vanilla sampling.

Stages (each saves into --ckpt-dir and can run separately):
  data       build + cache the scene dataset (host, deterministic)
  vae        AutoencoderKL on 64×64 scenes (L1+KL; GAN/LPIPS off)
  clip       contrastive dual-tower CLIP on truthful captions (the judge)
  ldm        conditional UNet on VAE latents — captions carry NO positional
             information (scenes.py), so vanilla relation accuracy is chance
  calibrate  pick the vanilla guidance scale by validation recall
  all        everything in order

Every stage folds many optimizer steps into one jitted lax.scan chunk with
on-device batch gathering — over the TPU tunnel, per-step dispatch latency
would otherwise dominate these tiny models.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["data", "vae", "clip", "ldm", "calibrate", "all"])
    ap.add_argument("--ckpt-dir", default="saved/testbed")
    ap.add_argument("--data-cache", default="/tmp/testbed_scenes.npz")
    ap.add_argument("--scenes", type=int, default=8192)
    ap.add_argument("--data-seed", type=int, default=0)
    ap.add_argument("--vae-steps", type=int, default=4000)
    ap.add_argument("--vae-batch", type=int, default=128)
    ap.add_argument("--vae-lr", type=float, default=2e-4)
    ap.add_argument("--clip-steps", type=int, default=6000)
    ap.add_argument("--clip-batch", type=int, default=512)
    ap.add_argument("--clip-lr", type=float, default=1e-3)
    ap.add_argument("--ldm-steps", type=int, default=40000)
    ap.add_argument("--ldm-batch", type=int, default=512)
    ap.add_argument("--ldm-lr", type=float, default=3e-4)
    ap.add_argument("--ema-decay", type=float, default=0.9995)
    ap.add_argument("--uncond-drop", type=float, default=0.1)
    ap.add_argument("--chunk", type=int, default=100,
                    help="optimizer steps per jitted scan chunk")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses as dc

    import jax.numpy as jnp
    import numpy as np

    from diffusion_spacetime_attn_tpu.testbed import data as tbdata
    from diffusion_spacetime_attn_tpu.testbed import scenes as tbscenes
    from diffusion_spacetime_attn_tpu.testbed.bundle import save_bundle
    from diffusion_spacetime_attn_tpu.testbed.configs import (
        IMAGE_SIZE, testbed_clip_cfg, testbed_pipeline_cfg,
    )
    from diffusion_spacetime_attn_tpu.utils.cache import enable_compilation_cache
    from diffusion_spacetime_attn_tpu.utils.profiling import JsonLogger, get_logger

    enable_compilation_cache()
    logger = get_logger("train_testbed")
    os.makedirs(args.ckpt_dir, exist_ok=True)
    jlog = JsonLogger(os.path.join(args.ckpt_dir, "train_log.jsonl"))
    cfg = testbed_pipeline_cfg()

    # ---------------- data ----------------
    t0 = time.time()
    ds = tbdata.cached_dataset(
        args.data_cache, n_scenes=args.scenes, seed=args.data_seed,
        canvas=IMAGE_SIZE)
    logger.info("dataset: %d scenes, %d clip examples (%.1fs)",
                len(ds["images"]), len(ds["clip_images"]), time.time() - t0)
    if args.stage == "data":
        return

    stages = ([args.stage] if args.stage != "all"
              else ["vae", "clip", "ldm", "calibrate"])
    key = jax.random.PRNGKey(1234)

    def run_chunks(chunk_fn, state, total_steps, tag, extra_args=()):
        """Drive `total_steps` through jitted scan chunks, logging progress."""
        n_chunks = (total_steps + args.chunk - 1) // args.chunk
        last = None
        for c in range(n_chunks):
            state, ms = chunk_fn(state, *extra_args, jax.random.fold_in(key, c))
            if c % max(1, n_chunks // 20) == 0 or c == n_chunks - 1:
                last = {k: float(v[-1]) for k, v in ms.items()}
                logger.info("%s chunk %d/%d %s", tag, c + 1, n_chunks, last)
                jlog.log(f"{tag}_chunk", chunk=c + 1, **last)
        return state, last

    # ---------------- vae ----------------
    if "vae" in stages:
        from diffusion_spacetime_attn_tpu.models.vae import AutoencoderKL
        from diffusion_spacetime_attn_tpu.training.vae_trainer import (
            VAETrainConfig, VAETrainer,
        )

        vae = AutoencoderKL(cfg.vae)
        tcfg = VAETrainConfig(
            base_lr=args.vae_lr, perceptual_weight=0.0, disc_start=10 ** 9,
            disc_ndf=8, disc_layers=1, kl_weight=1e-6)
        trainer = VAETrainer(vae, tcfg)
        # lpips_params={}: perceptual_weight=0 never applies LPIPS, so skip
        # initializing a random VGG tower into the state
        state = trainer.init(jax.random.PRNGKey(0), image_hw=IMAGE_SIZE,
                             lpips_params={})
        raw = trainer.make_step()
        images_dev = jax.device_put(ds["images"])

        def chunk(state, images_u8, rng0):
            def body(st, k):
                r = jax.random.fold_in(rng0, k)
                i_r, s_r = jax.random.split(r)
                idx = jax.random.randint(i_r, (args.vae_batch,), 0,
                                         images_u8.shape[0])
                imgs = images_u8[idx].astype(jnp.float32) / 127.5 - 1.0
                st, m = raw(st, imgs, s_r)
                return st, {"rec": m["rec_loss"], "kl": m["kl_loss"]}

            return jax.lax.scan(body, state, jnp.arange(args.chunk))

        state, _ = run_chunks(jax.jit(chunk), state, args.vae_steps, "vae",
                              (images_dev,))

        # measured latent scale: SD convention scale_factor = 1/std(z)
        # (`v1-inference.yaml:17` is the same constant for the big VAE)
        moments = jax.jit(lambda p, x: vae.apply(
            {"params": p}, x, method=AutoencoderKL.encode_moments))
        sample = jnp.asarray(ds["images"][:2048]).astype(jnp.float32) / 127.5 - 1.0
        mean, _ = moments(state.ae_params, sample)
        scale_factor = float(1.0 / np.asarray(mean).std())
        # held-out-ish recon quality (last 512 images)
        recon = jax.jit(lambda p, x: vae.apply(
            {"params": p}, vae.apply({"params": p}, x,
                                     method=AutoencoderKL.encode_moments)[0],
            method=AutoencoderKL.decode))
        test = jnp.asarray(ds["images"][-512:]).astype(jnp.float32) / 127.5 - 1.0
        rec_l1 = float(jnp.mean(jnp.abs(recon(state.ae_params, test) - test)))
        logger.info("vae: scale_factor=%.4f recon_l1=%.4f", scale_factor, rec_l1)
        save_bundle(args.ckpt_dir, vae_params=state.ae_params,
                    meta={"scale_factor": scale_factor, "vae_recon_l1": rec_l1,
                          "vae_steps": args.vae_steps, "scenes": args.scenes,
                          "data_seed": args.data_seed})

    # ---------------- clip ----------------
    if "clip" in stages:
        from diffusion_spacetime_attn_tpu.models.clip import CLIP
        from diffusion_spacetime_attn_tpu.training.clip_trainer import (
            make_clip_train_step, retrieval_accuracy,
        )

        clip = CLIP(testbed_clip_cfg())
        M = len(ds["clip_images"])
        perm = np.random.RandomState(7).permutation(M)
        n_val = min(2048, M // 4)
        tr, va = perm[:-n_val], perm[-n_val:]
        imgs_dev = jax.device_put(ds["clip_images"][tr])
        toks_dev = jax.device_put(ds["clip_tokens"][tr])
        params = clip.init(
            jax.random.PRNGKey(3),
            jnp.zeros((1, 28, 28, 3)), jnp.zeros((1, tbscenes.MAX_LEN),
                                                 jnp.int32))["params"]
        init_fn, step_fn = make_clip_train_step(clip, lr=args.clip_lr)
        state = init_fn(params)

        def chunk(state, imgs_u8, toks, rng0):
            def body(st, k):
                r = jax.random.fold_in(rng0, k)
                idx = jax.random.randint(r, (args.clip_batch,), 0,
                                         imgs_u8.shape[0])
                # [0,1] images, UNNORMALIZED — the DCLIP loss path feeds
                # [0,1] to CLIP (losses.py module docstring)
                imgs = imgs_u8[idx].astype(jnp.float32) / 255.0
                st, m = step_fn(st, imgs, toks[idx])
                return st, {"loss": m["loss"], "acc": m["acc_i2t"]}

            return jax.lax.scan(body, state, jnp.arange(args.chunk))

        state, _ = run_chunks(jax.jit(chunk), state, args.clip_steps, "clip",
                              (imgs_dev, toks_dev))
        val_acc = retrieval_accuracy(
            clip, state.params,
            ds["clip_images"][va].astype(np.float32) / 255.0,
            ds["clip_tokens"][va])
        logger.info("clip: held-out retrieval accuracy %.3f", val_acc)
        save_bundle(args.ckpt_dir, clip_params=state.params,
                    meta={"clip_retrieval_acc": val_acc,
                          "clip_steps": args.clip_steps,
                          "clip_logit_scale": float(state.logit_scale)})

    # ---------------- ldm ----------------
    if "ldm" in stages:
        from diffusion_spacetime_attn_tpu.models.clip import CLIPTextTower
        from diffusion_spacetime_attn_tpu.models.unet import UNet
        from diffusion_spacetime_attn_tpu.models.vae import AutoencoderKL
        from diffusion_spacetime_attn_tpu.config import LDMTrainConfig
        from diffusion_spacetime_attn_tpu.ops.schedule import make_schedule
        from diffusion_spacetime_attn_tpu.testbed.bundle import _load_tree
        from diffusion_spacetime_attn_tpu.training.ldm_trainer import (
            init_state, make_train_step,
        )

        with open(os.path.join(args.ckpt_dir, "meta.json")) as f:
            meta = json.load(f)
        scale = float(meta["scale_factor"])
        vae_params = _load_tree(os.path.join(args.ckpt_dir, "vae.msgpack"))
        clip_params = _load_tree(os.path.join(args.ckpt_dir, "clip.msgpack"))

        vae = AutoencoderKL(cfg.vae)
        text = CLIPTextTower(cfg.text_encoder)
        unet = UNet(cfg.unet, radius=cfg.spacetime.radius)

        # precompute latent moments + frozen-text contexts for every scene
        moments = jax.jit(lambda p, x: vae.apply(
            {"params": p}, x, method=AutoencoderKL.encode_moments))
        embed = jax.jit(lambda p, ids: text.apply({"params": p}, ids)[0])
        means, logvars, ctxs = [], [], []
        for i in range(0, len(ds["images"]), 1024):
            imgs = jnp.asarray(ds["images"][i:i + 1024]).astype(
                jnp.float32) / 127.5 - 1.0
            m, lv = moments(vae_params, imgs)
            means.append(m)
            logvars.append(lv)
            ctxs.append(embed(clip_params["text"],
                              jnp.asarray(ds["ldm_tokens"][i:i + 1024])))
        mean_dev = jnp.concatenate(means)
        logvar_dev = jnp.concatenate(logvars)
        ctx_dev = jnp.concatenate(ctxs)
        uncond_ctx = embed(clip_params["text"],
                           jnp.asarray(tbscenes.tokenize("")[None]))[0]
        logger.info("ldm: precomputed %s moments + %s contexts",
                    mean_dev.shape, ctx_dev.shape)

        tcfg = LDMTrainConfig(
            batch_size=args.ldm_batch, base_lr=args.ldm_lr, scale_lr=False,
            use_ema=True, ema_decay=args.ema_decay)
        schedule = make_schedule(cfg.schedule, cfg.spacetime.num_steps)

        def eps_model(params, x, t, context):
            return unet.apply({"params": params}, x, t, context)

        raw_step = make_train_step(tcfg, cfg.schedule, schedule, eps_model,
                                   tcfg.base_lr)
        L = cfg.spacetime.latent_size
        params = unet.init(
            jax.random.PRNGKey(5),
            jnp.zeros((1, L, L, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, tbscenes.MAX_LEN, cfg.unet.context_dim)))["params"]
        state = jax.jit(lambda p: init_state(tcfg, cfg.schedule, p,
                                             tcfg.base_lr))(params)

        def chunk(state, mean, logvar, ctx, uncond, rng0):
            def body(st, k):
                r = jax.random.fold_in(rng0, k)
                ri, rz, rd, rn = jax.random.split(r, 4)
                idx = jax.random.randint(ri, (args.ldm_batch,), 0,
                                         mean.shape[0])
                m, lv = mean[idx], logvar[idx]
                z = (m + jnp.exp(0.5 * lv)
                     * jax.random.normal(rz, m.shape)) * scale
                c = ctx[idx]
                # classifier-free-guidance caption dropout (SD trains with
                # 10% unconditional rows so CFG has a real uncond branch)
                drop = (jax.random.uniform(rd, (args.ldm_batch, 1, 1))
                        < args.uncond_drop)
                c = jnp.where(drop, uncond[None], c)
                st, m_ = raw_step(st, z, c, rn)
                return st, {"loss": m_["loss_simple"]}

            return jax.lax.scan(body, state, jnp.arange(args.chunk))

        state, last = run_chunks(
            jax.jit(chunk), state, args.ldm_steps, "ldm",
            (mean_dev, logvar_dev, ctx_dev, uncond_ctx))
        save_bundle(args.ckpt_dir, unet_params=state.ema_params,
                    meta={"ldm_steps": args.ldm_steps,
                          "ldm_loss_simple": last["loss"],
                          "ldm_lr": args.ldm_lr,
                          "ema_decay": args.ema_decay,
                          "uncond_drop": args.uncond_drop})

    # ---------------- calibrate ----------------
    if "calibrate" in stages:
        from diffusion_spacetime_attn_tpu.eval.metrics import object_recall
        from diffusion_spacetime_attn_tpu.testbed import oracle
        from diffusion_spacetime_attn_tpu.testbed.bundle import load_bundle

        bundle = load_bundle(args.ckpt_dir)
        sd = bundle.sd
        prompts = tbscenes.make_eval_prompts(32, seed=555)
        cond = bundle.encode_captions([p.caption for p in prompts])
        uncond = jnp.broadcast_to(
            bundle.encode_captions([""]), cond.shape)

        def gen(params, cond, uncond, x_T, gs):
            s = dc.replace(sd, unet_params=params["unet"],
                           vae_params=params["vae"])
            eps = s.make_eps_fn(cond, uncond, gs)
            return s.decode_latents(s.sample_from(eps, x_T, sampler="plms"))

        gen_j = jax.jit(gen, static_argnums=4)
        params = {"unet": sd.unet_params, "vae": sd.vae_params}
        L = sd.cfg.spacetime.latent_size
        x_T = jax.random.normal(jax.random.PRNGKey(101),
                                (len(prompts), L, L, 4))
        gts = [[p.cat_a, p.cat_b] for p in prompts]
        table = {}
        for gs in (1.5, 3.0, 5.0, 7.5):
            imgs = np.asarray(gen_j(params, cond, uncond, x_T, gs))
            dets = [oracle.detect(im) for im in imgs]
            _, _, rec = object_recall(dets, gts)
            table[gs] = round(rec, 4)
            logger.info("calibrate: gs=%.1f recall=%.3f", gs, rec)
        best = max(table, key=table.get)
        save_bundle(args.ckpt_dir,
                    meta={"guidance_scale": best,
                          "guidance_calibration": {str(k): v
                                                   for k, v in table.items()}})
        logger.info("calibrate: guidance_scale=%s %s", best, table)


if __name__ == "__main__":
    main()
