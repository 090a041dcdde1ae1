#!/usr/bin/env python
"""Closed-loop method evaluation: does spacetime optimization beat vanilla?

This is the in-environment evidence for the paper's core claim (reference
`plms.py:249-273` scored by `detector_result_gpt.py:164-166`): on the
trained testbed models (scripts/train_testbed.py), generate each eval
prompt twice from the SAME initial noise —

  vanilla   PLMS sampling conditioned on the caption only
  method    full spacetime attention optimization (layout centers + masked
            local attention + CLIP-loss weight optimization, the exact
            production code path `pipeline/spacetime.py`)

— and score both arms with the weights-independent oracle detector
(testbed/oracle.py) through the standard protocol math (eval/metrics.py).
Training captions carry NO positional information (testbed/scenes.py), so
vanilla relation accuracy is chance by construction; any improvement is
attributable to the method.  Results over --seeds seeds (paired per
prompt), split into seen / held-out object pairs, written as one JSON
artifact (METHOD_EVAL_r05.json).
"""
import argparse
import dataclasses as dc
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="saved/testbed")
    ap.add_argument("--prompts", type=int, default=100)
    ap.add_argument("--prompt-seed", type=int, default=777)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=25,
                    help="prompts per compiled program (all chunks padded "
                         "to this, so one compile serves the whole run)")
    ap.add_argument("--num-steps", type=int, default=50)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--guidance-scale", type=float, default=None,
                    help="default: the calibrated value in meta.json")
    ap.add_argument("--sampler", default="plms",
                    choices=["plms", "ddim", "dpm_solver"])
    ap.add_argument("--out", default="METHOD_EVAL_r05.json")
    ap.add_argument("--save-images", default=None,
                    help="dir for a qualitative PNG sample (first batch)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from diffusion_spacetime_attn_tpu.eval import metrics
    from diffusion_spacetime_attn_tpu.pipeline.spacetime import (
        SpaceTimeInputs,
        make_final_forward,
        make_train_step,
        model_params,
        optimize_prompt,
    )
    from diffusion_spacetime_attn_tpu.testbed import oracle, scenes
    from diffusion_spacetime_attn_tpu.testbed.bundle import load_bundle
    from diffusion_spacetime_attn_tpu.utils.cache import enable_compilation_cache
    from diffusion_spacetime_attn_tpu.utils.profiling import get_logger

    enable_compilation_cache()
    logger = get_logger("method_eval")

    bundle = load_bundle(args.ckpt_dir, num_steps=args.num_steps,
                         guidance_scale=args.guidance_scale)
    sd = bundle.sd
    cfg = sd.cfg.spacetime
    if args.epochs != cfg.epochs:
        cfg = dc.replace(cfg, epochs=args.epochs)
    gs = cfg.guidance_scale
    logger.info("bundle: %s (guidance_scale=%.2f, %d steps %s, %d epochs)",
                args.ckpt_dir, gs, cfg.num_steps, args.sampler, cfg.epochs)

    prompts = scenes.make_eval_prompts(args.prompts, seed=args.prompt_seed)
    B = args.batch
    L = cfg.latent_size

    # ---- shared embeddings (per-batch constants) ----
    def embed_batch(batch_prompts):
        caps = [p.caption for p in batch_prompts]
        cond = bundle.encode_captions(caps)
        uncond = jnp.broadcast_to(bundle.encode_captions([""]), cond.shape)
        locals_, centers, obj_tokens = [], [], []
        for p in batch_prompts:
            obj_caps = [f"a photo of a {p.cat_a}", f"a photo of a {p.cat_b}"]
            locals_.append(np.asarray(bundle.encode_captions(obj_caps)))
            centers.append(np.asarray(p.centers, np.float32))
            obj_tokens.append(np.stack([scenes.tokenize(c) for c in obj_caps]))
        caption_tokens = jnp.asarray(
            np.stack([scenes.tokenize(c) for c in caps]))
        return SpaceTimeInputs(
            cond=cond,
            uncond=uncond,
            local_contexts=jnp.asarray(np.stack(locals_)),
            centers=jnp.asarray(np.stack(centers)),
            active=jnp.ones((len(batch_prompts), 2), jnp.float32),
            caption_tokens=caption_tokens,
            object_tokens=jnp.asarray(np.stack(obj_tokens)),
            x_T=jnp.zeros((len(batch_prompts), L, L, 4)),  # filled per seed
        )

    # ---- compiled programs (shared across batches/seeds) ----
    params = {"unet": sd.unet_params, "vae": sd.vae_params}

    def vanilla(params, cond, uncond, x_T):
        s = dc.replace(sd, unet_params=params["unet"], vae_params=params["vae"])
        eps = s.make_eps_fn(cond, uncond, gs)
        return s.decode_latents(s.sample_from(eps, x_T, sampler=args.sampler))

    vanilla_j = jax.jit(vanilla)
    optimizer, train_step = make_train_step(sd, bundle.clip_loss, cfg,
                                            sampler=args.sampler)
    final_forward = make_final_forward(sd, bundle.clip_loss, cfg,
                                       sampler=args.sampler)

    # ---- score helpers ----
    def score(images, batch_prompts):
        dets = [oracle.detect(im) for im in np.asarray(images)]
        rows = []
        for d, p in zip(dets, batch_prompts):
            gt_objs = [p.cat_a, p.cat_b]
            _, _, rec = metrics.object_recall([d], [gt_objs])
            _, _, rel = metrics.relation_accuracy(
                [d], [[(p.cat_a, p.cat_b, p.rel)]])
            rows.append({"recall": rec, "relation": rel,
                         "held_out": p.held_out})
        return rows

    def clip_score(images, caption_tokens):
        loss = bundle.clip_loss.global_loss(images, caption_tokens)
        return np.asarray(1.0 - loss)

    # ---- run ----
    # Each completed (batch, seed) cell is appended to <out>.partial.jsonl so
    # a tunnel death mid-run resumes instead of redoing finished work (the
    # axon tunnel can hang for hours; see docs/DESIGN.md).
    n_batches = (len(prompts) + B - 1) // B
    partial_path = args.out + ".partial.jsonl"
    per_prompt = []  # one row per (seed, prompt): both arms' scores
    done_cells = set()
    if os.path.exists(partial_path):
        with open(partial_path) as f:
            for line in f:
                cell = json.loads(line)
                done_cells.add((cell["bi"], cell["seed"]))
                per_prompt.extend(cell["rows"])
        logger.info("resuming: %d cells already done", len(done_cells))
    t_van = t_met = 0.0
    for bi in range(n_batches):
        if all((bi, s) in done_cells for s in range(args.seeds)):
            continue
        bp = prompts[bi * B:(bi + 1) * B]
        pad = B - len(bp)
        bp_padded = bp + [bp[-1]] * pad
        inputs0 = embed_batch(bp_padded)
        for seed in range(args.seeds):
            if (bi, seed) in done_cells:
                continue
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(2025), seed), bi)
            x_T = jax.random.normal(key, (B, L, L, 4))
            inputs = inputs0._replace(x_T=x_T)

            t0 = time.time()
            v_imgs = jax.block_until_ready(
                vanilla_j(params, inputs.cond, inputs.uncond, x_T))
            t_van += time.time() - t0

            t0 = time.time()
            m_imgs, coef, losses = optimize_prompt(
                sd, bundle.clip_loss, inputs, cfg, sampler=args.sampler,
                train_step=train_step, optimizer=optimizer,
                final_forward=final_forward)
            m_imgs = jax.block_until_ready(m_imgs)
            t_met += time.time() - t0

            v_rows = score(v_imgs, bp_padded)
            m_rows = score(m_imgs, bp_padded)
            v_clip = clip_score(v_imgs, inputs.caption_tokens)
            m_clip = clip_score(m_imgs, inputs.caption_tokens)
            cell_rows = []
            for i in range(len(bp)):
                cell_rows.append({
                    "seed": seed, "prompt": bp[i].caption,
                    "held_out": bp[i].held_out,
                    "vanilla": {**v_rows[i], "clip": float(v_clip[i])},
                    "method": {**m_rows[i], "clip": float(m_clip[i])},
                })
            per_prompt.extend(cell_rows)
            with open(partial_path, "a") as f:
                f.write(json.dumps({"bi": bi, "seed": seed,
                                    "rows": cell_rows}) + "\n")
            if args.save_images and bi == 0 and seed == 0:
                _save_grid(args.save_images, np.asarray(v_imgs),
                           np.asarray(m_imgs), bp)
            logger.info("batch %d/%d seed %d: vanilla rec %.3f rel %.3f | "
                        "method rec %.3f rel %.3f",
                        bi + 1, n_batches, seed,
                        np.mean([r["recall"] for r in v_rows[:len(bp)]]),
                        np.mean([r["relation"] for r in v_rows[:len(bp)]]),
                        np.mean([r["recall"] for r in m_rows[:len(bp)]]),
                        np.mean([r["relation"] for r in m_rows[:len(bp)]]))

    # ---- aggregate ----
    def agg(rows, arm, key):
        return float(np.mean([r[arm][key] for r in rows])) if rows else 0.0

    def split_stats(rows):
        out = {}
        for arm in ("vanilla", "method"):
            out[arm] = {k: round(agg(rows, arm, k), 4)
                        for k in ("recall", "relation", "clip")}
        # per-seed means -> seed spread of the method-vanilla delta
        deltas = {}
        for k in ("recall", "relation", "clip"):
            per_seed = []
            for s in range(args.seeds):
                sr = [r for r in rows if r["seed"] == s]
                if sr:
                    per_seed.append(agg(sr, "method", k) - agg(sr, "vanilla", k))
            deltas[k] = {
                "mean": round(float(np.mean(per_seed)), 4),
                "std_over_seeds": round(float(np.std(per_seed)), 4),
                "per_seed": [round(d, 4) for d in per_seed],
            }
        out["delta_method_minus_vanilla"] = deltas
        out["n"] = len(rows)
        return out

    seen = [r for r in per_prompt if not r["held_out"]]
    held = [r for r in per_prompt if r["held_out"]]
    artifact = {
        "protocol": {
            "prompts": args.prompts, "seeds": args.seeds,
            "sampler": args.sampler, "num_steps": cfg.num_steps,
            "epochs": cfg.epochs, "guidance_scale": gs,
            "paired_noise": True,
            "detector": "oracle (weights-independent color/shape threshold)",
            "detector_self_check": oracle.oracle_self_check(),
            "training_captions": "relation word uniform-random "
                                 "(uninformative); see testbed/scenes.py",
        },
        "weights": {k: bundle.meta.get(k) for k in
                    ("scale_factor", "vae_recon_l1", "clip_retrieval_acc",
                     "vae_steps", "clip_steps", "ldm_steps", "scenes",
                     "guidance_calibration")},
        "overall": split_stats(per_prompt),
        "seen_pairs": split_stats(seen),
        "heldout_pairs": split_stats(held),
        "wall_clock_s": {"vanilla": round(t_van, 1),
                         "method": round(t_met, 1)},
        "device": str(jax.devices()[0].platform),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    if os.path.exists(partial_path):
        os.remove(partial_path)
    o = artifact["overall"]
    logger.info("DONE -> %s", args.out)
    logger.info("vanilla: %s", o["vanilla"])
    logger.info("method : %s", o["method"])
    logger.info("delta  : %s", {k: v["mean"] for k, v in
                                o["delta_method_minus_vanilla"].items()})


def _save_grid(out_dir, v_imgs, m_imgs, batch_prompts):
    """Side-by-side vanilla|method PNGs for the first batch."""
    import numpy as np
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    for i, p in enumerate(batch_prompts):
        pair = np.concatenate([v_imgs[i], np.ones_like(v_imgs[i][:, :2]),
                               m_imgs[i]], axis=1)
        img = Image.fromarray(
            np.clip(np.round(pair * 255), 0, 255).astype(np.uint8))
        img.save(os.path.join(
            out_dir, f"{i:02d}_{p.caption.replace(' ', '_')}.png"))


if __name__ == "__main__":
    main()
