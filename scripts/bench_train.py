#!/usr/bin/env python
"""Real-chip training step-time benchmark (VERDICT r2 #6).

Measures the jitted train-step wall time for the two training harnesses
the reference ships (`trainer/Pretrain.py` + `main.py`) at their natural
operating points, on whatever devices are visible (one real TPU chip
under axon; a CPU mesh under JAX_PLATFORMS=cpu for smoke):

  --what layout   RoBERTa Rel2Bbox pretrain step, real gpt-3.pkl rows,
                  batch 64 (the reference's `S.TRAIN.BATCH_SIZE`).
  --what ldm      v1-scale UNet (860M) LDM step, synthetic latents
                  [B,64,64,4] + text context [B,77,768], bf16 compute.

Prints ONE JSON line: {"metric": ..., "s_per_step": ..., "items_per_s": ...}.
Protocol matches bench.py: compile once, then min over --iters timed calls
with varied inputs (standalone microbenches over the tunnel are
untrustworthy; whole-step timing with block_until_ready is the instrument).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_layout(args):
    import jax
    import numpy as np

    from diffusion_spacetime_attn_tpu.config import (
        LayoutConfig, LayoutTrainConfig,
    )
    from diffusion_spacetime_attn_tpu.models.layout.model import (
        create_layout_predictor,
    )
    from diffusion_spacetime_attn_tpu.training.datasets import (
        batches, load_gpt3_examples, synthetic_examples,
    )
    from diffusion_spacetime_attn_tpu.training.layout_trainer import LayoutTrainer
    from diffusion_spacetime_attn_tpu.utils.tokenizer import make_roberta_tokenizer

    cfg = LayoutConfig()
    train_cfg = LayoutTrainConfig(batch_size=args.batch_size)
    model, params = create_layout_predictor(cfg, jax.random.PRNGKey(0))
    trainer = LayoutTrainer.create(cfg, train_cfg, params)
    opt_state = trainer.init_state(params)
    tok = make_roberta_tokenizer()

    rng = np.random.RandomState(0)
    if os.path.exists(args.gpt3_pkl):
        examples = load_gpt3_examples(args.gpt3_pkl)
        src = "gpt-3.pkl"
    else:
        examples = synthetic_examples(512, rng)
        src = "synthetic"
    batch_list = []
    # cycle over the data source until we have iters+1 distinct-enough
    # batches — a short pkl (or a raised --iters) must not silently
    # benchmark fewer iterations, and min(times) on an empty tail raises
    while len(batch_list) < args.iters + 1:
        before = len(batch_list)
        for b in batches(examples, tok, args.batch_size, rng, max_len=cfg.max_len):
            batch_list.append(b)
            if len(batch_list) >= args.iters + 1:
                break
        if len(batch_list) == before:
            raise SystemExit(
                f"data source yields no full batch of {args.batch_size} "
                f"({len(examples)} examples) — lower --batch-size")

    t0 = time.perf_counter()
    params, opt_state, loss, _ = trainer.train_step(params, opt_state, batch_list[0])
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0

    times = []
    for b in batch_list[1:]:
        t0 = time.perf_counter()
        params, opt_state, loss, _ = trainer.train_step(params, opt_state, b)
        jax.block_until_ready(loss)
        times.append(time.perf_counter() - t0)
    return {
        "metric": f"layout_pretrain_step_b{args.batch_size}_{src}",
        "iters": len(times),
        "s_per_step": round(min(times), 4),
        "items_per_s": round(args.batch_size / min(times), 1),
        "compile_s": round(compile_s, 1),
        "times": [round(t, 4) for t in times],
        "device": str(jax.devices()[0]),
    }


def bench_ldm(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_spacetime_attn_tpu.config import (
        LDMTrainConfig, ScheduleConfig, UNetConfig,
    )
    from diffusion_spacetime_attn_tpu.models.unet import UNet
    from diffusion_spacetime_attn_tpu.ops.schedule import make_schedule
    from diffusion_spacetime_attn_tpu.training.ldm_trainer import LDMTrainer
    from diffusion_spacetime_attn_tpu.utils.testing import (
        randomize_params_on_device,
    )

    if args.tiny:  # CPU smoke only — the real instrument is v1 scale
        unet_cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                              num_res_blocks=1, attention_resolutions=(1, 2),
                              num_heads=2, context_dim=16, dtype=args.dtype)
    else:
        unet_cfg = UNetConfig(dtype=args.dtype)  # v1 scale (860M)
    sched_cfg = ScheduleConfig()
    train_cfg = LDMTrainConfig(batch_size=args.batch_size,
                               use_ema=not args.no_ema)
    unet = UNet(unet_cfg, radius=0.2)

    def eps_model(params, x, t, context):
        return unet.apply({"params": params}, x, t, context)

    trainer = LDMTrainer(train_cfg, sched_cfg, make_schedule(sched_cfg, 50),
                         eps_model)
    B, hw = args.batch_size, (16 if args.tiny else 64)
    # abstract init + randomize ON DEVICE (never ship 3.4 GB of host params
    # through the tunnel — CLAUDE.md)
    shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((1, hw, hw, 4)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 77, unet_cfg.context_dim)))["params"],
        jax.random.PRNGKey(0),
    )
    params = randomize_params_on_device(shapes, jax.random.PRNGKey(1))
    state = trainer.init(params)
    del params, shapes  # init() copied them into the (donated) state; a live
    # extra 3.4 GB f32 copy can push a 16 GB v5e over HBM with EMA enabled

    def batch_for(i):
        k = jax.random.PRNGKey(1000 + i)
        k1, k2 = jax.random.split(k)
        return (jax.random.normal(k1, (B, hw, hw, 4), jnp.float32),
                jax.random.normal(k2, (B, 77, unet_cfg.context_dim),
                                  jnp.float32) * 0.02)

    key = jax.random.PRNGKey(42)
    x0, ctx = batch_for(0)
    t0 = time.perf_counter()
    state, metrics = trainer.train_step(state, x0, ctx, jax.random.fold_in(key, 0))
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(1, args.iters + 1):
        x0, ctx = batch_for(i)
        jax.block_until_ready((x0, ctx))
        t0 = time.perf_counter()
        state, metrics = trainer.train_step(state, x0, ctx,
                                            jax.random.fold_in(key, i))
        jax.block_until_ready(metrics)
        times.append(time.perf_counter() - t0)
    return {
        "metric": f"ldm_v1_train_step_b{args.batch_size}_{args.dtype}"
                  + ("" if args.no_ema else "_ema"),
        "s_per_step": round(min(times), 4),
        "items_per_s": round(args.batch_size / min(times), 2),
        "compile_s": round(compile_s, 1),
        "times": [round(t, 4) for t in times],
        "device": str(jax.devices()[0]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["layout", "ldm"], required=True)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--no-ema", action="store_true")
    ap.add_argument("--tiny", action="store_true", help="tiny UNet (CPU smoke)")
    ap.add_argument(
        "--gpt3-pkl",
        default="/root/reference/layout_predictor/LayoutTransformer/data/gpt-3.pkl",
    )
    args = ap.parse_args()
    if args.batch_size is None:
        args.batch_size = 64 if args.what == "layout" else 4

    from diffusion_spacetime_attn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    line = bench_layout(args) if args.what == "layout" else bench_ldm(args)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
