#!/usr/bin/env python
"""MFU/FLOP accounting for the three bench.py lines (VERDICT r4 weak #3).

Counts each bench program's MXU FLOPs by abstract jaxpr traversal
(utils/flops.py — exact program arithmetic, dot_general + conv, including
the backward and the per-step remat recompute that `jax.grad` of the
remat'd chain traces out), then joins them with the measured wall clocks to
produce TF/s and %-of-peak per line.

The count runs on the XLA einsum path (no Pallas): the fused kernels
replace einsums 1:1 (oracle-tested equivalence, ops/pallas_*.py), so the
arithmetic is identical while staying visible to the tracer.  Elementwise/
norm/softmax work is excluded (<1% of arithmetic at these shapes) — MFU
reported here is MXU-FLOP utilization, the standard definition.

Peak: TPU v5e = 197 TF/s bf16 (394 int8); bench compute dtype is bfloat16.

Writes MFU_r05.json and prints a markdown table for docs/BENCHMARKS.md.
No device needed (tracing is abstract) — runs anywhere, fast.
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_PEAK_TFS_BF16 = 197.0

# Pinned wall clocks (s per jitted call), round-5 serialized runs
# (docs/BENCHMARKS.md "Current numbers"); override with --measured.
MEASURED = {
    "vanilla_plms50_b8": 5.975,           # one 8-image PLMS50 call
    "dpm20_b8_epoch": 10.848,             # one fwd+bwd epoch, batch 8
    "dpm20_b8_final_fwd": 0.368 * 8,      # forward-only final epoch
    "plms50_b4_epoch": 13.228,
    "plms50_b4_final_fwd": 0.909 * 4,
}


def build_programs():
    import jax
    import jax.numpy as jnp

    from diffusion_spacetime_attn_tpu.config import (
        PipelineConfig, SpaceTimeConfig, UNetConfig, VAEConfig,
    )
    from diffusion_spacetime_attn_tpu.ops.attention import SpatialControl
    from diffusion_spacetime_attn_tpu.ops.schedule import make_schedule
    from diffusion_spacetime_attn_tpu.pipeline.pipeline import StableDiffusion

    def sds(*shape, dtype=jnp.float32):
        return jax.ShapeDtypeStruct(shape, dtype)

    def make(mode, sampler, steps, batch, n_objects=4):
        cfg = PipelineConfig(
            unet=UNetConfig(dtype="bfloat16",
                            attn_scores_dtype="bfloat16"),
            vae=VAEConfig(dtype="bfloat16"),
            spacetime=SpaceTimeConfig(num_steps=steps),
        )
        sd = StableDiffusion.create(cfg, jax.random.PRNGKey(0), abstract=True)
        sd = dataclasses.replace(sd, schedule=make_schedule(cfg.schedule, steps))
        B, N, L, D = batch, n_objects, 77, cfg.unet.context_dim
        cond = sds(B, L, D)
        uncond = sds(B, L, D)
        control = coef = None
        if mode == "spacetime":
            control = SpatialControl(
                local_contexts=sds(B, N, L, D),
                centers=sds(B, N, 2),
                coef=sds(B, N),
                active=sds(B, N),
            )
            coef = sds(B, N, steps)

        def run(ps, x_T, cond, uncond, control, coef):
            s = dataclasses.replace(sd, unet_params=ps[0], vae_params=ps[1])
            eps_fn = s.make_eps_fn(cond, uncond, 7.5, control, coef)
            z = s.sample_from(eps_fn, x_T, sampler,
                              remat=(mode == "spacetime"))
            return jnp.sum(s.decode_latents(z))

        params = (sd.unet_params, sd.vae_params)
        x_T = sds(B, 64, 64, 4)
        return run, (params, x_T, cond, uncond, control, coef)

    return make


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MFU_r05.json")
    ap.add_argument("--measured", default=None,
                    help="JSON file overriding the pinned wall clocks")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # tracing only, no device work

    from diffusion_spacetime_attn_tpu.utils.flops import count_flops

    measured = dict(MEASURED)
    if args.measured:
        measured.update(json.load(open(args.measured)))

    make = build_programs()

    def flops_of(mode, sampler, steps, batch, grad):
        run, prog_args = make(mode, sampler, steps, batch)
        fn = run
        if grad:
            def fn(ps, x_T, cond, uncond, control, coef):
                return jax.value_and_grad(run, argnums=5)(
                    ps, x_T, cond, uncond, control, coef)
        c = count_flops(fn, *prog_args)
        assert c["opaque_pallas_calls"] == 0, "count on the XLA path only"
        assert c["dynamic_while_loops"] == 0
        return c

    programs = {
        "vanilla_plms50_b8": ("vanilla", "plms", 50, 8, False),
        "dpm20_b8_epoch": ("spacetime", "dpm", 20, 8, True),
        "dpm20_b8_final_fwd": ("spacetime", "dpm", 20, 8, False),
        "plms50_b4_epoch": ("spacetime", "plms", 50, 4, True),
        "plms50_b4_final_fwd": ("spacetime", "plms", 50, 4, False),
    }
    rows = {}
    for name, spec in programs.items():
        c = flops_of(*spec)
        wall = measured[name]
        tfs = c["total"] / wall / 1e12
        rows[name] = {
            "pflops_per_call": round(c["total"] / 1e15, 3),
            "matmul_share": round(c["matmul"] / c["total"], 3),
            "conv_share": round(c["conv"] / c["total"], 3),
            "measured_s_per_call": wall,
            "tf_per_s": round(tfs, 1),
            "mfu_pct_of_v5e_bf16_peak": round(100 * tfs / V5E_PEAK_TFS_BF16, 1),
        }
        print(f"{name}: {rows[name]}", file=sys.stderr)

    # whole-method lines: 2 train epochs + 1 forward-only epoch per image
    def method_line(prefix, batch):
        ep, fw = rows[f"{prefix}_epoch"], rows[f"{prefix}_final_fwd"]
        total_fl = 2 * ep["pflops_per_call"] + fw["pflops_per_call"]
        total_s = 2 * ep["measured_s_per_call"] + fw["measured_s_per_call"]
        tfs = total_fl * 1e15 / total_s / 1e12
        return {
            "pflops_per_optimized_image": round(total_fl / batch, 3),
            "s_per_optimized_image": round(total_s / batch, 3),
            "tf_per_s": round(tfs, 1),
            "mfu_pct_of_v5e_bf16_peak": round(100 * tfs / V5E_PEAK_TFS_BF16, 1),
        }

    artifact = {
        "peak_tfs": {"v5e_bf16": V5E_PEAK_TFS_BF16},
        "definition": "MXU FLOPs (dot_general+conv incl. backward and remat "
                      "recompute) / wall clock; elementwise excluded",
        "programs": rows,
        "method_total": {
            "dpm20_b8_3ep": method_line("dpm20_b8", 8),
            "plms50_b4_3ep": method_line("plms50_b4", 4),
        },
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)

    # markdown for docs/BENCHMARKS.md
    print("\n| program | PFLOPs/call | matmul:conv | s/call | TF/s | MFU (v5e bf16) |")
    print("|---|---|---|---|---|---|")
    for name, r in rows.items():
        print(f"| {name} | {r['pflops_per_call']} | "
              f"{r['matmul_share']:.0%}:{r['conv_share']:.0%} | "
              f"{r['measured_s_per_call']:.2f} | {r['tf_per_s']} | "
              f"**{r['mfu_pct_of_v5e_bf16_peak']}%** |")
    for name, r in artifact["method_total"].items():
        print(f"| {name} (whole method) | "
              f"{r['pflops_per_optimized_image']} /img | — | "
              f"{r['s_per_optimized_image']} /img | {r['tf_per_s']} | "
              f"**{r['mfu_pct_of_v5e_bf16_peak']}%** |")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
