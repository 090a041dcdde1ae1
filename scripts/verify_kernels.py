#!/usr/bin/env python
"""On-chip validation of the Pallas kernels against the XLA oracles.

Run on a real TPU (CPU tests only cover interpret mode):
  python scripts/verify_kernels.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_spacetime_attn_tpu.ops import pallas_spacetime as ps
    from diffusion_spacetime_attn_tpu.ops.attention import flash_attention

    print(f"device: {jax.devices()[0]}")

    # --- fused spacetime kernel vs XLA oracle (SD-realistic shapes) ---
    rng = np.random.RandomState(0)
    for (B, N, Lq, inner, heads) in [(2, 4, 4096, 320, 8), (2, 4, 1024, 640, 8)]:
        f = lambda *s: jnp.array(rng.randn(*s), jnp.float32) * 0.1
        q_c, g_u = f(B, Lq, inner), f(B, Lq, inner)
        kc, vc = f(B, 77, inner), f(B, 77, inner)
        lk, lv = f(B, N, 77, inner), f(B, N, 77, inner)
        masks = jnp.array(rng.rand(B, N, Lq) < 0.2, jnp.float32)
        coef = jnp.array(rng.rand(B, N), jnp.float32)
        got = ps.fused_spacetime_attention(q_c, g_u, kc, vc, lk, lv, masks, coef, heads)
        expect = ps._xla_reference(q_c, g_u, kc, vc, lk, lv, masks, coef, heads)
        d = float(jnp.max(jnp.abs(got - expect)))
        print(f"fused_spacetime B{B} N{N} Lq{Lq} inner{inner}: max diff {d:.2e}")
        assert d < 5e-3, "fused kernel mismatch on chip"

    # --- flash routing vs XLA ---
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 4096, 320), jnp.bfloat16)
    fa = flash_attention(q, q, q, 8)
    from diffusion_spacetime_attn_tpu.ops.attention import attention

    xla = attention(q, q, q, 8)
    d = float(jnp.max(jnp.abs(fa.astype(jnp.float32) - xla.astype(jnp.float32))))
    print(f"flash vs xla self-attention: max diff {d:.2e}")
    assert d < 5e-2
    print("ALL KERNELS VALIDATED ON CHIP")


if __name__ == "__main__":
    main()
