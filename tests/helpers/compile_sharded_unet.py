"""Compile helper for test_parallel.py: sharded UNet training-step compiles,
with XLA's SPMD warnings on stderr (asserted free of "Involuntary full
rematerialization" by the test).  Two modes:

  fsdp — data-only mesh(8), the real LDMTrainer FSDP step: params + Adam
         moments + EMA sharded (largest-divisible-axis), grads
         reduce-scattered back into the sharded state.  The jvp tangents
         of the feature-sharded q/k/v kernels used to force involuntary
         full rematerialization at every attn2 until the projections got
         sharding pins (models/layers.py CrossAttention._qkv, VERDICT r2
         #2) — the minimal grad-only program does NOT reproduce it; the
         full state round trip is required.
  tp   — (data=4, model=2) mesh, Megatron TP params, controlled step,
         grad w.r.t. params AND coef through the spatial blend.

Run:  python compile_sharded_unet.py {fsdp|tp}
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from diffusion_spacetime_attn_tpu.config import UNetConfig
from diffusion_spacetime_attn_tpu.models.unet import UNet
from diffusion_spacetime_attn_tpu.ops.attention import SpatialControl
from diffusion_spacetime_attn_tpu.parallel.mesh import make_mesh
from diffusion_spacetime_attn_tpu.parallel.sharding import shard_params
from diffusion_spacetime_attn_tpu.utils.testing import randomize_params
from jax.sharding import NamedSharding, PartitionSpec as P

CFG = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                 attention_resolutions=(1, 2), num_heads=2, context_dim=16)


def main_fsdp() -> None:
    from diffusion_spacetime_attn_tpu.config import (
        LDMTrainConfig,
        ScheduleConfig,
    )
    from diffusion_spacetime_attn_tpu.ops.schedule import make_schedule
    from diffusion_spacetime_attn_tpu.training.ldm_trainer import LDMTrainer

    n = 8
    unet = UNet(CFG, radius=0.2)
    mesh = make_mesh(data=n, devices=jax.devices()[:n])

    def eps_model(p, x, t, c):
        return unet.apply({"params": p}, x, t, c)

    ldm = LDMTrainer(
        LDMTrainConfig(batch_size=1, use_ema=True, scale_lr=False),
        ScheduleConfig(), make_schedule(ScheduleConfig(), 8), eps_model,
        mesh=mesh, fsdp=True,
    )
    x = jnp.zeros((n, 16, 16, 4), jnp.float32)
    ctx = jnp.zeros((n, 7, CFG.context_dim), jnp.float32)
    params = randomize_params(
        unet.init(jax.random.PRNGKey(0), x, jnp.zeros((n,), jnp.int32),
                  ctx)["params"],
        jax.random.PRNGKey(1), 0.1,
    )
    state = ldm.init(params)
    with mesh:
        ldm._step.lower(state, x, ctx, jax.random.PRNGKey(11)).compile()
    print("COMPILE_OK fsdp")


def main_tp() -> None:
    unet = UNet(CFG, radius=0.2)
    B, N, L = 4, 2, 7
    x = jnp.zeros((2 * B, 16, 16, 4), jnp.float32)
    t = jnp.full((2 * B,), 981, jnp.int32)
    ctx = jnp.zeros((2 * B, L, CFG.context_dim), jnp.float32)
    rng = np.random.RandomState(0)
    control = SpatialControl(
        local_contexts=jnp.array(rng.randn(B, N, L, CFG.context_dim),
                                 jnp.float32) * 0.02,
        centers=jnp.array(rng.rand(B, N, 2), jnp.float32),
        coef=jnp.full((B, N), 1.25, jnp.float32),
        active=jnp.ones((B, N), jnp.float32),
    )
    params = randomize_params(
        unet.init(jax.random.PRNGKey(0), x, t, ctx, control)["params"],
        jax.random.PRNGKey(1), 0.1,
    )
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    params = shard_params(mesh, params, 2)
    row = NamedSharding(mesh, P("data"))
    x, ctx = jax.device_put(x, row), jax.device_put(ctx, row)
    control = jax.tree_util.tree_map(lambda a: jax.device_put(a, row), control)

    def loss(params, coef):
        c = control._replace(coef=coef)
        e = unet.apply({"params": params}, x, t, ctx, c)
        return jnp.sum(e ** 2)

    with mesh:
        jax.jit(jax.grad(loss, argnums=(0, 1))).lower(
            params, control.coef
        ).compile()
    print("COMPILE_OK tp")


if __name__ == "__main__":
    main_fsdp() if sys.argv[1] == "fsdp" else main_tp()
