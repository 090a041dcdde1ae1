"""Mesh/sharding: TP-sharded params must be numerically identical to
replicated execution, with collectives inserted by GSPMD."""
import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.config import UNetConfig
from diffusion_spacetime_attn_tpu.models.unet import UNet
from diffusion_spacetime_attn_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    shard_batch,
)
from diffusion_spacetime_attn_tpu.parallel.sharding import (
    partition_specs,
    shard_params,
)
from diffusion_spacetime_attn_tpu.utils.testing import randomize_params

TINY = UNetConfig(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
    attention_resolutions=(1, 2), num_heads=2, context_dim=16,
)


@pytest.fixture(scope="module")
def setup():
    unet = UNet(TINY)
    x = jnp.array(np.random.RandomState(0).randn(4, 16, 16, 4), jnp.float32)
    t = jnp.full((4,), 981, jnp.int32)
    ctx = jnp.array(np.random.RandomState(1).randn(4, 7, 16), jnp.float32)
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    params = randomize_params(params, jax.random.PRNGKey(1))
    return unet, params, x, t, ctx


def test_partition_specs_rules(setup):
    _, params, *_ = setup
    specs = partition_specs(params)
    flat = {
        "/".join(str(k.key) for k in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    # attention qkv column-parallel, out row-parallel
    qk = [k for k in flat if k.endswith("attn1/to_q/kernel")]
    assert qk and all(flat[k] == jax.sharding.PartitionSpec(None, "model") for k in qk)
    ok = [k for k in flat if k.endswith("attn1/to_out/kernel")]
    assert ok and all(flat[k] == jax.sharding.PartitionSpec("model", None) for k in ok)
    # conv kernels replicated
    ck = [k for k in flat if k.endswith("in_conv/kernel")]
    assert ck and all(flat[k] == jax.sharding.PartitionSpec() for k in ck)


def test_tp_sharded_forward_matches_replicated(setup):
    unet, params, x, t, ctx = setup
    expect = np.asarray(unet.apply({"params": params}, x, t, ctx))

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    with mesh:
        sp = shard_params(mesh, params, model_axis_size=2)
        xs = jax.device_put(x, data_sharding(mesh, x.ndim))
        fn = jax.jit(lambda p, x, t, c: unet.apply({"params": p}, x, t, c))
        got = np.asarray(fn(sp, xs, t, ctx))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_shard_batch_places_on_data_axis(setup):
    _, _, x, *_ = setup
    mesh = make_mesh(data=4, model=2, devices=jax.devices())
    tree = {"a": x, "b": jnp.ones((4, 3))}
    sharded = shard_batch(mesh, tree)
    for leaf in jax.tree_util.tree_leaves(sharded):
        assert leaf.sharding.spec[0] == "data"


def test_fsdp_sharding_leaf_rules():
    """fsdp_sharding: largest data-divisible axis sharded, scalars and
    indivisible leaves replicated, works on nested pytrees."""
    import numpy as np
    from diffusion_spacetime_attn_tpu.parallel.mesh import make_mesh
    from diffusion_spacetime_attn_tpu.parallel.sharding import fsdp_sharding

    mesh = make_mesh(data=8)
    tree = {
        "w": np.zeros((24, 16)),     # both divisible; 24 is largest → axis 0
        "tall": np.zeros((8, 640)),  # 640 largest divisible → axis 1
        "odd": np.zeros((7, 5)),     # nothing divisible → replicated
        "scalar": np.float32(0.0),
        "nested": {"b": np.zeros((64,))},
    }
    sh = fsdp_sharding(mesh, tree)
    assert sh["w"].spec == ("data", None)
    assert sh["tall"].spec == (None, "data")
    assert sh["odd"].spec == ()
    assert sh["scalar"].spec == ()
    assert sh["nested"]["b"].spec == ("data",)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["fsdp", "tp"])
def test_sharded_unet_compiles_without_involuntary_remat(mode):
    """Regression for VERDICT r2 #2: the LDM-FSDP step (and the TP
    controlled step) must compile with ZERO `spmd_partitioner.cc`
    involuntary-full-rematerialization warnings.  Pre-fix, the jvp
    tangents of the FSDP-sharded q/k/v kernels forced a
    replicate-then-reshard of every attn2's head-split reshape (8
    warnings on the tiny UNet); the sharding pins in
    CrossAttention._qkv eliminate them.  Subprocess because the warnings
    are C++ glog stderr, not capturable in-process."""
    import subprocess
    import sys

    helper = os.path.join(os.path.dirname(__file__), "helpers",
                          "compile_sharded_unet.py")
    r = subprocess.run(
        [sys.executable, helper, mode], capture_output=True, text=True,
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert f"COMPILE_OK {mode}" in r.stdout
    assert "Involuntary full rematerialization" not in r.stderr, (
        "\n".join(l for l in r.stderr.splitlines() if "Involuntary" in l)[:2000]
    )
