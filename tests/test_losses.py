import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusion_spacetime_attn_tpu.pipeline.losses import (
    bilinear_resize,
    global_resize,
)


def test_global_resize_matches_torch_upsample_avgpool():
    """Exact parity with the reference's Upsample(×7) + AvgPool2d(16)
    (`plms.py:25-26,41`)."""
    rng = np.random.RandomState(0)
    img = rng.rand(1, 32, 32, 3).astype(np.float32)  # 32·7/16 = 14
    got = np.asarray(global_resize(jnp.array(img)))
    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    up = torch.nn.Upsample(scale_factor=7)
    pool = torch.nn.AvgPool2d(kernel_size=16)
    expect = pool(up(t)).permute(0, 2, 3, 1).numpy()
    assert got.shape == (1, 14, 14, 3)
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_global_resize_512_shape():
    img = jnp.zeros((1, 512, 512, 3))
    assert global_resize(img).shape == (1, 224, 224, 3)


def test_bilinear_matches_torch_interpolate():
    rng = np.random.RandomState(1)
    img = rng.rand(2, 20, 20, 3).astype(np.float32)
    got = np.asarray(bilinear_resize(jnp.array(img), 14))
    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    expect = (
        torch.nn.functional.interpolate(t, (14, 14), mode="bilinear", align_corners=False)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, expect, atol=1e-5)
