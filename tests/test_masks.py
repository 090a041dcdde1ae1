import numpy as np

from diffusion_spacetime_attn_tpu.ops.masks import (
    circular_mask,
    crop_window,
    flat_circular_mask,
)


def reference_mask(obj_x, obj_y, dim, r2=0.04):
    """Direct numpy replication of `ldm/modules/attention.py:250-263`."""
    axis = np.arange(dim, dtype=np.float32) / dim
    dist1 = (axis - obj_x) ** 2  # x axis
    dist2 = (axis - obj_y) ** 2  # y axis
    dist = dist1[None, :] + dist2[:, None]
    return (dist < r2).astype(np.float32)


def test_matches_reference_semantics():
    for dim in (8, 16, 64):
        for cx, cy in [(0.5, 0.5), (0.2, 0.7), (0.0, 1.0), (0.574, 0.503)]:
            got = np.asarray(circular_mask(np.array([cx, cy], np.float32), dim, 0.2))
            np.testing.assert_array_equal(got, reference_mask(cx, cy, dim))


def test_batched_shapes_and_padding():
    centers = np.random.rand(2, 3, 2).astype(np.float32)
    active = np.array([[1, 1, 0], [1, 0, 0]], np.float32)
    m = np.asarray(flat_circular_mask(centers, 16, 0.2, active))
    assert m.shape == (2, 3, 256)
    assert m[0, 2].sum() == 0  # padded object fully masked out
    assert m[1, 1].sum() == 0
    assert m[0, 0].sum() > 0


def test_crop_window_clamps_to_image():
    start, size = crop_window(np.array([0.0, 0.0], np.float32), 512, 0.2)
    assert size == 204
    assert int(start[0]) == 0 and int(start[1]) == 0
    start, _ = crop_window(np.array([1.0, 1.0], np.float32), 512, 0.2)
    assert int(start[0]) == 512 - 204
    start, _ = crop_window(np.array([0.5, 0.5], np.float32), 512, 0.2)
    assert int(start[0]) == 256 - 102
