"""Circular region masks for spatial attention control.

Reference: `ldm/modules/attention.py:250-263` — for each object with predicted
center (x, y) in [0,1]², a boolean mask over the latent grid selecting pixels
with squared distance < radius².  The reference builds these lazily inside
every attention block at the first timestep (t == 981) and caches them on the
module; here they are a pure function of (centers, resolution) evaluated
inside the trace — XLA folds them into the surrounding blend.

Grid convention (must match the reference exactly): the mask value at
(row=j, col=i) is  (i/dim - x)² + (j/dim - y)² < r², i.e. columns index the
x axis and rows the y axis, with *floor*-aligned (not pixel-center) sampling.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def circular_mask(centers: jnp.ndarray, dim: int, radius: float) -> jnp.ndarray:
    """Build circular region masks.

    Args:
      centers: [..., 2] array of (x, y) centers in [0, 1].
      dim: spatial resolution of the (square) grid.
      radius: region radius in normalized units.

    Returns:
      float32 masks of shape [..., dim, dim] with 1.0 inside the circle.
    """
    axis = jnp.arange(dim, dtype=jnp.float32) / dim
    x = centers[..., 0][..., None, None]  # [..., 1, 1]
    y = centers[..., 1][..., None, None]
    dist_x = (axis[None, :] - x) ** 2  # broadcasts over columns
    dist_y = (axis[:, None] - y) ** 2  # broadcasts over rows
    dist = dist_x + dist_y
    return (dist < radius * radius).astype(jnp.float32)


def flat_circular_mask(
    centers: jnp.ndarray, dim: int, radius: float, active=None
) -> jnp.ndarray:
    """Masks flattened to the token axis, optionally zeroed for padded objects.

    Args:
      centers: [B, N, 2]; active: optional [B, N] (1 = real object).
    Returns:
      [B, N, dim*dim] float32.
    """
    m = circular_mask(centers, dim, radius)  # [B, N, dim, dim]
    m = m.reshape(m.shape[:-2] + (dim * dim,))
    if active is not None:
        m = m * active[..., None].astype(m.dtype)
    return m


def crop_window(center: jnp.ndarray, image_size: int, crop_half: float):
    """Static-size crop window for the per-object CLIP loss.

    Reference (`plms.py:256-270`) clamps the box [c-0.2, c+0.2] to [0, 1] and
    crops a *variable-size* region.  Variable shapes don't jit, so we use the
    TPU-native equivalent: a fixed window of size floor(2*crop_half*image)
    whose start is clamped so the window stays inside the image
    (lax.dynamic_slice semantics).  Away from borders this is identical.

    Returns (start_yx [2] int32, size int).
    """
    size = int(2 * crop_half * image_size)
    cx = center[..., 0] * image_size
    cy = center[..., 1] * image_size
    start_x = jnp.clip(cx - size // 2, 0, image_size - size).astype(jnp.int32)
    start_y = jnp.clip(cy - size // 2, 0, image_size - size).astype(jnp.int32)
    return jnp.stack([start_y, start_x], axis=-1), size


def dynamic_crop(image: jnp.ndarray, start_yx: jnp.ndarray, size: int) -> jnp.ndarray:
    """Crop [H, W, C] image to [size, size, C] at a traced offset."""
    return lax.dynamic_slice(
        image,
        (start_yx[0], start_yx[1], jnp.int32(0)),
        (size, size, image.shape[-1]),
    )
