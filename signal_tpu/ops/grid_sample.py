"""Bilinear grid sampling (the LAM/DAS hot op).

Replaces ``F.grid_sample(mode='bilinear', align_corners=True)``
(`modeling/AddModule/DAS.py:158-163` in maxingan2412/Signal). The sampled
grid is tiny (4×2 points from a 16×8 map), so a gather-based XLA
formulation is already bandwidth-optimal; it vectorizes over batch and
channels with static shapes and is fully differentiable w.r.t. both the
input and the grid (needed: DAS backprops into its offset conv).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_grid_sample(x: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = True) -> jnp.ndarray:
    """Sample ``x`` at ``grid`` locations, torch ``grid_sample`` semantics.

    x:    [B, C, H, W]
    grid: [B, Hg, Wg, 2] with (x, y) order, coords in [-1, 1]
    Returns [B, C, Hg, Wg]. Out-of-range locations use zero padding.
    """
    B, C, H, W = x.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    if align_corners:
        ix = (gx + 1.0) * 0.5 * (W - 1)
        iy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        ix = ((gx + 1.0) * W - 1.0) * 0.5
        iy = ((gy + 1.0) * H - 1.0) * 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1.0
    iy1 = iy0 + 1.0

    wx1 = ix - ix0
    wy1 = iy - iy0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(iy_f, ix_f):
        valid = (ix_f >= 0) & (ix_f <= W - 1) & (iy_f >= 0) & (iy_f <= H - 1)
        xi = jnp.clip(ix_f, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(iy_f, 0, H - 1).astype(jnp.int32)
        flat = x.reshape(B, C, H * W)
        idx = (yi * W + xi).reshape(B, -1)                       # [B, Hg*Wg]
        vals = jnp.take_along_axis(flat, idx[:, None, :], axis=2)  # [B, C, Hg*Wg]
        vals = vals.reshape(B, C, *iy_f.shape[1:])
        return vals * valid[:, None].astype(vals.dtype)

    out = (
        gather(iy0, ix0) * (wy0 * wx0)[:, None]
        + gather(iy0, ix1) * (wy0 * wx1)[:, None]
        + gather(iy1, ix0) * (wy1 * wx0)[:, None]
        + gather(iy1, ix1) * (wy1 * wx1)[:, None]
    )
    return out.astype(x.dtype)
