"""Pairwise distance matrices, fully on device.

The reference computes ‖q‖² + ‖g‖² − 2 q·gᵀ on GPU then round-trips to CPU
numpy (`utils/metrics.py:284`, `layers/triplet_loss.py:16-31` in
maxingan2412/Signal). Here both the train-time [B, B] matrix and the eval
[Nq, Ng] matrix stay in HBM: one GEMM plus rank-1 row/col terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def euclidean_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distance, [M, N], fp32 (true-fp32 GEMM — bf16
    passes would corrupt close rankings)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xx = jnp.sum(x * x, axis=1)[:, None]
    yy = jnp.sum(y * y, axis=1)[None, :]
    xy = jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
    return xx + yy - 2.0 * xy


def euclidean_distmat(x: jnp.ndarray, y: jnp.ndarray, min_clamp: float = 1e-12) -> jnp.ndarray:
    """sqrt of the clamped squared distance (reference clamps at 1e-12)."""
    return jnp.sqrt(jnp.clip(euclidean_sqdist(x, y), min_clamp, None))
