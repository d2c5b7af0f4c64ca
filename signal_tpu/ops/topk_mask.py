"""Vectorized top-k → binary-mask ops for SIM token selection.

The reference builds selection masks with per-sample Python loops over the
batch (`modeling/AddModule/useA.py:90-93,166-218,265-314` in
maxingan2412/Signal). Here the same semantics are one ``lax.top_k`` plus a
batched scatter — fixed shapes, no host sync, jit-clean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_mask(indices: jnp.ndarray, length: int) -> jnp.ndarray:
    """[B, K] int indices → [B, length] {0,1} float mask."""
    B = indices.shape[0]
    zeros = jnp.zeros((B, length), jnp.float32)
    rows = jnp.arange(B)[:, None]
    return zeros.at[rows, indices].set(1.0)


def topk_mask(scores: jnp.ndarray, k: int) -> jnp.ndarray:
    """[B, L] scores → [B, L] mask with 1s at the top-k positions per row."""
    k = min(k, scores.shape[-1])
    _, idx = jax.lax.top_k(scores, k)
    return scatter_mask(idx, scores.shape[-1])


def exact_keep(mask: jnp.ndarray, scores: jnp.ndarray, max_keep: int) -> jnp.ndarray:
    """Trim/fill ``mask`` to exactly ``max_keep`` ones per row.

    Semantics of the reference's keep_ratio loop (`useA.py:265-314`): rows
    with too many selected keep the top-``max_keep`` selected positions by
    score; rows with too few top up from the highest-scoring unselected
    positions. Equivalent closed form: rank by score + BIG·selected and take
    the top ``max_keep``.
    """
    big = (jnp.max(jnp.abs(scores)) + 1.0) * 4.0
    keyed = scores + big * mask
    return topk_mask(keyed, max_keep)
