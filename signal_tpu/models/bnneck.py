"""BNNeck — functional BatchNorm1d with running statistics.

Mirrors the reference's BNNeck heads (`modeling/make_model.py:77-117` in
maxingan2412/Signal): affine BatchNorm1d whose bias is frozen at zero
(``bias.requires_grad_(False)``), batch statistics in training, running
statistics at eval. State (running mean/var) is carried explicitly as a
pytree, the JAX-native version of torch buffers.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def init_bnneck(dim: int, dtype=jnp.float32):
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {
        "mean": jnp.zeros((dim,), jnp.float32),
        "var": jnp.ones((dim,), jnp.float32),
    }
    return params, state


def bnneck_apply(
    params,
    state,
    x: jnp.ndarray,
    *,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, dict]:
    """x [B, D] → (normalized [B, D], new_state). fp32 numerics."""
    x32 = x.astype(jnp.float32)
    if training:
        mean = jnp.mean(x32, axis=0)
        var = jnp.var(x32, axis=0)  # biased, used for normalization
        n = x32.shape[0]
        unbiased = var * (n / max(n - 1, 1))  # torch tracks unbiased var
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x32 - mean) / jnp.sqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y, new_state
