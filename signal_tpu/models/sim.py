"""SIM — Selective Interaction Module, vectorized for TPU.

Behavioral mirror of `modeling/AddModule/useA.py` (maxingan2412/Signal):

* intra-modal selection (`useA.py:50-96`): per-modality CLS attends its own
  patches; top-k1 mask.
* inter-modal selection (`useA.py:98-221`): projected CLS stack attends the
  3L concatenated patches; per-modality cross-scores exclude the own
  modality; top-k2 = 2k indices mapped back onto per-modality masks.
* union of masks (`useA.py:249-251`), optional exact keep_ratio trim/fill
  (`useA.py:253-314`).
* masked patches (zero vectors — they still participate as K/V, shifting
  softmax mass, `useA.py:316-320,383`) fused into the CLS stack by an
  8-head MHCA + FFN block (`useA.py:328-411`), output [B, 3·dim].

The reference's per-sample Python index loops become one batched scatter
(`signal_tpu.ops.topk_mask`): identical masks, no host round-trips, and
the whole module jits into a handful of fused XLA ops.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from signal_tpu.ops.attention import init_layer_norm, init_mha, layer_norm, linear, mha, trunc_normal
from signal_tpu.ops.topk_mask import exact_keep, scatter_mask, topk_mask


def init_sim_params(key, dim: int, dtype=jnp.float32):
    ks = jax.random.split(key, 8)

    def lin(k, din, dout):
        # nn.Linear default init: kaiming-uniform(a=√5) ≡ U(±1/√din) kernel,
        # U(±1/√din) bias.
        k1, k2 = jax.random.split(k)
        bound = 1.0 / math.sqrt(din)
        return {
            "kernel": jax.random.uniform(k1, (din, dout), dtype, -bound, bound),
            "bias": jax.random.uniform(k2, (dout,), dtype, -bound, bound),
        }

    return {
        "select": {
            # W_v exists in the reference but is unused (`useA.py:48`);
            # kept for checkpoint-shape parity.
            "W_q": lin(ks[0], dim, dim),
            "W_k": lin(ks[1], dim, dim),
            "W_v": lin(ks[2], dim, dim),
        },
        "interact": {
            "cross_attn": init_mha(ks[3], dim, dtype),
            "ffn": {
                "fc1": lin(ks[4], dim, 2 * dim),
                "fc2": lin(ks[5], 2 * dim, dim),
            },
            "norm1": init_layer_norm(dim, dtype),
            "norm2": init_layer_norm(dim, dtype),
        },
    }


def _intra_masks(patches: jnp.ndarray, cls: jnp.ndarray, k1: int) -> jnp.ndarray:
    """patches [B, 3, L, D], cls [B, 3, D] → masks [B, 3, L]."""
    dim = patches.shape[-1]
    # selection scores are tiny vs encoder cost; keep them true-fp32 so
    # top-k index choices are deterministic across platforms
    scores = jnp.einsum("bmd,bmld->bml", cls, patches,
                        precision=jax.lax.Precision.HIGHEST) / math.sqrt(dim)
    scores = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    B, M, L = scores.shape
    return topk_mask(scores.reshape(B * M, L), k1).reshape(B, M, L)


def _inter_masks(
    patches: jnp.ndarray, cls: jnp.ndarray, select_params, k2: int
) -> jnp.ndarray:
    """Cross-modal selection. patches [B, 3, L, D], cls [B, 3, D] → [B, 3, L]."""
    B, M, L, D = patches.shape
    q = linear(select_params["W_q"]["kernel"], select_params["W_q"]["bias"], cls,
               compute_dtype=jnp.float32)                                               # [B, 3, D]
    keys = patches.reshape(B, M * L, D)
    k = linear(select_params["W_k"]["kernel"], select_params["W_k"]["bias"], keys,
               compute_dtype=jnp.float32)                                               # [B, 3L, D]
    scores = jnp.einsum("bmd,bnd->bmn", q, k,
                        precision=jax.lax.Precision.HIGHEST) / math.sqrt(D)
    scores = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)                        # [B, 3, 3L]

    # For querying modality m, the two other modalities' score slices are
    # concatenated in ascending modality order (matches `useA.py:136-151`).
    others = [[1, 2], [0, 2], [0, 1]]
    kk = min(k2, 2 * L)
    # votes[m] accumulates, per target modality, the mask positions chosen
    # by the *other* modalities' CLS tokens.
    votes = jnp.zeros((B, M, L), jnp.float32)
    for m in range(M):
        a, b = others[m]
        cross = jnp.concatenate([scores[:, m, a * L:(a + 1) * L],
                                 scores[:, m, b * L:(b + 1) * L]], axis=-1)  # [B, 2L]
        _, idx = jax.lax.top_k(cross, kk)                                    # [B, kk]
        flat = scatter_mask(idx, 2 * L)                                      # [B, 2L]
        votes = votes.at[:, a].max(flat[:, :L])
        votes = votes.at[:, b].max(flat[:, L:])
    return votes


def token_selection(
    patches: jnp.ndarray,
    cls: jnp.ndarray,
    select_params,
    *,
    k: int,
    keep_ratio: float | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (selected_patches [B, 3, L, D], masks [B, 3, L])."""
    B, M, L, D = patches.shape
    inter = _inter_masks(patches, cls, select_params, 2 * k)
    intra = _intra_masks(patches, cls, min(k, L))
    masks = ((inter + intra) > 0).astype(jnp.float32)

    if keep_ratio is not None:
        max_keep = int(L * keep_ratio)
        # raw CLS·patch scores (no softmax/scale), `useA.py:259-261`
        raw = jnp.einsum("bmd,bmld->bml", cls, patches,
                         precision=jax.lax.Precision.HIGHEST).astype(jnp.float32)
        masks = exact_keep(
            masks.reshape(B * M, L), raw.reshape(B * M, L), max_keep
        ).reshape(B, M, L)

    return patches * masks[..., None], masks


def modal_interactive(
    params, selected: jnp.ndarray, cls: jnp.ndarray, *, num_heads: int = 8, compute_dtype=jnp.bfloat16
) -> jnp.ndarray:
    """MHCA fusion → [B, 3·D]. selected [B, 3, L, D], cls [B, 3, D]."""
    B, M, L, D = selected.shape
    kv = selected.reshape(B, M * L, D)
    attn = mha(params["cross_attn"], cls, kv, num_heads=num_heads, compute_dtype=compute_dtype)
    x = layer_norm(params["norm1"], cls + attn)
    h = jax.nn.gelu(linear(params["ffn"]["fc1"]["kernel"], params["ffn"]["fc1"]["bias"], x, compute_dtype), approximate=False)
    h = linear(params["ffn"]["fc2"]["kernel"], params["ffn"]["fc2"]["bias"], h, compute_dtype)
    x = layer_norm(params["norm2"], x + h)
    return x.reshape(B, M * D)


def sim_forward(
    params,
    patches: jnp.ndarray,
    cls: jnp.ndarray,
    *,
    k: int,
    keep_ratio: float | None = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full SIM. patches [B, 3, L, D] (RGB, NI, TI order), cls [B, 3, D].

    Returns (fused [B, 3·D], masks dict for visualization — the reference
    stashes them as `last_masks`, `useA.py:323`).
    """
    selected, masks = token_selection(patches, cls, params["select"], k=k, keep_ratio=keep_ratio)
    fused = modal_interactive(params["interact"], selected, cls, compute_dtype=compute_dtype)
    mask_dict = {"RGB": masks[:, 0], "NI": masks[:, 1], "TI": masks[:, 2]}
    return fused, mask_dict
