"""Fused attention Pallas kernel for short sequences (ViT's 129 tokens).

The reference's attention is stock ``nn.MultiheadAttention`` over ≤131
tokens (`modeling/clip/model.py:223-231` in maxingan2412/Signal). On TPU
the win is fusing QKᵀ → softmax → PV into one VMEM-resident kernel: at
L≈129/384 the [L, L] probability tile (≤66 KB fp32) never touches HBM.

One grid program per (batch, head): load q/k/v tiles, one MXU matmul,
row softmax on the VPU in fp32, second MXU matmul. Sequences this short
need no streaming/tiling (classic flash attention's online softmax); the
whole tile fits VMEM with room to spare.

Backward: ``jax.custom_vjp`` recomputes the attention graph in XLA and
differentiates that — fused forward speed, identical gradients.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)          # [L, hd]
    k = k_ref[0].astype(jnp.float32)          # [Lk, hd]
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # [L, Lk]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(probs, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _fused_attention_fwd_impl(q, k, v):
    """q [B, H, Lq, hd], k/v [B, H, Lk, hd] → [B, H, Lq, hd] (fp32)."""
    B, H, Lq, hd = q.shape
    Lk = k.shape[2]
    scale = 1.0 / math.sqrt(hd)

    grid = (B * H,)
    qf = q.reshape(B * H, Lq, hd)
    kf = k.reshape(B * H, Lk, hd)
    vf = v.reshape(B * H, Lk, hd)

    kern = functools.partial(_attn_kernel, scale=scale)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, hd), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Lq, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Lk, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Lk, hd), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Lq, hd), lambda i: (i, 0, 0)),
    )(qf, kf, vf)
    return out.reshape(B, H, Lq, hd)


def _attention_reference(q, k, v):
    """XLA einsum attention — used for the VJP."""
    hd = q.shape[-1]
    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))


@jax.custom_vjp
def _fused_attention(q, k, v):
    return _fused_attention_fwd_impl(q, k, v)


def _fwd(q, k, v):
    return _fused_attention_fwd_impl(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_attention_reference, q, k, v)
    return vjp(g.astype(jnp.float32))


_fused_attention.defvjp(_fwd, _bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, num_heads: int) -> jnp.ndarray:
    """Post-projection fused attention. q [B, Lq, D], k/v [B, Lk, D]."""
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    qh = q.reshape(B, Lq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Lk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Lk, num_heads, hd).transpose(0, 2, 1, 3)
    out = _fused_attention(qh, kh, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, D)
