"""Fused attention Pallas kernel for short sequences (ViT's 129 tokens).

The reference's attention is stock ``nn.MultiheadAttention`` over ≤131
tokens (`modeling/clip/model.py:223-231` in maxingan2412/Signal). On TPU
the win is fusing QKᵀ → softmax → PV into one VMEM-resident kernel: at
L≈129/384 the [L, L] probability tile (≤66 KB fp32) never touches HBM.

Kernel shape notes (v5e, measured):

* matmuls run on **bf16 inputs with fp32 accumulation** — an fp32-input
  dot runs at ~1/8 the MXU rate and made the first version of this
  kernel lose to XLA's fused attention;
* TPU grid programs execute **sequentially** on the core, so one program
  per (batch, head) = 4608 tiny pipelines at the bench shape; instead
  each program processes a tile of T (batch·head) pairs as one batched
  dot_general;
* softmax stays fp32 on the VPU (parity with the fp32-LayerNorm AMP
  regime); sequences this short need no online-softmax streaming — the
  whole [T, L, L] tile fits VMEM.

Backward: a second fused kernel per tile — recompute P in VMEM, then the
five-matmul gradient algebra (dV = Pᵀg, dS = P∘(dP − rowsum(dP∘P)),
dQ/dK) without materializing [L, L] in HBM either direction.
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
    q = q_ref[...]                             # [T, L, hd] compute dtype
    k = k_ref[...]
    v = v_ref[...]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                  # [T, L, Lk] fp32
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.astype(o_ref.dtype)


def _pick_tile(n: int, preferred: int = 16) -> int:
    for t in (preferred, 8, 4, 2, 1):
        if n % t == 0:
            return t
    return 1


def _fused_attention_fwd_impl(q, k, v):
    """q [B, H, Lq, hd], k/v [B, H, Lk, hd] → [B, H, Lq, hd] (q's dtype)."""
    B, H, Lq, hd = q.shape
    Lk = k.shape[2]
    scale = 1.0 / math.sqrt(hd)
    T = _pick_tile(B * H)

    grid = (B * H // T,)
    qf = q.reshape(B * H, Lq, hd)
    kf = k.reshape(B * H, Lk, hd)
    vf = v.reshape(B * H, Lk, hd)

    kern = functools.partial(_attn_kernel, scale=scale)
    # interpret mode lets the CPU test suite validate kernel numerics
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, hd), q.dtype),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((T, Lq, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((T, Lk, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((T, Lk, hd), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((T, Lq, hd), lambda i: (i, 0, 0)),
    )(qf, kf, vf)
    return out.reshape(B, H, Lq, hd)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                     *, scale: float):
    """Fused attention backward for one (batch·head) tile.

    Recompute P = softmax(scale·QKᵀ) in VMEM, then
      dV = Pᵀ·g,  dP = g·Vᵀ,  dS = P∘(dP − rowsum(dP∘P)),
      dQ = scale·dS·K,  dK = scale·dSᵀ·Q
    — five MXU matmuls, softmax algebra fp32 on the VPU, nothing in HBM
    but the inputs and the three gradients."""
    q = q_ref[...]                             # [T, L, hd]
    k = k_ref[...]
    v = v_ref[...]
    g = g_ref[...]
    bt = (((2,), (2,)), ((0,), (0,)))          # contract last dims, batch 0
    logits = jax.lax.dot_general(
        q, k, bt, preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)          # [T, L, Lk] fp32
    pc = p.astype(v.dtype)
    # dV = Pᵀ g : contract the q-length dim of both
    dv = jax.lax.dot_general(
        pc, g, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    # dP = g Vᵀ
    dp = jax.lax.dot_general(
        g, v, bt, preferred_element_type=jnp.float32)   # [T, L, Lk]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsc = ds.astype(q.dtype)
    # dQ = scale · dS K : contract Lk
    dq = jax.lax.dot_general(
        dsc, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    # dK = scale · dSᵀ Q : contract Lq
    dk = jax.lax.dot_general(
        dsc, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _fused_attention_bwd_impl(q, k, v, g):
    B, H, Lq, hd = q.shape
    Lk = k.shape[2]
    scale = 1.0 / math.sqrt(hd)
    T = _pick_tile(B * H)
    grid = (B * H // T,)

    def flat(x, L):
        return x.reshape(B * H, L, hd)

    kern = functools.partial(_attn_bwd_kernel, scale=scale)
    interpret = jax.default_backend() not in ("tpu", "axon")
    spec_q = pl.BlockSpec((T, Lq, hd), lambda i: (i, 0, 0))
    spec_k = pl.BlockSpec((T, Lk, hd), lambda i: (i, 0, 0))
    dq, dk, dv = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Lq, hd), q.dtype),
            jax.ShapeDtypeStruct((B * H, Lk, hd), k.dtype),
            jax.ShapeDtypeStruct((B * H, Lk, hd), v.dtype),
        ),
        grid=grid,
        in_specs=[spec_q, spec_k, spec_k, spec_q],
        out_specs=(spec_q, spec_k, spec_k),
        interpret=interpret,
    )(flat(q, Lq), flat(k, Lk), flat(v, Lk), flat(g, Lq))
    return (dq.reshape(B, H, Lq, hd), dk.reshape(B, H, Lk, hd),
            dv.reshape(B, H, Lk, hd))


@jax.custom_vjp
def _fused_attention(q, k, v):
    return _fused_attention_fwd_impl(q, k, v)


def _fwd(q, k, v):
    return _fused_attention_fwd_impl(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    return _fused_attention_bwd_impl(q, k, v, g.astype(q.dtype))


_fused_attention.defvjp(_fwd, _bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    num_heads: int, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Post-projection fused attention. q [B, Lq, D], k/v [B, Lk, D].
    Inputs arrive fp32 from the projections; matmuls run in
    ``compute_dtype`` (softmax always fp32 inside the kernel)."""
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    cd = jnp.dtype(compute_dtype)
    qh = q.astype(cd).reshape(B, Lq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.astype(cd).reshape(B, Lk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.astype(cd).reshape(B, Lk, num_heads, hd).transpose(0, 2, 1, 3)
    out = _fused_attention(qh, kh, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, D)
