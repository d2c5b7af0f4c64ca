"""Attention / norm / activation primitives.

Numerics mirror the reference's torch building blocks
(`modeling/clip/model.py:154-231`, `modeling/AddModule/useA.py:328-411` in
maxingan2412/Signal) but are expressed TPU-first:

* matmuls run in a configurable compute dtype (bf16 on TPU) with fp32
  accumulation (``preferred_element_type``), mirroring the reference's AMP
  autocast;
* LayerNorm and softmax always run in fp32 (the reference subclasses
  ``nn.LayerNorm`` to force fp32 under fp16 autocast);
* the attention core can be swapped for a fused Pallas flash-attention
  kernel (`signal_tpu.ops.flash_attention`) — the einsum path below is the
  reference implementation XLA fuses on its own.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """fp32 LayerNorm over the last axis; returns x's original dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def _prec(compute_dtype):
    """fp32 compute means TRUE fp32 (DEFAULT precision may take bf16
    passes on MXU / AMX hosts); bf16 compute uses the fast path."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(compute_dtype) == jnp.float32 else None)


def linear(kernel: jnp.ndarray, bias, x: jnp.ndarray,
           compute_dtype=jnp.bfloat16, out_dtype=None) -> jnp.ndarray:
    """x @ kernel + bias with bf16 matmul / fp32 accumulation.

    ``out_dtype``: cast the (f32-accumulated, f32-bias-added) result —
    used to keep wide intermediates (MLP hidden, q/k/v) in bf16 so they
    cross HBM at half the bytes (the consumer casts to bf16 anyway)."""
    y = jnp.dot(
        x.astype(compute_dtype),
        kernel.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=_prec(compute_dtype),
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y if out_dtype is None else y.astype(out_dtype)


def _attention_core(q, k, v, num_heads: int, compute_dtype=jnp.bfloat16,
                    mask=None, scale=None):
    """Softmax attention. q: [B, Lq, D], k/v: [B, Lk, D] (post-projection).
    ``mask``: additive [Lq, Lk] bias (e.g. causal −inf upper triangle).
    ``scale``: qk scale override (default 1/√head_dim)."""
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    q = q.reshape(B, Lq, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, Lk, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, Lk, num_heads, hd).transpose(0, 2, 1, 3)

    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk",
        (q * scale).astype(compute_dtype),
        k.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=_prec(compute_dtype),
    )
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)[None, None]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs.astype(compute_dtype),
        v.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=_prec(compute_dtype),
    )
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, D)


def mha(
    params,
    q_in: jnp.ndarray,
    kv_in: jnp.ndarray | None = None,
    *,
    num_heads: int,
    compute_dtype=jnp.bfloat16,
    use_flash: bool = False,
    mask=None,
    scale=None,
) -> jnp.ndarray:
    """Multi-head (self or cross) attention with torch packed-QKV layout.

    ``params``: qkv_kernel [D, 3D], qkv_bias [3D], out_kernel [D, D],
    out_bias [D] — the transposed view of ``nn.MultiheadAttention``'s
    ``in_proj_weight`` / ``out_proj`` so checkpoints convert 1:1.
    """
    if kv_in is None:
        kv_in = q_in
    D = q_in.shape[-1]
    # NOTE: a packed single [D, 3D] projection GEMM feeding the Pallas
    # kernel via column-window BlockSpecs was measured SLOWER in training
    # (453 vs 474 samples/s): its backward needs a dq|dk|dv concatenate
    # that outweighs the forward's saved bytes. Three split GEMMs let
    # each gradient feed its weight-grad GEMM directly.
    wq, wk, wv = jnp.split(params["qkv_kernel"], 3, axis=1)
    bq, bk, bv = jnp.split(params["qkv_bias"], 3, axis=0)
    q = linear(wq, bq, q_in, compute_dtype)
    k = linear(wk, bk, kv_in, compute_dtype)
    v = linear(wv, bv, kv_in, compute_dtype)
    if use_flash and mask is None and scale is None:
        from signal_tpu.ops.flash_attention import flash_attention

        out = flash_attention(q, k, v, num_heads=num_heads,
                              compute_dtype=compute_dtype)
    else:
        out = _attention_core(q, k, v, num_heads, compute_dtype,
                              mask=mask, scale=scale)
    return linear(params["out_kernel"], params["out_bias"], out, compute_dtype)


def init_mha(key, dim: int, dtype=jnp.float32):
    """Init matching nn.MultiheadAttention's `_reset_parameters`:
    xavier-uniform over the PACKED [3D, D] in_proj (fan = D + 3D), zero
    biases; out_proj keeps torch Linear's kaiming-uniform
    (bound = 1/√fan_in) with its bias zeroed."""
    k1, k2 = jax.random.split(key)
    in_bound = math.sqrt(6.0 / (dim + 3 * dim))
    qkv = jax.random.uniform(k1, (dim, 3 * dim), dtype, -in_bound, in_bound)
    out_bound = 1.0 / math.sqrt(dim)
    out = jax.random.uniform(k2, (dim, dim), dtype, -out_bound, out_bound)
    return {
        "qkv_kernel": qkv,
        "qkv_bias": jnp.zeros((3 * dim,), dtype),
        "out_kernel": out,
        "out_bias": jnp.zeros((dim,), dtype),
    }


def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """Truncated normal in (-2σ, 2σ), matching timm's trunc_normal_."""
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std
