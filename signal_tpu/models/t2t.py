"""T2T-ViT backbone (tokens-to-token ViT, 'transformer' token type).

Behavioral mirror of `modeling/backbones/t2t.py` + `token_transformer.py`
(maxingan2412/Signal): two soft-split/Unfold + single-head
token-transformer stages (with the v-skip connection and the INPUT-dim
attention scale quirk), a linear projection to the embed dim, a fixed
sinusoidal positional table, SIE on all tokens, then standard pre-LN
blocks. Registered for TRANSFORMER_TYPE in {'t2t_vit_t_14','t2t_vit_t_24'}
(embed 384, depth 14/24, heads 6, mlp_ratio 3).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from signal_tpu.ops.attention import (
    init_layer_norm,
    layer_norm,
    linear,
    trunc_normal,
)


def sinusoid_pos_embed(n_position: int, d_hid: int) -> jnp.ndarray:
    """Classic sinusoid table (t2t's get_sinusoid_encoding)."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return jnp.asarray(table)


def _unfold(x: jnp.ndarray, k: int, stride: int, pad: int) -> jnp.ndarray:
    """nn.Unfold: [B, C, H, W] → [B, L, C·k·k] patches (channel-major like
    torch: index = c·k·k + ky·k + kx)."""
    B, C, H, W = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    Ho = (H + 2 * pad - k) // stride + 1
    Wo = (W + 2 * pad - k) // stride + 1
    # extract patches via conv trick: gather all k*k offsets
    patches = []
    for ky in range(k):
        for kx in range(k):
            sl = xp[:, :, ky:ky + Ho * stride:stride, kx:kx + Wo * stride:stride]
            patches.append(sl)               # [B, C, Ho, Wo]
    out = jnp.stack(patches, axis=2)         # [B, C, k*k, Ho, Wo]
    out = out.reshape(B, C * k * k, Ho * Wo)
    return out.transpose(0, 2, 1)            # [B, L, C·k·k]


def init_token_transformer(key, dim: int, in_dim: int, mlp_ratio: float = 1.0,
                           dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    hidden = int(in_dim * mlp_ratio)
    return {
        "norm1": init_layer_norm(dim, dtype),
        "qkv_kernel": trunc_normal(k1, (dim, 3 * in_dim), 0.02, dtype),
        "proj": {"kernel": trunc_normal(k2, (in_dim, in_dim), 0.02, dtype),
                 "bias": jnp.zeros((in_dim,), dtype)},
        "norm2": init_layer_norm(in_dim, dtype),
        "mlp": {"fc1": {"kernel": trunc_normal(k3, (in_dim, hidden), 0.02, dtype),
                        "bias": jnp.zeros((hidden,), dtype)},
                "fc2": {"kernel": trunc_normal(k4, (hidden, in_dim), 0.02, dtype),
                        "bias": jnp.zeros((in_dim,), dtype)}},
    }


def token_transformer(params, x: jnp.ndarray, dim: int, in_dim: int,
                      compute_dtype=jnp.float32) -> jnp.ndarray:
    """Single-head token transformer with v-skip (`token_transformer.py`).
    Scale quirk: head_dim of the INPUT dim, not in_dim."""
    h = layer_norm(params["norm1"], x)
    qkv = linear(params["qkv_kernel"], None, h, compute_dtype)   # [B, N, 3·in]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scale = dim ** -0.5
    logits = jnp.einsum("bnd,bmd->bnm", q * scale, k,
                        precision=jax.lax.Precision.HIGHEST)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    o = jnp.einsum("bnm,bmd->bnd", attn, v,
                   precision=jax.lax.Precision.HIGHEST)
    o = linear(params["proj"]["kernel"], params["proj"]["bias"], o, compute_dtype)
    x = v + o                                                     # v-skip
    h = layer_norm(params["norm2"], x)
    h = jax.nn.gelu(linear(params["mlp"]["fc1"]["kernel"],
                           params["mlp"]["fc1"]["bias"], h, compute_dtype),
                    approximate=False)
    h = linear(params["mlp"]["fc2"]["kernel"], params["mlp"]["fc2"]["bias"],
               h, compute_dtype)
    return x + h


def init_t2t_params(key, *, img_size: Tuple[int, int], embed_dim: int = 384,
                    depth: int = 14, token_dim: int = 64,
                    camera_num: int = 0, dtype=jnp.float32):
    from signal_tpu.models.vit_imagenet import init_imagenet_vit_params

    ks = jax.random.split(key, 6)
    H, W = img_size
    num_patches = (H // 16) * (W // 16)   # three soft-splits: 4·2·2

    body = init_imagenet_vit_params(
        ks[0], img_size=(16, 16), width=embed_dim, layers=depth,
        camera_num=camera_num, mlp_ratio=3.0, dtype=dtype)
    # replace the conv patch embed machinery with T2T pieces
    body.pop("patch_embed")
    body["pos_embed"] = sinusoid_pos_embed(num_patches + 1, embed_dim)
    return {
        **body,
        "t2t": {
            "attn1": init_token_transformer(ks[1], 3 * 7 * 7, token_dim, dtype=dtype),
            "attn2": init_token_transformer(ks[2], token_dim * 9, token_dim, dtype=dtype),
            "project": {"kernel": trunc_normal(ks[3], (token_dim * 9, embed_dim), 0.02, dtype),
                        "bias": jnp.zeros((embed_dim,), dtype)},
        },
    }


def t2t_forward(params, images: jnp.ndarray, cam_label=None, *,
                sie_xishu: float = 1.0, num_heads: int = 6,
                compute_dtype=jnp.bfloat16, token_dim: int = 64,
                remat: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images [B, 3, H, W] → (patch tokens [B, L, D], cls [B, D])."""
    from signal_tpu.ops.attention import mha

    B, C, H, W = images.shape
    cdt = jnp.dtype(compute_dtype)
    x32 = images.astype(jnp.float32)

    x = _unfold(x32, 7, 4, 2)                                # [B, L0, 147]
    x = token_transformer(params["t2t"]["attn1"], x, 3 * 49, token_dim)
    h1, w1 = H // 4, W // 4
    x = x.transpose(0, 2, 1).reshape(B, token_dim, h1, w1)
    x = _unfold(x, 3, 2, 1)                                  # [B, L1, 576]
    x = token_transformer(params["t2t"]["attn2"], x, token_dim * 9, token_dim)
    h2, w2 = h1 // 2, w1 // 2
    x = x.transpose(0, 2, 1).reshape(B, token_dim, h2, w2)
    x = _unfold(x, 3, 2, 1)                                  # [B, L2, 576]
    x = linear(params["t2t"]["project"]["kernel"], params["t2t"]["project"]["bias"],
               x, cdt)

    width = x.shape[-1]
    cls_tok = jnp.broadcast_to(params["cls_token"].astype(jnp.float32),
                               (B, 1, width))
    x = jnp.concatenate([cls_tok, x], axis=1)
    x = x + params["pos_embed"].astype(jnp.float32)[None]
    if "sie_embed" in params and cam_label is not None:
        x = x + sie_xishu * params["sie_embed"][cam_label][:, None, :].astype(jnp.float32)

    n_layers = jax.tree.leaves(params["blocks"])[0].shape[0]

    def body(carry, lp):
        h = mha(lp["attn"], layer_norm(lp["ln_1"], carry, eps=1e-6),
                num_heads=num_heads, compute_dtype=cdt)
        carry = carry + h
        m = layer_norm(lp["ln_2"], carry, eps=1e-6)
        m = jax.nn.gelu(linear(lp["mlp"]["fc_kernel"], lp["mlp"]["fc_bias"], m, cdt),
                        approximate=False)
        m = linear(lp["mlp"]["proj_kernel"], lp["mlp"]["proj_bias"], m, cdt)
        return carry + m, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(params["norm"], x, eps=1e-6)
    return x[:, 1:], x[:, 0]
