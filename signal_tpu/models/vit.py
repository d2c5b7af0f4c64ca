"""CLIP ViT-B/16 vision tower, TPU-first.

Behavioral mirror of the reference's CLIP ``VisionTransformer``
(`modeling/clip/model.py:419-488` in maxingan2412/Signal) with the
camera SIE embedding applied to the CLS token
(`meta_arch.py:96-112`, `clip/model.py:454-456`):

  conv 16×16/16 patch embed (no bias) → [CLS] + pos-embed → ln_pre →
  12 × pre-LN (MHA → +res → MLP(QuickGELU) → +res) → ln_post → proj 768→512

TPU-first choices:
* the 12 blocks run as one ``lax.scan`` over stacked parameters (compact
  HLO, fast compiles, weight layout friendly to tensor-parallel sharding);
* all three modalities are batched into one encoder call upstream
  ([3B, …] instead of 3 sequential calls, `make_model.py:181-183`) —
  numerically identical because weights are shared and LN/attention are
  per-sample;
* matmuls in bf16 with fp32 accumulation; LN/softmax fp32 (the reference's
  fp16-safe LayerNorm, `clip/model.py:154-160`).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from signal_tpu.ops.attention import (
    init_layer_norm,
    init_mha,
    layer_norm,
    linear,
    mha,
    quick_gelu,
    trunc_normal,
)


def init_vit_params(
    key,
    *,
    h_resolution: int,
    w_resolution: int,
    patch_size: int = 16,
    width: int = 768,
    layers: int = 12,
    output_dim: int = 512,
    dtype=jnp.float32,
):
    """Random init (CLIP checkpoints overwrite these in practice)."""
    keys = jax.random.split(key, 8)
    scale = width ** -0.5
    n_tokens = h_resolution * w_resolution + 1

    block_keys = jax.random.split(keys[6], layers)
    attn = [init_mha(k, width, dtype) for k in block_keys]
    mlp_keys = jax.random.split(keys[7], layers)

    def init_mlp(k):
        k1, k2 = jax.random.split(k)
        return {
            "fc_kernel": trunc_normal(k1, (width, 4 * width), 0.02, dtype),
            "fc_bias": jnp.zeros((4 * width,), dtype),
            "proj_kernel": trunc_normal(k2, (4 * width, width), 0.02, dtype),
            "proj_bias": jnp.zeros((width,), dtype),
        }

    mlps = [init_mlp(k) for k in mlp_keys]

    def stack(trees):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    ln_unit = lambda: init_layer_norm(width, dtype)  # noqa: E731
    return {
        "conv1": {"kernel": trunc_normal(keys[0], (patch_size, patch_size, 3, width), scale, dtype)},
        "class_embedding": scale * jax.random.normal(keys[1], (width,), dtype),
        "positional_embedding": scale * jax.random.normal(keys[2], (n_tokens, width), dtype),
        "ln_pre": ln_unit(),
        "blocks": {
            "ln_1": stack([ln_unit() for _ in range(layers)]),
            "attn": stack(attn),
            "ln_2": stack([ln_unit() for _ in range(layers)]),
            "mlp": stack(mlps),
        },
        "ln_post": ln_unit(),
        "proj": scale * jax.random.normal(keys[3], (width, output_dim), dtype),
    }


def _block(params, x, *, num_heads: int, compute_dtype, use_flash: bool):
    x = x + mha(
        params["attn"],
        layer_norm(params["ln_1"], x),
        num_heads=num_heads,
        compute_dtype=compute_dtype,
        use_flash=use_flash,
    )
    h = layer_norm(params["ln_2"], x)
    h = quick_gelu(linear(params["mlp"]["fc_kernel"], params["mlp"]["fc_bias"], h, compute_dtype))
    h = linear(params["mlp"]["proj_kernel"], params["mlp"]["proj_bias"], h, compute_dtype)
    return x + h


def vit_forward(
    params,
    images: jnp.ndarray,
    cv_emb: jnp.ndarray | None = None,
    *,
    num_heads: int = 12,
    compute_dtype=jnp.bfloat16,
    use_flash: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images [B, 3, H, W] → (patch_tokens [B, L, out], cls [B, out]).

    ``cv_emb`` [B, width]: SIE camera embedding added to the CLS token only
    (reference `clip/model.py:454-456`).
    """
    B = images.shape[0]
    kernel = params["conv1"]["kernel"]
    patch = kernel.shape[0]
    compute_dtype = jnp.dtype(compute_dtype)
    # bf16 in/out (fp32 accumulation happens inside the MXU); avoid
    # preferred_element_type here — its conv-transpose grad rule rejects
    # mixed bf16/fp32 operands.
    x = jax.lax.conv_general_dilated(
        images.astype(compute_dtype),
        kernel.astype(compute_dtype),
        window_strides=(patch, patch),
        padding="VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    ).astype(jnp.float32)  # [B, width, h, w]
    width = x.shape[1]
    x = x.reshape(B, width, -1).transpose(0, 2, 1)  # [B, L, width]

    cls_tok = jnp.broadcast_to(params["class_embedding"].astype(jnp.float32), (B, 1, width))
    if cv_emb is not None:
        cls_tok = cls_tok + cv_emb[:, None, :].astype(jnp.float32)
    x = jnp.concatenate([cls_tok, x], axis=1)
    x = x + params["positional_embedding"].astype(jnp.float32)[None]
    x = layer_norm(params["ln_pre"], x)

    def body(carry, layer_params):
        return _block(layer_params, carry, num_heads=num_heads,
                      compute_dtype=compute_dtype, use_flash=use_flash), None

    x, _ = jax.lax.scan(body, x, params["blocks"])

    x = layer_norm(params["ln_post"], x)
    x = jnp.dot(
        x.astype(compute_dtype),
        params["proj"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return x[:, 1:], x[:, 0]


def resize_pos_embed(posemb: jnp.ndarray, h_new: int, w_new: int) -> jnp.ndarray:
    """Bilinear-resize a square [L+1, width] pos-embed grid to (h_new, w_new).

    Matches the reference's checkpoint-load resize
    (`clip/model.py:712-729`): token 0 kept, grid reshaped to
    gs×gs and ``F.interpolate(mode='bilinear')`` (align_corners=False ≡
    jax.image.resize 'bilinear' half-pixel centers).
    """
    tok, grid = posemb[:1], posemb[1:]
    gs_old = int(math.sqrt(grid.shape[0]))
    width = grid.shape[-1]
    grid = grid.reshape(gs_old, gs_old, width)
    grid = jax.image.resize(grid, (h_new, w_new, width), method="bilinear")
    return jnp.concatenate([tok, grid.reshape(h_new * w_new, width)], axis=0)
