"""ImageNet-pretrained timm-style ViT tower (TransReID flavor).

Behavioral mirror of `modeling/backbones/vit_pytorch.py` (Trans,
maxingan2412/Signal): overlapping conv patch embed (`PatchEmbed_overlap`,
l.286-324), SIE embedding added to ALL tokens scaled by sie_xishu
(l.422-429), pre-LN blocks with standard-GELU MLP and LN eps 1e-6
(`vit_base_patch16_224`, l.486-494), stochastic depth (DropPath,
l.48-77), final LayerNorm, no output projection (feat dim = width).

Selected by MODEL.TRANSFORMER_TYPE='vit_base_patch16_224'
(`meta_arch.py:54-64`). Variant dims come from the factory fns
(`vit_pytorch.py:487-521`): base/deit_base 768×12L×12H mlp4;
vit_small 768×8L×8H mlp3 with qk_scale=768^-0.5 (its qkv_bias=False is
approximated by a zero-init bias); deit_small 384×12L×6H mlp4.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from signal_tpu.ops.attention import (
    init_layer_norm,
    layer_norm,
    linear,
    mha,
    trunc_normal,
)


def init_imagenet_vit_params(
    key,
    *,
    img_size: Tuple[int, int],
    patch_size: int = 16,
    stride_size: int = 16,
    width: int = 768,
    layers: int = 12,
    camera_num: int = 0,
    view_num: int = 0,
    mlp_ratio: float = 4.0,
    dtype=jnp.float32,
):
    keys = jax.random.split(key, 8)
    num_y = (img_size[0] - patch_size) // stride_size + 1
    num_x = (img_size[1] - patch_size) // stride_size + 1
    n_tokens = num_y * num_x + 1
    hidden = int(width * mlp_ratio)

    def lin(k, din, dout):
        k1, _ = jax.random.split(k)
        return {"kernel": trunc_normal(k1, (din, dout), 0.02, dtype),
                "bias": jnp.zeros((dout,), dtype)}

    block_keys = jax.random.split(keys[3], layers)
    blocks = []
    for bk in block_keys:
        k1, k2, k3 = jax.random.split(bk, 3)
        blocks.append({
            "ln_1": init_layer_norm(width, dtype),
            "attn": {
                "qkv_kernel": trunc_normal(k1, (width, 3 * width), 0.02, dtype),
                "qkv_bias": jnp.zeros((3 * width,), dtype),
                "out_kernel": trunc_normal(k2, (width, width), 0.02, dtype),
                "out_bias": jnp.zeros((width,), dtype),
            },
            "ln_2": init_layer_norm(width, dtype),
            "mlp": {
                "fc_kernel": trunc_normal(k3, (width, hidden), 0.02, dtype),
                "fc_bias": jnp.zeros((hidden,), dtype),
                "proj_kernel": trunc_normal(jax.random.fold_in(k3, 1), (hidden, width), 0.02, dtype),
                "proj_bias": jnp.zeros((width,), dtype),
            },
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    # conv init: normal(0, sqrt(2/n)), n = k*k*out (`vit_pytorch.py:304-307`)
    n = patch_size * patch_size * width
    params = {
        "patch_embed": {
            "kernel": math.sqrt(2.0 / n) * jax.random.normal(
                keys[0], (patch_size, patch_size, 3, width), dtype),
            "bias": jnp.zeros((width,), dtype),
        },
        # trunc_normal(0.02) like the reference (`vit_pytorch.py:390`)
        "cls_token": trunc_normal(keys[4], (width,), 0.02, dtype),
        "pos_embed": trunc_normal(keys[1], (n_tokens, width), 0.02, dtype),
        "blocks": stacked,
        "norm": init_layer_norm(width, dtype),
    }
    # SIE slots (`vit_pytorch.py:421-428`): cam·view when both present,
    # else whichever axis is >1
    if camera_num > 1 and view_num > 1:
        slots = camera_num * view_num
    elif camera_num > 1 or view_num > 1:
        slots = max(camera_num, view_num)
    else:
        slots = 0
    if slots:
        params["sie_embed"] = trunc_normal(keys[2], (slots, width), 0.02, dtype)
    return params


def imagenet_vit_forward(
    params,
    images: jnp.ndarray,
    cam_label=None,
    view_label=None,
    *,
    camera_num: int = 0,
    view_num: int = 0,
    sie_xishu: float = 1.0,
    num_heads: int = 12,
    stride_size: int = 16,
    drop_path_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    use_flash: bool = False,
    qk_scale: Optional[float] = None,
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images [B, 3, H, W] → (patch_tokens [B, L, width], cls [B, width])."""
    B = images.shape[0]
    compute_dtype = jnp.dtype(compute_dtype)
    kernel = params["patch_embed"]["kernel"]
    patch = kernel.shape[0]
    x = jax.lax.conv_general_dilated(
        images.astype(compute_dtype), kernel.astype(compute_dtype),
        window_strides=(stride_size, stride_size), padding="VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    ).astype(jnp.float32)
    x = x + params["patch_embed"]["bias"].astype(jnp.float32)[None, :, None, None]
    width = x.shape[1]
    x = x.reshape(B, width, -1).transpose(0, 2, 1)

    cls_tok = jnp.broadcast_to(params["cls_token"].astype(jnp.float32), (B, 1, width))
    x = jnp.concatenate([cls_tok, x], axis=1)
    x = x + params["pos_embed"].astype(jnp.float32)[None]
    if "sie_embed" in params:
        # SIE added to ALL tokens here (CLS-only in the CLIP tower);
        # index selection mirrors `vit_pytorch.py:422-428`
        idx = None
        if camera_num > 1 and view_num > 1 and cam_label is not None \
                and view_label is not None:
            idx = cam_label * view_num + view_label
        elif camera_num > 1 and cam_label is not None:
            idx = cam_label
        elif view_num > 1 and view_label is not None:
            idx = view_label
        if idx is not None:
            x = x + sie_xishu * params["sie_embed"][idx][:, None, :].astype(jnp.float32)

    n_layers = jax.tree.leaves(params["blocks"])[0].shape[0]
    # timm stochastic-depth decay: rate_i = i/(L-1) · drop_path_rate
    dp_rates = [drop_path_rate * i / max(n_layers - 1, 1) for i in range(n_layers)]

    def block(i, x, layer_params, key_i):
        h = mha(layer_params["attn"], layer_norm(layer_params["ln_1"], x, eps=1e-6),
                num_heads=num_heads, compute_dtype=compute_dtype,
                use_flash=use_flash, scale=qk_scale)
        x = x + _drop_path(h, dp_rates[i], key_i if rng is not None else None, salt=0)
        h = layer_norm(layer_params["ln_2"], x, eps=1e-6)
        h = jax.nn.gelu(linear(layer_params["mlp"]["fc_kernel"],
                               layer_params["mlp"]["fc_bias"], h, compute_dtype),
                        approximate=False)
        h = linear(layer_params["mlp"]["proj_kernel"], layer_params["mlp"]["proj_bias"],
                   h, compute_dtype)
        x = x + _drop_path(h, dp_rates[i], key_i if rng is not None else None, salt=1)
        return x

    # drop-path rates differ per layer → unrolled loop (12 blocks; XLA
    # still shares code across identical-rate layers at compile time)
    layer_list = [jax.tree.map(lambda a, i=i: a[i], params["blocks"])
                  for i in range(n_layers)]
    for i, lp in enumerate(layer_list):
        key_i = jax.random.fold_in(rng, i) if rng is not None else None
        if remat:
            # same memory/recompute trade as the CLIP tower: without it the
            # 12-block activations exceed v5e HBM at the reference batch
            x = jax.checkpoint(
                lambda lp, x, k, i=i: block(i, x, lp, k))(lp, x, key_i)
        else:
            x = block(i, x, lp, key_i)

    x = layer_norm(params["norm"], x, eps=1e-6)
    return x[:, 1:], x[:, 0]


def _drop_path(h: jnp.ndarray, rate: float, key, salt: int) -> jnp.ndarray:
    """Stochastic depth (`vit_pytorch.py:48-65`): per-sample binary keep,
    output scaled by 1/keep_prob. Identity when rate=0 or no rng (eval)."""
    if rate == 0.0 or key is None:
        return h
    keep = 1.0 - rate
    key = jax.random.fold_in(key, salt)
    mask = jax.random.bernoulli(key, keep, (h.shape[0],) + (1,) * (h.ndim - 1))
    return h * mask.astype(h.dtype) / keep


def load_timm_vit_params(path: str, params, num_y: int, num_x: int):
    """Import a timm/TransReID .pth into the pytree (`Trans.load_param`,
    `vit_pytorch.py:440-465`), resizing pos_embed to the ReID grid."""
    import numpy as np
    import torch

    from signal_tpu.models.vit import resize_pos_embed

    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict"):
        if isinstance(sd, dict) and key in sd:
            sd = sd[key]
    sd = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    p = jax.tree.map(lambda x: x, params)  # shallow copy tree
    if "patch_embed.proj.weight" in sd:
        p["patch_embed"]["kernel"] = jnp.transpose(
            jnp.asarray(sd["patch_embed.proj.weight"]), (2, 3, 1, 0))
        p["patch_embed"]["bias"] = jnp.asarray(sd["patch_embed.proj.bias"])
    if "cls_token" in sd:
        p["cls_token"] = jnp.asarray(sd["cls_token"]).reshape(-1)
    if "pos_embed" in sd:
        pos = jnp.asarray(sd["pos_embed"])[0]
        if "distilled" in path:
            pos = jnp.concatenate([pos[:1], pos[2:]], axis=0)
        p["pos_embed"] = resize_pos_embed(pos, num_y, num_x)
    if "norm.weight" in sd:
        p["norm"] = {"scale": jnp.asarray(sd["norm.weight"]),
                     "bias": jnp.asarray(sd["norm.bias"])}

    n_layers = jax.tree.leaves(params["blocks"])[0].shape[0]

    def stack(fmt, transpose=False):
        arrs = []
        for i in range(n_layers):
            a = jnp.asarray(sd[fmt.format(i)])
            arrs.append(a.T if transpose else a)
        return jnp.stack(arrs)

    p["blocks"] = {
        "ln_1": {"scale": stack("blocks.{}.norm1.weight"),
                 "bias": stack("blocks.{}.norm1.bias")},
        "attn": {
            "qkv_kernel": stack("blocks.{}.attn.qkv.weight", transpose=True),
            "qkv_bias": stack("blocks.{}.attn.qkv.bias"),
            "out_kernel": stack("blocks.{}.attn.proj.weight", transpose=True),
            "out_bias": stack("blocks.{}.attn.proj.bias"),
        },
        "ln_2": {"scale": stack("blocks.{}.norm2.weight"),
                 "bias": stack("blocks.{}.norm2.bias")},
        "mlp": {
            "fc_kernel": stack("blocks.{}.mlp.fc1.weight", transpose=True),
            "fc_bias": stack("blocks.{}.mlp.fc1.bias"),
            "proj_kernel": stack("blocks.{}.mlp.fc2.weight", transpose=True),
            "proj_bias": stack("blocks.{}.mlp.fc2.bias"),
        },
    }
    return p
