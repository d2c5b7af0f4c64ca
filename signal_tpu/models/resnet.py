"""ResNet-50/101/152 backbones — the reference CNN zoo's bottleneck family.

The reference ships 22 classic CNN backbones under
`modeling/backbones/basic_cnn_params/` (maxingan2412/Signal) that its
model factory never reaches (`make_model.py:294-301` lists only ViT
flavors). Here the classic ReID CNN — ResNet-50 with last-stride-1
(bag-of-tricks convention, `basic_cnn_params/resnet.py` semantics) — is
a first-class backbone: select `MODEL.TRANSFORMER_TYPE: 'resnet50'`
(or 'resnet101' / 'resnet152' — the forward and torchvision importer
are structure-driven, so one implementation serves the family).

TPU-native shape: convolutions run bf16 on the MXU with fp32
accumulation; BatchNorm is fp32 with running statistics carried as an
explicit state pytree (same convention as the BNNecks). The final
feature map doubles as the "patch token" grid for SIM/GAM/LAM —
positions are tokens [B, H·W, 2048] and the global-average-pooled vector
is the CLS analogue.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

BOTTLENECK_COUNTS = (3, 4, 6, 3)
# depth (as spec.layers) → per-stage bottleneck counts
RESNET_BLOCK_COUNTS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                       152: (3, 8, 36, 3)}
EXPANSION = 4


def _conv_init(key, shape, fan_out_from=None):
    # kaiming-normal fan_out (torchvision resnet init)
    kh, kw, cin, cout = shape
    fan_out = kh * kw * cout if fan_out_from is None else fan_out_from
    return math.sqrt(2.0 / fan_out) * jax.random.normal(key, shape, jnp.float32)


def _bn_init(c):
    return ({"scale": jnp.ones((c,), jnp.float32),
             "bias": jnp.zeros((c,), jnp.float32)},
            {"mean": jnp.zeros((c,), jnp.float32),
             "var": jnp.ones((c,), jnp.float32)})


def _bn_apply(params, state, x, *, training: bool, momentum=0.1, eps=1e-5):
    """x [B, C, H, W], stats over (B, H, W). fp32 numerics."""
    x32 = x.astype(jnp.float32)
    if training:
        mean = jnp.mean(x32, axis=(0, 2, 3))
        var = jnp.var(x32, axis=(0, 2, 3))
        n = x32.shape[0] * x32.shape[2] * x32.shape[3]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {"mean": (1 - momentum) * state["mean"] + momentum * mean,
                     "var": (1 - momentum) * state["var"] + momentum * unbiased}
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x32 - mean[None, :, None, None]) / jnp.sqrt(var[None, :, None, None] + eps)
    return (y * params["scale"][None, :, None, None]
            + params["bias"][None, :, None, None]), new_state


def _conv(x, kernel, stride=1, compute_dtype=jnp.bfloat16):
    prec = (jax.lax.Precision.HIGHEST
            if jnp.dtype(compute_dtype) == jnp.float32 else None)
    kh = kernel.shape[0]
    pad = (kh - 1) // 2
    # bf16 in/out then cast (fp32 accumulation happens inside the MXU);
    # preferred_element_type=f32 is NOT usable here — its conv-transpose
    # grad rule rejects the mixed bf16/fp32 operands (same note as the
    # ViT patch embed, models/vit.py)
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype), kernel.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        precision=prec,
    ).astype(jnp.float32)


def init_resnet50_params(key, last_stride: int = 1,
                         block_counts: Tuple[int, ...] = BOTTLENECK_COUNTS,
                         ) -> Tuple[dict, dict]:
    """→ (params, bn_state), both pytrees with matching structure.

    ``block_counts`` selects the bottleneck family member: (3,4,6,3) =
    resnet50, (3,4,23,3) = resnet101, (3,8,36,3) = resnet152 — the
    forward and the torchvision importer are structure-driven, so the
    whole family shares one implementation."""
    keys = iter(jax.random.split(key, 256))
    params: dict = {"stem": {"conv": _conv_init(next(keys), (7, 7, 3, 64))}}
    state: dict = {"stem": {}}
    params["stem"]["bn"], state["stem"]["bn"] = _bn_init(64)

    cin = 64
    widths = (64, 128, 256, 512)
    for si, (w, n_blocks) in enumerate(zip(widths, block_counts)):
        stage_p, stage_s = [], []
        stride = 1 if si == 0 else (last_stride if si == 3 else 2)
        for bi in range(n_blocks):
            p: dict = {}
            s: dict = {}
            p["conv1"] = _conv_init(next(keys), (1, 1, cin, w))
            p["bn1"], s["bn1"] = _bn_init(w)
            p["conv2"] = _conv_init(next(keys), (3, 3, w, w))
            p["bn2"], s["bn2"] = _bn_init(w)
            p["conv3"] = _conv_init(next(keys), (1, 1, w, w * EXPANSION))
            p["bn3"], s["bn3"] = _bn_init(w * EXPANSION)
            if bi == 0:
                p["down_conv"] = _conv_init(next(keys), (1, 1, cin, w * EXPANSION))
                p["down_bn"], s["down_bn"] = _bn_init(w * EXPANSION)
            stage_p.append(p)
            stage_s.append(s)
            cin = w * EXPANSION
        params[f"layer{si + 1}"] = stage_p
        state[f"layer{si + 1}"] = stage_s
        del stride  # stride is re-derived in forward (static)
    return params, state


def _bottleneck(p, s, x, *, stride: int, training: bool, compute_dtype):
    new_s: dict = {}
    h = _conv(x, p["conv1"], 1, compute_dtype)
    h, new_s["bn1"] = _bn_apply(p["bn1"], s["bn1"], h, training=training)
    h = jax.nn.relu(h)
    h = _conv(h, p["conv2"], stride, compute_dtype)
    h, new_s["bn2"] = _bn_apply(p["bn2"], s["bn2"], h, training=training)
    h = jax.nn.relu(h)
    h = _conv(h, p["conv3"], 1, compute_dtype)
    h, new_s["bn3"] = _bn_apply(p["bn3"], s["bn3"], h, training=training)
    if "down_conv" in p:
        # strided 1x1 projection shortcut on the first block of a stage
        sc = _conv(x, p["down_conv"], stride, compute_dtype)
        sc, new_s["down_bn"] = _bn_apply(p["down_bn"], s["down_bn"], sc,
                                         training=training)
    else:
        sc = x
    return jax.nn.relu(h + sc), new_s


def resnet50_forward(params, bn_state, images, *, training: bool = False,
                     last_stride: int = 1, compute_dtype=jnp.bfloat16):
    """images [B, 3, H, W] → (tokens [B, (H/16)(W/16), 2048],
    pooled [B, 2048], new_bn_state)."""
    new_state: dict = {"stem": {}}
    x = _conv(images, params["stem"]["conv"], 2, compute_dtype)
    x, new_state["stem"]["bn"] = _bn_apply(params["stem"]["bn"],
                                           bn_state["stem"]["bn"], x,
                                           training=training)
    x = jax.nn.relu(x)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        ((0, 0), (0, 0), (1, 1), (1, 1)))

    for si in range(4):
        stage_stride = 1 if si == 0 else (last_stride if si == 3 else 2)
        stage_new = []
        for bi, (p, s) in enumerate(zip(params[f"layer{si + 1}"],
                                        bn_state[f"layer{si + 1}"])):
            x, ns = _bottleneck(p, s, x,
                                stride=stage_stride if bi == 0 else 1,
                                training=training,
                                compute_dtype=compute_dtype)
            stage_new.append(ns)
        new_state[f"layer{si + 1}"] = stage_new

    B, C = x.shape[0], x.shape[1]
    tokens = x.reshape(B, C, -1).transpose(0, 2, 1)     # [B, HW, 2048]
    pooled = jnp.mean(x, axis=(2, 3))                    # [B, 2048]
    return tokens, pooled, new_state


def load_torchvision_resnet50(path: str, params, bn_state):
    """Import a torchvision/timm resnet50 .pth into the pytrees
    (analogue of `basic_cnn_params/resnet.py`'s load_param)."""
    import numpy as np
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", ""): v.float().numpy()
          for k, v in sd.items() if hasattr(v, "numpy")}

    def conv(name):
        return jnp.transpose(jnp.asarray(sd[name]), (2, 3, 1, 0))  # OIHW→HWIO

    def bn(prefix):
        return ({"scale": jnp.asarray(sd[f"{prefix}.weight"]),
                 "bias": jnp.asarray(sd[f"{prefix}.bias"])},
                {"mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
                 "var": jnp.asarray(sd[f"{prefix}.running_var"])})

    p = jax.tree.map(lambda x: x, params)
    s = jax.tree.map(lambda x: x, bn_state)
    p["stem"]["conv"] = conv("conv1.weight")
    p["stem"]["bn"], s["stem"]["bn"] = bn("bn1")
    for si in range(4):
        for bi in range(len(p[f"layer{si + 1}"])):
            pre = f"layer{si + 1}.{bi}"
            blk_p = p[f"layer{si + 1}"][bi]
            blk_s = s[f"layer{si + 1}"][bi]
            for ci in (1, 2, 3):
                blk_p[f"conv{ci}"] = conv(f"{pre}.conv{ci}.weight")
                blk_p[f"bn{ci}"], blk_s[f"bn{ci}"] = bn(f"{pre}.bn{ci}")
            if "down_conv" in blk_p:
                blk_p["down_conv"] = conv(f"{pre}.downsample.0.weight")
                blk_p["down_bn"], blk_s["down_bn"] = bn(f"{pre}.downsample.1")
    return p, s
