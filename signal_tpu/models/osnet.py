"""OSNet backbone — the reference CNN zoo's ReID-idiomatic member.

Behavioral mirror of `modeling/backbones/basic_cnn_params/osnet.py`
(maxingan2412/Signal; Zhou et al., ICCV'19): stem 7×7/2 + maxpool 3/2,
three stages of 2 OSBlocks each (omni-scale: four light-conv branches of
depth 1–4, fused by a SHARED channel gate) with 1×1+avgpool transitions
after stages 1–2, then a 1×1 conv head. The reference's fc/classifier
tail is not used by the Signal wrapper pattern (features feed the
BNNeck heads), so like the resnet family the trunk output is exposed as
(grid tokens, pooled vector).

Select `MODEL.TRANSFORMER_TYPE: 'osnet_x1_0'` (or x0_75 / x0_5 / x0_25 —
the forward and importer are structure-driven). Final grid is /16 at
``channels[3]`` features (512 for x1_0).

TPU-native shape (same conventions as ``signal_tpu.models.resnet``):
convs run bf16 on the MXU, BatchNorm fp32 with running stats carried as
an explicit state pytree; the depthwise 3×3 uses
``feature_group_count`` so XLA lowers it to the VPU-friendly grouped
conv instead of C tiny matmuls.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from signal_tpu.models.resnet import _bn_apply, _bn_init, _conv

# reference factory channel tuples (`osnet.py:522-580`); layers [2,2,2]
OSNET_VARIANTS = {
    "osnet_x1_0": (64, 256, 384, 512),
    "osnet_x0_75": (48, 192, 288, 384),
    "osnet_x0_5": (32, 128, 192, 256),
    "osnet_x0_25": (16, 64, 96, 128),
}
# ModelSpec carries only feat_dim (== channels[3]); invert it
OSNET_BY_FEAT_DIM = {v[3]: v for v in OSNET_VARIANTS.values()}
OSNET_LAYERS = (2, 2, 2)
GATE_REDUCTION = 16


def _kaiming(key, shape):
    # kaiming-normal fan_out, relu (`osnet.py:391-400`)
    kh, kw, _, cout = shape
    return math.sqrt(2.0 / (kh * kw * cout)) * jax.random.normal(
        key, shape, jnp.float32)


def _dwconv(x, kernel, compute_dtype=jnp.bfloat16):
    """Depthwise 3×3, stride 1, SAME. kernel [3, 3, 1, C]."""
    prec = (jax.lax.Precision.HIGHEST
            if jnp.dtype(compute_dtype) == jnp.float32 else None)
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype), kernel.astype(compute_dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=kernel.shape[-1],
        precision=prec,
    ).astype(jnp.float32)


def _avgpool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2),
        ((0, 0), (0, 0), (0, 0), (0, 0))) * 0.25


def _init_cbr(key, cin, cout, k):
    """conv+bn unit → (params, state)."""
    p = {"conv": _kaiming(key, (k, k, cin, cout))}
    p["bn"], s = _bn_init(cout)
    return p, {"bn": s}


def _init_block(key, cin, cout) -> Tuple[dict, dict]:
    mid = cout // 4
    keys = iter(jax.random.split(key, 32))
    p: dict = {}
    s: dict = {}
    p["conv1"], s["conv1"] = _init_cbr(next(keys), cin, mid, 1)
    # branches t = 1..4 LightConv3x3 each: pw 1×1 (no bn) + dw 3×3 + bn
    branches = []
    branches_s = []
    for t in range(1, 5):
        lights, lights_s = [], []
        for _ in range(t):
            lp = {"pw": _kaiming(next(keys), (1, 1, mid, mid)),
                  "dw": _kaiming(next(keys), (3, 3, 1, mid))}
            lp["bn"], ls = _bn_init(mid)
            lights.append(lp)
            lights_s.append({"bn": ls})
        branches.append(lights)
        branches_s.append(lights_s)
    p["branches"] = branches
    s["branches"] = branches_s
    # shared ChannelGate (`osnet.py:268`: ONE gate applied to all four
    # branch outputs): 1×1 convs on the pooled vector == dense layers
    red = mid // GATE_REDUCTION
    p["gate"] = {
        "fc1_kernel": _kaiming(next(keys), (1, 1, mid, red))[0, 0],
        "fc1_bias": jnp.zeros((red,), jnp.float32),
        "fc2_kernel": _kaiming(next(keys), (1, 1, red, mid))[0, 0],
        "fc2_bias": jnp.zeros((mid,), jnp.float32),
    }
    p["conv3"], s["conv3"] = _init_cbr(next(keys), mid, cout, 1)
    if cin != cout:
        p["down"], s["down"] = _init_cbr(next(keys), cin, cout, 1)
    return p, s


def init_osnet_params(key, channels: Sequence[int] = OSNET_VARIANTS["osnet_x1_0"],
                      layers: Sequence[int] = OSNET_LAYERS) -> Tuple[dict, dict]:
    """→ (params, bn_state) pytrees with matching structure."""
    keys = iter(jax.random.split(key, 64))
    params: dict = {}
    state: dict = {}
    params["stem"], state["stem"] = _init_cbr(next(keys), 3, channels[0], 7)
    cin = channels[0]
    for si, cout in enumerate(channels[1:]):
        blocks, blocks_s = [], []
        for _ in range(layers[si]):
            bp, bs = _init_block(next(keys), cin, cout)
            blocks.append(bp)
            blocks_s.append(bs)
            cin = cout
        stage = {"blocks": blocks}
        stage_s = {"blocks": blocks_s}
        if si < 2:  # reduce_spatial_size on stages 1-2 (`osnet.py:304-318`)
            stage["trans"], stage_s["trans"] = _init_cbr(next(keys), cout, cout, 1)
        params[f"stage{si + 1}"] = stage
        state[f"stage{si + 1}"] = stage_s
    params["conv5"], state["conv5"] = _init_cbr(
        next(keys), channels[3], channels[3], 1)
    return params, state


def _cbr(p, s, x, *, stride=1, relu=True, training, compute_dtype):
    h = _conv(x, p["conv"], stride, compute_dtype)
    h, new_bn = _bn_apply(p["bn"], s["bn"], h, training=training)
    return (jax.nn.relu(h) if relu else h), {"bn": new_bn}


def _gate(gp, x):
    """Shared channel gate: gap → fc1 → relu → fc2 → sigmoid → scale."""
    pooled = jnp.mean(x, axis=(2, 3))                      # [B, mid]
    h = jax.nn.relu(pooled @ gp["fc1_kernel"] + gp["fc1_bias"])
    g = jax.nn.sigmoid(h @ gp["fc2_kernel"] + gp["fc2_bias"])
    return x * g[:, :, None, None]


def _os_block(p, s, x, *, training, compute_dtype):
    new_s: dict = {}
    x1, new_s["conv1"] = _cbr(p["conv1"], s["conv1"], x,
                              training=training, compute_dtype=compute_dtype)
    fused = None
    new_branches = []
    for lights, lights_s in zip(p["branches"], s["branches"]):
        h = x1
        new_lights = []
        for lp, ls in zip(lights, lights_s):
            h = _conv(h, lp["pw"], 1, compute_dtype)       # 1×1, linear
            h = _dwconv(h, lp["dw"], compute_dtype)        # dw 3×3
            h, nbn = _bn_apply(lp["bn"], ls["bn"], h, training=training)
            h = jax.nn.relu(h)
            new_lights.append({"bn": nbn})
        g = _gate(p["gate"], h)
        fused = g if fused is None else fused + g
        new_branches.append(new_lights)
    new_s["branches"] = new_branches
    x3, new_s["conv3"] = _cbr(p["conv3"], s["conv3"], fused, relu=False,
                              training=training, compute_dtype=compute_dtype)
    if "down" in p:
        identity, new_s["down"] = _cbr(p["down"], s["down"], x, relu=False,
                                       training=training,
                                       compute_dtype=compute_dtype)
    else:
        identity = x
    return jax.nn.relu(x3 + identity), new_s


def osnet_forward(params, bn_state, images, *, training: bool = False,
                  compute_dtype=jnp.bfloat16):
    """images [B, 3, H, W] → (tokens [B, (H/16)(W/16), C3],
    pooled [B, C3], new_bn_state)."""
    new_state: dict = {}
    x, new_state["stem"] = _cbr(params["stem"], bn_state["stem"], images,
                                stride=2, training=training,
                                compute_dtype=compute_dtype)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        ((0, 0), (0, 0), (1, 1), (1, 1)))

    for si in (1, 2, 3):
        sp, ss = params[f"stage{si}"], bn_state[f"stage{si}"]
        new_blocks = []
        for bp, bs in zip(sp["blocks"], ss["blocks"]):
            x, nb = _os_block(bp, bs, x, training=training,
                              compute_dtype=compute_dtype)
            new_blocks.append(nb)
        stage_new = {"blocks": new_blocks}
        if "trans" in sp:
            x, stage_new["trans"] = _cbr(sp["trans"], ss["trans"], x,
                                         training=training,
                                         compute_dtype=compute_dtype)
            x = _avgpool2(x)
        new_state[f"stage{si}"] = stage_new

    x, new_state["conv5"] = _cbr(params["conv5"], bn_state["conv5"], x,
                                 training=training,
                                 compute_dtype=compute_dtype)
    B, C = x.shape[0], x.shape[1]
    tokens = x.reshape(B, C, -1).transpose(0, 2, 1)
    pooled = jnp.mean(x, axis=(2, 3))
    return tokens, pooled, new_state


def load_torchreid_osnet(path: str, params, bn_state):
    """Import a torchreid osnet .pth (`osnet.py:441-519` naming:
    conv1/conv2.{0,1,2}/conv3/conv4/conv5) into the pytrees."""
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

    def cbr(dst_p, dst_s, prefix):
        dst_p["conv"] = conv(f"{prefix}.conv.weight")
        dst_p["bn"], dst_s["bn"] = bn(f"{prefix}.bn")

    p = jax.tree.map(lambda x: x, params)
    s = jax.tree.map(lambda x: x, bn_state)
    cbr(p["stem"], s["stem"], "conv1")
    branch_names = ("conv2a", "conv2b", "conv2c", "conv2d")
    for si in (1, 2, 3):
        tname = f"conv{si + 1}"
        sp, ss = p[f"stage{si}"], s[f"stage{si}"]
        for bi, (bp, bs) in enumerate(zip(sp["blocks"], ss["blocks"])):
            pre = f"{tname}.{bi}"
            cbr(bp["conv1"], bs["conv1"], f"{pre}.conv1")
            for t, (lights, lights_s) in enumerate(
                    zip(bp["branches"], bs["branches"])):
                bn_name = branch_names[t]
                for li, (lp, ls) in enumerate(zip(lights, lights_s)):
                    sub = (f"{pre}.{bn_name}" if t == 0
                           else f"{pre}.{bn_name}.{li}")
                    lp["pw"] = conv(f"{sub}.conv1.weight")
                    lp["dw"] = jnp.transpose(
                        jnp.asarray(sd[f"{sub}.conv2.weight"]), (2, 3, 1, 0))
                    lp["bn"], ls["bn"] = bn(f"{sub}.bn")
            bp["gate"]["fc1_kernel"] = jnp.asarray(
                sd[f"{pre}.gate.fc1.weight"])[:, :, 0, 0].T
            bp["gate"]["fc1_bias"] = jnp.asarray(sd[f"{pre}.gate.fc1.bias"])
            bp["gate"]["fc2_kernel"] = jnp.asarray(
                sd[f"{pre}.gate.fc2.weight"])[:, :, 0, 0].T
            bp["gate"]["fc2_bias"] = jnp.asarray(sd[f"{pre}.gate.fc2.bias"])
            cbr(bp["conv3"], bs["conv3"], f"{pre}.conv3")
            if "down" in bp:
                cbr(bp["down"], bs["down"], f"{pre}.downsample")
        if "trans" in sp:
            cbr(sp["trans"], ss["trans"], f"{tname}.{len(sp['blocks'])}.0")
    cbr(p["conv5"], s["conv5"], "conv5")
    return p, s
