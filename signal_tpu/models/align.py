"""GAM + LAM alignment losses (the reference's `AlignmentM`).

Behavioral mirror of `modeling/AddModule/useB.py` and
`modeling/AddModule/DAS.py` (maxingan2412/Signal):

* GAM (`useB.py:76-126`): mean-pool patches → L2-normalize → pairwise 3×3
  Gram-determinant volume matrix V[B,B] (closed form on TPU, see
  `signal_tpu.ops.volume`) → symmetric label-smoothed CE on −V/τ with a
  learnable temperature (init 0.07). Kept in fp32 (det gradients are
  steep near alignment).
* LAM (`useB.py:128-167`): tokens → [B, D, H, W] grid; three per-modality
  DAS modules predict a 1-channel offset field that is broadcast to (dy,
  dx) via the per-axis range factors (`DAS.py:140-148` — the [1,2,1,1]
  reshape broadcasts one scalar field over both axes), added to reference
  points that intentionally exceed [-1,1] before clamping
  (`DAS.py:91-103`), then bilinear-sampled; pairwise MSE of the three
  sampled maps.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from signal_tpu.ops.grid_sample import bilinear_grid_sample
from signal_tpu.ops.volume import gram_volume3


# --------------------------------------------------------------------------
# DAS — deformable offset sampling
# --------------------------------------------------------------------------

def init_das_params(key, channels: int, ksize: int = 4, dtype=jnp.float32):
    """Offset net: 1×1 conv → GELU → depthwise k×k stride-k conv → GELU →
    1×1 conv to 1 channel (no bias); plus a 1×1 query projection."""
    ks = jax.random.split(key, 4)

    def conv_init(k, shape, fan_in):
        # torch Conv2d default: kaiming-uniform(a=√5) ⇒ U(±1/√fan_in)
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(k, shape, dtype, -bound, bound)

    c = channels
    return {
        "proj_q": {
            "kernel": conv_init(ks[0], (1, 1, c, c), c),
            "bias": jnp.zeros((c,), dtype),
        },
        "off_conv1": {
            "kernel": conv_init(ks[1], (1, 1, c, c), c),
            "bias": jnp.zeros((c,), dtype),
        },
        # depthwise: HWIO with feature_group_count=c → [k, k, 1, c]
        "off_dw": {
            "kernel": conv_init(ks[2], (ksize, ksize, 1, c), ksize * ksize),
            "bias": jnp.zeros((c,), dtype),
        },
        "off_out": {
            "kernel": conv_init(ks[3], (1, 1, c, 1), c),
        },
    }


def _conv(x, kernel, bias=None, stride=1, groups=1):
    # tiny convs; run them in true fp32 (DEFAULT precision may take bf16
    # passes on MXU/AMX, and the offsets feed coordinate arithmetic)
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if bias is not None:
        y = y + bias[None, :, None, None]
    return y


def das_reference_points(hk: int, wk: int) -> jnp.ndarray:
    """[hk, wk, 2] (y, x) reference points, reference normalization
    (`DAS.py:91-103`): centers (0.5 … n−0.5) divided by (n−1) — the top-right
    corners exceed +1 by design and get clamped after the offset add."""
    ys = (jnp.arange(hk, dtype=jnp.float32) + 0.5) / max(hk - 1.0, 1.0) * 2.0 - 1.0
    xs = (jnp.arange(wk, dtype=jnp.float32) + 0.5) / max(wk - 1.0, 1.0) * 2.0 - 1.0
    ref = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)
    return ref


def das_sample_positions(params, x32: jnp.ndarray, *, stride: int = 4,
                         offset_range_factor: float = 2.0) -> jnp.ndarray:
    """Offset half of DAS: x [B, C, H, W] fp32 → clamped sample positions
    [B, Hk, Wk, 2] in (y, x) normalized coords. Shared by the forward and
    the offset-field visualization (`zablation/offestvisual.py`)."""
    B, C, H, W = x32.shape
    if H < stride or W < stride:
        # the k×k stride-k VALID offset conv would produce an empty tensor
        # (torch errors the same way on the reference's Conv2d, `DAS.py:60`)
        raise ValueError(
            f"DAS needs a patch grid of at least {stride}x{stride}, got "
            f"{H}x{W}; the Signal configs use 16x8 (256x128 images)")
    q = _conv(x32, params["proj_q"]["kernel"], params["proj_q"]["bias"])
    h = _conv(q, params["off_conv1"]["kernel"], params["off_conv1"]["bias"])
    h = jax.nn.gelu(h, approximate=False)
    h = _conv(h, params["off_dw"]["kernel"], params["off_dw"]["bias"], stride=stride, groups=C)
    h = jax.nn.gelu(h, approximate=False)
    offset = _conv(h, params["off_out"]["kernel"])  # [B, 1, Hk, Wk]
    hk, wk = offset.shape[2], offset.shape[3]

    if offset_range_factor > 0:
        rng = jnp.array([1.0 / max(hk - 1.0, 1.0), 1.0 / max(wk - 1.0, 1.0)], jnp.float32)
        offset = jnp.tanh(offset) * rng[None, :, None, None] * offset_range_factor  # [B, 2, Hk, Wk]
    else:
        offset = jnp.broadcast_to(offset, (B, 2, hk, wk))

    offset = offset.transpose(0, 2, 3, 1)  # [B, Hk, Wk, 2] (dy, dx)
    return jnp.clip(offset + das_reference_points(hk, wk)[None], -1.0, 1.0)


def das_forward(params, x: jnp.ndarray, *, stride: int = 4, offset_range_factor: float = 2.0) -> jnp.ndarray:
    """x [B, C, H, W] → sampled [B, C, H/stride, W/stride]."""
    x32 = x.astype(jnp.float32)
    pos = das_sample_positions(params, x32, stride=stride,
                               offset_range_factor=offset_range_factor)
    grid_xy = pos[..., ::-1]  # grid_sample wants (x, y)
    return bilinear_grid_sample(x32, grid_xy, align_corners=True).astype(x.dtype)


# --------------------------------------------------------------------------
# AlignmentM — GAM + LAM
# --------------------------------------------------------------------------

def init_align_params(key, feat_dim: int, dtype=jnp.float32):
    k_r, k_n, k_t = jax.random.split(key, 3)
    return {
        "contra_temp": jnp.asarray(0.07, jnp.float32),
        "DAS_r": init_das_params(k_r, feat_dim, dtype=dtype),
        "DAS_n": init_das_params(k_n, feat_dim, dtype=dtype),
        "DAS_t": init_das_params(k_t, feat_dim, dtype=dtype),
    }


def _smooth_ce(logits: jnp.ndarray, smoothing: float = 0.1) -> jnp.ndarray:
    """CE against the diagonal with label smoothing (torch semantics)."""
    n = logits.shape[0]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    diag = jnp.einsum("ii->i", logp)
    # smoothed target: (1-ε) on the diagonal + ε/N everywhere
    loss = -(1.0 - smoothing) * diag - smoothing * jnp.mean(logp, axis=-1)
    return jnp.mean(loss)


def gam_loss(patches: jnp.ndarray, contra_temp: jnp.ndarray) -> jnp.ndarray:
    """patches [B, 3, L, D] (RGB, NI, TI) → scalar GAM loss (fp32)."""
    feats = jnp.mean(patches.astype(jnp.float32), axis=2)  # [B, 3, D]
    feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
    v = gram_volume3(feats[:, 0], feats[:, 1], feats[:, 2]) / contra_temp
    return 0.5 * (_smooth_ce(-v) + _smooth_ce(-v.T))


def lam_loss(params, patches: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """patches [B, 3, L, D] → scalar LAM loss. h·w must equal L."""
    B, M, L, D = patches.shape
    grids = patches.astype(jnp.float32).reshape(B, M, h, w, D).transpose(0, 1, 4, 2, 3)
    r = das_forward(params["DAS_r"], grids[:, 0])
    n = das_forward(params["DAS_n"], grids[:, 1])
    t = das_forward(params["DAS_t"], grids[:, 2])
    mse = lambda a, b: jnp.mean((a - b) ** 2)  # noqa: E731
    return (mse(n, r) + mse(t, r) + mse(t, n)) / 3.0


def align_forward(params, patches: jnp.ndarray, *, h: int, w: int, stage: str) -> Tuple[jnp.ndarray, jnp.ndarray | None]:
    """stage='CLS' → (gam, None); 'together_CLS_Patch' → (gam, lam)."""
    gam = gam_loss(patches, params["contra_temp"])
    if stage == "CLS":
        return gam, None
    return gam, lam_loss(params, patches, h, w)
