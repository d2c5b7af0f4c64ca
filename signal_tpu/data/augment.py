"""On-device train-time augmentation (jitted, batched, fused into the
train step).

The reference runs torchvision transforms in dataloader worker processes
(`data/datasets/make_dataloader.py:186-194` in maxingan2412/Signal):
Resize(bicubic) → RandomHorizontalFlip(p) → Pad(10) → RandomCrop →
Normalize → RandomErasing('pixel'). TPU-first split: the irregular work
(JPEG decode + bicubic resize + normalize) runs in the native C++ decoder
(`native/decoder.cpp`), while flip/pad+crop/erase — pure elementwise and
gather ops on static shapes — run HERE as one jitted function on device,
fused by XLA into the forward pass. Each modality draws independent
randomness (each torchvision call drew fresh randomness, `bases.py:103`).

Distribution-parity notes (semantics, not bit-exact RNG):
* pad fills with pixel value 0, which is (0 − mean)/std AFTER the
  normalize the decoder already applied — so the fill is −mean/std;
* RandomErasing 'pixel' mode draws per-pixel N(0,1) in normalized space
  and rejects up to 10 invalid geometries (timm's loop,
  `make_dataloader.py:100-122`) — here all 10 candidates are drawn at
  once and the first valid one is selected.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def normalize_images(imgs, mean: Sequence[float], std: Sequence[float]):
    """Device-side torchvision ``Normalize``: uint8 [B, 3, H, W] pixels →
    float32 ``(x/255 − mean)/std``. The affine is fused by XLA into the
    patch-embed conv; shipping uint8 instead of pre-normalized float32
    quarters host→device transfer (the hot wire on a TPU-VM). Float
    inputs pass through untouched (already normalized on the host).

    Also accepts a packed [B, 3modal, 3ch, H, W] array (the single-buffer
    H2D path) — the channel axis is then dim 2."""
    a = jnp.asarray([1.0 / (255.0 * s) for s in std], jnp.float32)
    b = jnp.asarray([-m / s for m, s in zip(mean, std)], jnp.float32)
    if not isinstance(imgs, dict):
        if imgs.dtype != jnp.uint8:
            return imgs
        return (imgs.astype(jnp.float32) * a[None, None, :, None, None]
                + b[None, None, :, None, None])
    out = {}
    for name, x in imgs.items():
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * a[None, :, None, None] \
                + b[None, :, None, None]
        out[name] = x
    return out


def _flip(key, x: jnp.ndarray, prob: float) -> jnp.ndarray:
    do = jax.random.uniform(key, (x.shape[0],)) < prob
    return jnp.where(do[:, None, None, None], x[..., ::-1], x)


def _pad_crop(key, x: jnp.ndarray, pad: int, fill: jnp.ndarray) -> jnp.ndarray:
    B, C, H, W = x.shape
    xp = jnp.pad(x - fill[None, :, None, None],
                 ((0, 0), (0, 0), (pad, pad), (pad, pad))) \
        + fill[None, :, None, None]
    ky, kx = jax.random.split(key)
    ty = jax.random.randint(ky, (B,), 0, 2 * pad + 1)
    tx = jax.random.randint(kx, (B,), 0, 2 * pad + 1)

    def crop(img, y0, x0):
        return jax.lax.dynamic_slice(img, (0, y0, x0), (C, H, W))

    return jax.vmap(crop)(xp, ty, tx)


def _erase(key, x: jnp.ndarray, prob: float, min_area: float = 0.02,
           max_area: float = 1 / 3, min_aspect: float = 0.3) -> jnp.ndarray:
    B, C, H, W = x.shape
    ks = jax.random.split(key, 6)
    area = float(H * W)
    la0, la1 = jnp.log(min_aspect), jnp.log(1.0 / min_aspect)
    # 10 candidate geometries per sample; first valid wins (timm's loop)
    target = jax.random.uniform(ks[0], (B, 10), minval=min_area,
                                maxval=max_area) * area
    aspect = jnp.exp(jax.random.uniform(ks[1], (B, 10), minval=la0, maxval=la1))
    hs = jnp.round(jnp.sqrt(target * aspect)).astype(jnp.int32)
    ws = jnp.round(jnp.sqrt(target / aspect)).astype(jnp.int32)
    valid = (hs < H) & (ws < W) & (hs > 0) & (ws > 0)
    pick = jnp.argmax(valid, axis=1)                       # first True
    any_valid = jnp.any(valid, axis=1)
    h = jnp.take_along_axis(hs, pick[:, None], 1)[:, 0]
    w = jnp.take_along_axis(ws, pick[:, None], 1)[:, 0]
    # top/left uniform over the data-dependent ranges [0, H-h] × [0, W-w]
    u_t = jax.random.uniform(ks[2], (B,))
    u_l = jax.random.uniform(ks[3], (B,))
    top = jnp.floor(u_t * (H - h + 1).astype(jnp.float32)).astype(jnp.int32)
    left = jnp.floor(u_l * (W - w + 1).astype(jnp.float32)).astype(jnp.int32)
    rows = jnp.arange(H)[None, :]
    cols = jnp.arange(W)[None, :]
    rmask = (rows >= top[:, None]) & (rows < (top + h)[:, None])   # [B, H]
    cmask = (cols >= left[:, None]) & (cols < (left + w)[:, None])  # [B, W]
    region = rmask[:, None, :, None] & cmask[:, None, None, :]      # [B,1,H,W]
    do = (jax.random.uniform(ks[4], (B,)) < prob) & any_valid
    region = region & do[:, None, None, None]
    noise = jax.random.normal(ks[5], x.shape, x.dtype)
    return jnp.where(region, noise, x)


@partial(jax.jit, static_argnames=("flip_prob", "re_prob", "padding"))
def augment_batch(
    rng,
    imgs: Dict[str, jnp.ndarray],
    *,
    flip_prob: float = 0.5,
    re_prob: float = 0.5,
    padding: int = 10,
    fill: Tuple[float, ...] = (-1.0, -1.0, -1.0),
) -> Dict[str, jnp.ndarray]:
    """{'RGB','NI','TI'} each [B, 3, H, W] (already resized+normalized) →
    same shapes, flip/pad+crop/erase applied with per-modality randomness.
    ``fill`` = (0 − mean)/std per channel."""
    fill_arr = jnp.asarray(fill, jnp.float32)
    out = {}
    for i, (name, x) in enumerate(sorted(imgs.items())):
        k = jax.random.fold_in(rng, i)
        kf, kc, ke = jax.random.split(k, 3)
        x = _flip(kf, x, flip_prob)
        if padding > 0:
            x = _pad_crop(kc, x, padding, fill_arr)
        if re_prob > 0:
            x = _erase(ke, x, re_prob)
        out[name] = x
    return out
