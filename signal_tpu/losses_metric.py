"""Metric-learning heads and auxiliary losses (the reference's dormant zoo).

Behavioral mirrors of `layers/{metric_learning,cluster_loss,range_loss,
hcloss,mutilmargin}.py` (maxingan2412/Signal). None of these are consumed
by the shipped Signal train path (SURVEY §2: "present, unreferenced"),
but they are part of the framework surface, so they exist here as pure
functions a loss closure can pick up via `cfg.MODEL.ID_LOSS_TYPE` /
`METRIC_LOSS_TYPE` — same extension points as the reference's
`make_loss.py:37-105`.

JAX notes vs the torch originals:

* the margin heads (Arcface/Cosface/AMSoftmax/Circle) are (init, apply)
  pairs over an explicit weight matrix instead of nn.Modules;
* the per-class Python loops (cluster/range/hetero/3M losses) assume the
  PK sampler's ordered layout — ``labels.reshape(P, K)`` — which is the
  reference's own fast path (`cluster_loss.py:46-48`,
  `range_loss.py:106-108`) and the only layout its chunk-based losses
  are correct for anyway (`hcloss.py:21-23`). Fixed [P, K] shapes make
  every one of them jit-clean with no data-dependent `unique()`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from signal_tpu.ops.distmat import euclidean_distmat

_HIGH = jax.lax.Precision.HIGHEST


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


# --------------------------------------------------------------------------
# Margin-based classification heads (`metric_learning.py`)
# --------------------------------------------------------------------------

def init_margin_head(key, in_features: int, num_classes: int,
                     kind: str = "arcface") -> dict:
    """Weight init matching the reference modules: xavier-uniform for
    arcface/cosface (`metric_learning.py:93,141`), kaiming-uniform(a=√5)
    for circle (l.56), xavier-normal randn for amsoftmax (l.172-174)."""
    if kind in ("arcface", "cosface"):
        bound = math.sqrt(6.0 / (in_features + num_classes))
        w = jax.random.uniform(key, (num_classes, in_features),
                               jnp.float32, -bound, bound)
    elif kind == "circle":
        # kaiming_uniform(a=√5) over fan_in
        bound = math.sqrt(6.0 / ((1 + 5) * in_features))
        w = jax.random.uniform(key, (num_classes, in_features),
                               jnp.float32, -bound, bound)
    elif kind == "amsoftmax":
        std = math.sqrt(2.0 / (in_features + num_classes))
        w = std * jax.random.normal(key, (num_classes, in_features), jnp.float32)
    else:
        raise ValueError(f"unknown margin head {kind!r}")
    return {"weight": w}


def arcface_logits(params: dict, feats: jnp.ndarray, labels: jnp.ndarray,
                   s: float = 30.0, m: float = 0.30,
                   easy_margin: bool = False, ls_eps: float = 0.0) -> jnp.ndarray:
    """cos(θ+m) on the target class (`metric_learning.py:101-121`)."""
    cosine = jnp.matmul(_l2norm(feats.astype(jnp.float32)),
                        _l2norm(params["weight"]).T, precision=_HIGH)
    sine = jnp.sqrt(jnp.clip(1.0 - cosine * cosine, 0.0, 1.0))
    phi = cosine * math.cos(m) - sine * math.sin(m)
    if easy_margin:
        phi = jnp.where(cosine > 0, phi, cosine)
    else:
        th = math.cos(math.pi - m)
        mm = math.sin(math.pi - m) * m
        phi = jnp.where(cosine > th, phi, cosine - mm)
    onehot = jax.nn.one_hot(labels, params["weight"].shape[0], dtype=jnp.float32)
    if ls_eps > 0:
        onehot = (1 - ls_eps) * onehot + ls_eps / params["weight"].shape[0]
    return s * (onehot * phi + (1.0 - onehot) * cosine)


def cosface_logits(params: dict, feats: jnp.ndarray, labels: jnp.ndarray,
                   s: float = 30.0, m: float = 0.30) -> jnp.ndarray:
    """cos(θ) − m on the target class (`metric_learning.py:143-156`)."""
    cosine = jnp.matmul(_l2norm(feats.astype(jnp.float32)),
                        _l2norm(params["weight"]).T, precision=_HIGH)
    onehot = jax.nn.one_hot(labels, params["weight"].shape[0], dtype=jnp.float32)
    return s * (onehot * (cosine - m) + (1.0 - onehot) * cosine)


def amsoftmax_logits(params: dict, feats: jnp.ndarray, labels: jnp.ndarray,
                     s: float = 30.0, m: float = 0.30) -> jnp.ndarray:
    """Additive-margin softmax logits (`metric_learning.py:176-189`)."""
    cosine = jnp.matmul(_l2norm(feats.astype(jnp.float32)),
                        _l2norm(params["weight"]).T, precision=_HIGH)
    onehot = jax.nn.one_hot(labels, params["weight"].shape[0], dtype=jnp.float32)
    return s * (cosine - m * onehot)


def circle_logits(params: dict, feats: jnp.ndarray, labels: jnp.ndarray,
                  s: float = 256.0, m: float = 0.25) -> jnp.ndarray:
    """Circle-loss pair-weighted logits (`metric_learning.py:58-73`).
    α_p/α_n come from stop-gradient similarities, as in the reference's
    `.detach()`."""
    sim = jnp.matmul(_l2norm(feats.astype(jnp.float32)),
                     _l2norm(params["weight"]).T, precision=_HIGH)
    sim_sg = jax.lax.stop_gradient(sim)
    alpha_p = jax.nn.relu(-sim_sg + 1 + m)
    alpha_n = jax.nn.relu(sim_sg + m)
    s_p = s * alpha_p * (sim - (1 - m))
    s_n = s * alpha_n * (sim - m)
    onehot = jax.nn.one_hot(labels, params["weight"].shape[0], dtype=jnp.float32)
    return onehot * s_p + (1.0 - onehot) * s_n


# --------------------------------------------------------------------------
# Pairwise contrastive loss (`metric_learning.py:9-42`)
# --------------------------------------------------------------------------

def contrastive_loss(feats: jnp.ndarray, labels: jnp.ndarray,
                     margin: float = 0.3) -> jnp.ndarray:
    """Per-anchor: Σ(1 − sim) over positives with sim<1 (the "<1" test is
    the reference's self-pair removal, which assumes normalized inputs),
    plus Σ sim over negatives with sim>margin; averaged over anchors."""
    f = feats.astype(jnp.float32)
    sim = jnp.matmul(f, f.T, precision=_HIGH)
    same = labels[:, None] == labels[None, :]
    pos_mask = same & (sim < 1.0)
    neg_mask = (~same) & (sim > margin)
    per_anchor = (jnp.sum(jnp.where(pos_mask, 1.0 - sim, 0.0), axis=1)
                  + jnp.sum(jnp.where(neg_mask, sim, 0.0), axis=1))
    return jnp.mean(per_anchor)


# --------------------------------------------------------------------------
# PK-structured class-center losses
# --------------------------------------------------------------------------

def _pk_centers(feats: jnp.ndarray, imgs_per_id: int) -> jnp.ndarray:
    """[P·K, D] → per-class centers [P, D] (PK-ordered batch)."""
    p = feats.shape[0] // imgs_per_id
    return feats.reshape(p, imgs_per_id, -1).mean(axis=1)


def cluster_loss(feats: jnp.ndarray, imgs_per_id: int,
                 margin: float = 10.0) -> jnp.ndarray:
    """relu(max intra-center dist − min inter-center dist + margin), mean
    over classes (`cluster_loss.py:33-88`)."""
    f = feats.astype(jnp.float32)
    p = f.shape[0] // imgs_per_id
    centers = _pk_centers(f, imgs_per_id)                       # [P, D]
    members = f.reshape(p, imgs_per_id, -1)                     # [P, K, D]
    d_intra = jnp.sqrt(jnp.clip(
        jnp.sum((members - centers[:, None, :]) ** 2, axis=-1), 1e-12, None))
    intra_max = jnp.max(d_intra, axis=1)                        # [P]
    d_cc = euclidean_distmat(centers, centers)                  # [P, P]
    big = jnp.finfo(jnp.float32).max
    inter_min = jnp.min(jnp.where(jnp.eye(p, dtype=bool), big, d_cc), axis=1)
    return jnp.mean(jax.nn.relu(intra_max - inter_min + margin))


def range_loss(feats: jnp.ndarray, imgs_per_id: int, k: int = 2,
               margin: float = 0.1, alpha: float = 0.5,
               beta: float = 0.5):
    """α·Σ_class harmonic-mean(top-k intra pair dists) + β·relu(margin −
    min inter-center dist) (`range_loss.py:38-91,152-186`).
    Returns (range, intra, inter) like the reference."""
    f = feats.astype(jnp.float32)
    p = f.shape[0] // imgs_per_id
    members = f.reshape(p, imgs_per_id, -1)

    def per_class_topk(x):                                      # [K, D]
        d = euclidean_distmat(x, x)                             # [K, K]
        # reference flattens the symmetric matrix and strides by 2 over the
        # sorted tail — i.e. top-k distinct pair distances
        flat = jnp.sort(d.reshape(-1))
        return flat[-2 * k::2]                                  # [k]

    topk = jax.vmap(per_class_topk)(members)                    # [P, k]
    intra = jnp.sum(k / jnp.sum(1.0 / topk, axis=1))
    centers = members.mean(axis=1)
    d_cc = euclidean_distmat(centers, centers)
    # sorted flat [P·P]: first P entries are the diagonal ~zeros; entry [P]
    # is the min off-diagonal (`range_loss.py:91`)
    inter_min = jnp.sort(d_cc.reshape(-1))[p]
    inter = jax.nn.relu(margin - inter_min)
    return alpha * intra + beta * inter, intra, inter


def hetero_center_loss(feat1: jnp.ndarray, feat2: jnp.ndarray,
                       imgs_per_id: int, dist_type: str = "l2") -> jnp.ndarray:
    """Σ over classes of the distance between the two modalities' class
    centers (`hcloss.py:19-39`). NOTE the reference never applies its
    `margin` argument in forward — mirrored here (no margin)."""
    c1 = _pk_centers(feat1.astype(jnp.float32), imgs_per_id)
    c2 = _pk_centers(feat2.astype(jnp.float32), imgs_per_id)
    if dist_type == "l2":
        per_class = jnp.sum((c1 - c2) ** 2, axis=1)             # MSE 'sum'
    elif dist_type == "l1":
        per_class = jnp.mean(jnp.abs(c1 - c2), axis=1)          # L1Loss 'mean'
    elif dist_type == "cos":
        cos = jnp.sum(_l2norm(c1) * _l2norm(c2), axis=1)
        per_class = jax.nn.relu(1.0 - cos)
    else:
        raise ValueError(f"unknown dist_type {dist_type!r}")
    return jnp.sum(jnp.abs(per_class))


def multi_modal_margin_loss(feat1: jnp.ndarray, feat2: jnp.ndarray,
                            feat3: jnp.ndarray, imgs_per_id: int,
                            margin: float = 3.0) -> jnp.ndarray:
    """Σ over classes of max over the 3 modality pairs of
    |margin − ‖cᵃ − cᵇ‖²| (`mutilmargin.py:20-41`, dist_type='l2')."""
    c1 = _pk_centers(feat1.astype(jnp.float32), imgs_per_id)
    c2 = _pk_centers(feat2.astype(jnp.float32), imgs_per_id)
    c3 = _pk_centers(feat3.astype(jnp.float32), imgs_per_id)
    d12 = jnp.sum((c1 - c2) ** 2, axis=1)
    d23 = jnp.sum((c2 - c3) ** 2, axis=1)
    d13 = jnp.sum((c1 - c3) ** 2, axis=1)
    per_class = jnp.maximum(jnp.maximum(jnp.abs(margin - d12),
                                        jnp.abs(margin - d23)),
                            jnp.abs(margin - d13))
    return jnp.sum(per_class)
