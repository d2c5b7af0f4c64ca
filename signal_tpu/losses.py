"""Loss functions: label-smoothed ID loss, batch-hard triplet, center loss.

Behavioral mirrors of `layers/{make_loss,triplet_loss,softmax_loss,
center_loss}.py` (maxingan2412/Signal), expressed as pure functions:

* CrossEntropyLabelSmooth (`softmax_loss.py:4-34`): ε=0.1 smoothing, the
  reference's ``(-targets · logp).mean(0).sum()``;
* TripletLoss (`triplet_loss.py:51-135`): batch-hard mining over the
  Euclidean distance matrix; soft-margin (softplus) when NO_MARGIN
  (default) else margin ranking — masked max/min instead of boolean
  fancy-indexing (fixed shapes → jit-clean);
* CenterLoss (`center_loss.py:7-56`): class centers pulled toward
  features, clamped dists, built-but-inert by default
  (METRIC_LOSS_TYPE='triplet') exactly like the reference;
* make_loss (`make_loss.py:29-193`): the per-head combination closure.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from signal_tpu.ops.distmat import euclidean_distmat


def cross_entropy_label_smooth(logits: jnp.ndarray, targets: jnp.ndarray,
                               num_classes: int, epsilon: float = 0.1) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    smoothed = (1.0 - epsilon) * onehot + epsilon / num_classes
    return jnp.sum(jnp.mean(-smoothed * logp, axis=0))


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=1))


def hard_example_mining(dist_mat: jnp.ndarray, labels: jnp.ndarray):
    """For each anchor: hardest positive (max dist, self included — its
    distance is 0 so it never wins unless alone) and hardest negative."""
    is_pos = labels[:, None] == labels[None, :]
    neg_inf = jnp.finfo(jnp.float32).min
    pos_inf = jnp.finfo(jnp.float32).max
    dist_ap = jnp.max(jnp.where(is_pos, dist_mat, neg_inf), axis=1)
    dist_an = jnp.min(jnp.where(is_pos, pos_inf, dist_mat), axis=1)
    return dist_ap, dist_an


def triplet_loss(
    feats: jnp.ndarray,
    labels: jnp.ndarray,
    margin: Optional[float] = None,
    hard_factor: float = 0.0,
    normalize_feature: bool = False,
):
    """→ (loss, dist_ap, dist_an). margin=None ⇒ soft-margin (softplus)."""
    f = feats.astype(jnp.float32)
    if normalize_feature:
        f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-12)
    dist = euclidean_distmat(f, f)
    dist_ap, dist_an = hard_example_mining(dist, labels)
    dist_ap = dist_ap * (1.0 + hard_factor)
    dist_an = dist_an * (1.0 - hard_factor)
    if margin is not None:
        # MarginRankingLoss(y=1): mean(relu(-(an - ap) + margin))
        loss = jnp.mean(jax.nn.relu(dist_ap - dist_an + margin))
    else:
        # SoftMarginLoss(x, y=1): mean(log(1 + exp(-x))) = softplus(-x)
        loss = jnp.mean(jax.nn.softplus(-(dist_an - dist_ap)))
    return loss, dist_ap, dist_an


def center_loss(centers: jnp.ndarray, feats: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """centers [C, D]; sum over batch of clamped squared dist to own center,
    averaged by batch size (`center_loss.py:31-55`)."""
    f = feats.astype(jnp.float32)
    d = (
        jnp.sum(f * f, axis=1)[:, None]
        + jnp.sum(centers * centers, axis=1)[None, :]
        - 2.0 * f @ centers.T
    )
    mask = jax.nn.one_hot(labels, centers.shape[0], dtype=jnp.float32)
    return jnp.sum(jnp.clip(d, 1e-12, 1e12) * mask) / f.shape[0]


def init_center_params(key, num_classes: int, feat_dim: int = 2048):
    # reference: randn centers (`center_loss.py:25`), feat_dim hardcoded 2048
    return {"centers": jax.random.normal(key, (num_classes, feat_dim), jnp.float32)}


def supcon_loss(text_feats: jnp.ndarray, image_feats: jnp.ndarray,
                t_labels: jnp.ndarray, i_labels: jnp.ndarray,
                temperature: float = 1.0) -> jnp.ndarray:
    """Supervised contrastive loss between modalities (the reference's
    `layers/supcontrast.py` semantics, used by CLIP-ReID prompt training):
    for each text anchor, positives are images of the same identity."""
    t = text_feats / (jnp.linalg.norm(text_feats, axis=1, keepdims=True) + 1e-12)
    i = image_feats / (jnp.linalg.norm(image_feats, axis=1, keepdims=True) + 1e-12)
    logits = jnp.matmul(t, i.T, precision=jax.lax.Precision.HIGHEST) / temperature
    pos = (t_labels[:, None] == i_labels[None, :]).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=1)
    per_anchor = jnp.sum(pos * logp, axis=1) / jnp.maximum(jnp.sum(pos, axis=1), 1.0)
    return -jnp.mean(per_anchor)


def i2t_cross_entropy(image_feats: jnp.ndarray, text_class_feats: jnp.ndarray,
                      labels: jnp.ndarray, logit_scale: float = 100.0) -> jnp.ndarray:
    """Image-to-text classification CE over per-class text features
    (CLIP-ReID stage-2's xent(image_logits, target))."""
    i = image_feats / (jnp.linalg.norm(image_feats, axis=1, keepdims=True) + 1e-12)
    t = text_class_feats / (jnp.linalg.norm(text_class_feats, axis=1, keepdims=True) + 1e-12)
    logits = logit_scale * jnp.matmul(i, t.T, precision=jax.lax.Precision.HIGHEST)
    return cross_entropy(logits, labels)


def make_loss(cfg, num_classes: int) -> Callable:
    """Per-head loss closure mirroring `make_loss.py:29-193`.

    Returns loss_fn(score, feat, target) where score/feat may be lists
    (first element weighted 0.5, rest average to the other 0.5).
    """
    id_w = cfg.MODEL.ID_LOSS_WEIGHT
    tri_w = cfg.MODEL.TRIPLET_LOSS_WEIGHT
    smooth_on = cfg.MODEL.IF_LABELSMOOTH == "on"
    margin = None if cfg.MODEL.NO_MARGIN else cfg.SOLVER.MARGIN
    sampler = cfg.DATALOADER.SAMPLER

    def xent(score, target):
        if smooth_on:
            return cross_entropy_label_smooth(score, target, num_classes)
        return cross_entropy(score, target)

    def loss_fn(score, feat, target, target_cam=None):
        del target_cam
        if sampler == "softmax":
            return cross_entropy(score, target)
        if isinstance(score, (list, tuple)):
            rest = sum(xent(s, target) for s in score[1:]) / max(len(score) - 1, 1)
            id_loss = 0.5 * rest + 0.5 * xent(score[0], target)
        else:
            id_loss = xent(score, target)
        if isinstance(feat, (list, tuple)):
            rest = sum(triplet_loss(f, target, margin)[0] for f in feat[1:]) / max(len(feat) - 1, 1)
            tri = 0.5 * rest + 0.5 * triplet_loss(feat[0], target, margin)[0]
        else:
            tri = triplet_loss(feat, target, margin)[0]
        return id_w * id_loss + tri_w * tri

    return loss_fn


def total_train_loss(
    outputs: dict,
    targets: jnp.ndarray,
    loss_fn: Callable,
    *,
    gram_weight: float,
    pat_weight: float,
    moe_weight: float = 0.0,
) -> jnp.ndarray:
    """Sign-dispatch loss assembly (`engine/processor.py:176-256`): one
    loss_fn term per (score, feat) head + α·GAM + β·LAM (+ the MoE
    load-balance aux weighted by MODEL.MoE_Loss_weight — the reference
    declares that knob without a consumer, `config/defaults.py:28`)."""
    loss = 0.0
    for score, feat in zip(outputs["scores"], outputs["feats"]):
        loss = loss + loss_fn(score, feat, targets)
    if outputs.get("gam") is not None:
        loss = loss + gram_weight * outputs["gam"]
    if outputs.get("lam") is not None:
        loss = loss + pat_weight * outputs["lam"]
    if outputs.get("moe_aux") is not None:
        loss = loss + moe_weight * outputs["moe_aux"]
    return loss
