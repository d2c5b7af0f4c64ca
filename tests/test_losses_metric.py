"""Parity tests for the dormant metric-learning losses vs the reference's
torch semantics (`layers/{metric_learning,cluster_loss,range_loss,hcloss,
mutilmargin}.py`). The torch side below is an independent transcription of
the reference math (loops and all), run on CPU."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from signal_tpu.losses_metric import (
    amsoftmax_logits, arcface_logits, circle_logits, cluster_loss,
    contrastive_loss, cosface_logits, hetero_center_loss,
    init_margin_head, multi_modal_margin_loss, range_loss)

P, K, D, C = 4, 4, 32, 7
B = P * K


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((B, D)).astype(np.float32)
    labels = np.repeat(np.arange(P), K).astype(np.int64)  # PK-ordered
    weight = rng.standard_normal((C, D)).astype(np.float32)
    clabels = rng.integers(0, C, size=B).astype(np.int64)
    return feats, labels, weight, clabels


def _torch_cos(feats, weight):
    return F.linear(F.normalize(torch.tensor(feats)),
                    F.normalize(torch.tensor(weight)))


def test_arcface(batch):
    feats, _, weight, clabels = batch
    s, m = 30.0, 0.30
    cosine = _torch_cos(feats, weight)
    sine = torch.sqrt((1.0 - cosine.pow(2)).clamp(0, 1))
    phi = cosine * math.cos(m) - sine * math.sin(m)
    th, mm = math.cos(math.pi - m), math.sin(math.pi - m) * m
    phi = torch.where(cosine > th, phi, cosine - mm)
    onehot = torch.zeros_like(cosine).scatter_(
        1, torch.tensor(clabels).view(-1, 1), 1)
    want = (onehot * phi + (1 - onehot) * cosine) * s
    got = arcface_logits({"weight": jnp.asarray(weight)}, jnp.asarray(feats),
                         jnp.asarray(clabels), s=s, m=m)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_arcface_easy_margin_and_ls(batch):
    feats, _, weight, clabels = batch
    got = arcface_logits({"weight": jnp.asarray(weight)}, jnp.asarray(feats),
                         jnp.asarray(clabels), easy_margin=True, ls_eps=0.1)
    cosine = _torch_cos(feats, weight)
    sine = torch.sqrt((1.0 - cosine.pow(2)).clamp(0, 1))
    phi = cosine * math.cos(0.3) - sine * math.sin(0.3)
    phi = torch.where(cosine > 0, phi, cosine)
    onehot = torch.zeros_like(cosine).scatter_(
        1, torch.tensor(clabels).view(-1, 1), 1)
    onehot = 0.9 * onehot + 0.1 / C
    want = (onehot * phi + (1 - onehot) * cosine) * 30.0
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_cosface(batch):
    feats, _, weight, clabels = batch
    cosine = _torch_cos(feats, weight)
    onehot = torch.zeros_like(cosine).scatter_(
        1, torch.tensor(clabels).view(-1, 1), 1)
    want = (onehot * (cosine - 0.30) + (1 - onehot) * cosine) * 30.0
    got = cosface_logits({"weight": jnp.asarray(weight)}, jnp.asarray(feats),
                         jnp.asarray(clabels))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_amsoftmax(batch):
    feats, _, weight, clabels = batch
    # reference stores W as [in, out] and normalizes per column — same as
    # row-normalizing weight [out, in]
    x = torch.tensor(feats)
    w = torch.tensor(weight).t()
    x_n = x / x.norm(p=2, dim=1, keepdim=True).clamp(min=1e-12)
    w_n = w / w.norm(p=2, dim=0, keepdim=True).clamp(min=1e-12)
    costh = x_n @ w_n
    delt = torch.zeros_like(costh).scatter_(
        1, torch.tensor(clabels).view(-1, 1), 0.30)
    want = 30.0 * (costh - delt)
    got = amsoftmax_logits({"weight": jnp.asarray(weight)}, jnp.asarray(feats),
                           jnp.asarray(clabels))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_circle(batch):
    feats, _, weight, clabels = batch
    s, m = 256.0, 0.25
    sim = _torch_cos(feats, weight)
    alpha_p = (-sim.detach() + 1 + m).clamp_min(0.0)
    alpha_n = (sim.detach() + m).clamp_min(0.0)
    s_p = s * alpha_p * (sim - (1 - m))
    s_n = s * alpha_n * (sim - m)
    onehot = F.one_hot(torch.tensor(clabels), num_classes=C).float()
    want = onehot * s_p + (1 - onehot) * s_n
    got = circle_logits({"weight": jnp.asarray(weight)}, jnp.asarray(feats),
                        jnp.asarray(clabels), s=s, m=m)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-3)


def test_circle_alpha_is_stop_gradient():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    lab = jnp.asarray(rng.integers(0, C, B))

    def loss(feats):
        return jnp.sum(circle_logits({"weight": w}, feats, lab) ** 2)

    g = jax.grad(loss)(f)
    assert np.isfinite(np.asarray(g)).all()


def test_contrastive(batch):
    feats, labels, _, _ = batch
    # normalized inputs (the (<1) self-filter assumes unit norm)
    fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    t = torch.tensor(fn)
    tl = torch.tensor(labels)
    sim = t @ t.t()
    margin = 0.3
    total = 0.0
    for i in range(B):
        pos = sim[i][tl == tl[i]]
        pos = pos[pos < 1]
        neg = sim[i][tl != tl[i]]
        neg = neg[neg > margin]
        total += float(torch.sum(1 - pos) + (torch.sum(neg) if len(neg) else 0.0))
    want = total / B
    got = contrastive_loss(jnp.asarray(fn), jnp.asarray(labels), margin)
    np.testing.assert_allclose(float(got), want, atol=1e-4)


def _torch_eucdist(x, y):
    m, n = x.size(0), y.size(0)
    xx = x.pow(2).sum(1, keepdim=True).expand(m, n)
    yy = y.pow(2).sum(1, keepdim=True).expand(n, m).t()
    return (xx + yy - 2 * x @ y.t()).clamp(min=1e-12).sqrt()


def test_cluster_loss(batch):
    feats, labels, _, _ = batch
    f = torch.tensor(feats)
    margin = 10.0
    centers = torch.stack([f[labels == i].mean(0) for i in range(P)])
    intra_max = torch.stack([
        _torch_eucdist(centers[i:i + 1], f[labels == i]).max()
        for i in range(P)])
    inter_min = torch.stack([
        _torch_eucdist(centers[i:i + 1],
                       centers[torch.arange(P) != i]).min()
        for i in range(P)])
    want = torch.relu(intra_max - inter_min + margin).mean()
    got = cluster_loss(jnp.asarray(feats), imgs_per_id=K, margin=margin)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_range_loss(batch):
    feats, labels, _, _ = batch
    f = torch.tensor(feats)
    k, margin, alpha, beta = 2, 0.1, 0.5, 0.5
    intra = 0.0
    for i in range(P):
        d = _torch_eucdist(f[labels == i], f[labels == i]).view(-1)
        topk = d.sort()[0][-k * 2::2]
        intra += float(k / torch.sum(1.0 / topk))
    centers = torch.stack([f[labels == i].mean(0) for i in range(P)])
    dcc = _torch_eucdist(centers, centers).view(-1).sort()[0]
    inter = float(torch.relu(margin - dcc[P]))
    want = alpha * intra + beta * inter
    got, got_intra, got_inter = range_loss(jnp.asarray(feats), imgs_per_id=K,
                                           k=k, margin=margin,
                                           alpha=alpha, beta=beta)
    np.testing.assert_allclose(float(got_intra), intra, rtol=1e-4)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_hetero_center_loss(batch):
    feats, labels, _, _ = batch
    rng = np.random.default_rng(2)
    feats2 = rng.standard_normal((B, D)).astype(np.float32)
    f1, f2 = torch.tensor(feats), torch.tensor(feats2)
    want = 0.0
    for i in range(P):
        c1 = f1[labels == i].mean(0)
        c2 = f2[labels == i].mean(0)
        want += float(abs(F.mse_loss(c1, c2, reduction="sum")))
    got = hetero_center_loss(jnp.asarray(feats), jnp.asarray(feats2),
                             imgs_per_id=K)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    # cos mode
    want_cos = sum(
        float(max(0.0, 1 - F.cosine_similarity(
            f1[labels == i].mean(0), f2[labels == i].mean(0), dim=0)))
        for i in range(P))
    got_cos = hetero_center_loss(jnp.asarray(feats), jnp.asarray(feats2),
                                 imgs_per_id=K, dist_type="cos")
    np.testing.assert_allclose(float(got_cos), want_cos, atol=1e-5)


def test_multi_modal_margin_loss(batch):
    feats, labels, _, _ = batch
    rng = np.random.default_rng(3)
    feats2 = rng.standard_normal((B, D)).astype(np.float32)
    feats3 = rng.standard_normal((B, D)).astype(np.float32)
    f = [torch.tensor(x) for x in (feats, feats2, feats3)]
    margin = 3.0
    want = 0.0
    for i in range(P):
        c = [x[labels == i].mean(0) for x in f]
        d12 = abs(margin - F.mse_loss(c[0], c[1], reduction="sum"))
        d23 = abs(margin - F.mse_loss(c[1], c[2], reduction="sum"))
        d13 = abs(margin - F.mse_loss(c[0], c[2], reduction="sum"))
        want += float(max(d12, d23, d13))
    got = multi_modal_margin_loss(jnp.asarray(feats), jnp.asarray(feats2),
                                  jnp.asarray(feats3), imgs_per_id=K,
                                  margin=margin)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_margin_head_inits_shapes():
    for kind in ("arcface", "cosface", "circle", "amsoftmax"):
        p = init_margin_head(jax.random.PRNGKey(0), D, C, kind)
        assert p["weight"].shape == (C, D)
    with pytest.raises(ValueError):
        init_margin_head(jax.random.PRNGKey(0), D, C, "nope")
