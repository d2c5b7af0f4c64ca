"""Golden parity tests: signal_tpu ops vs torch reference numerics.

Each test builds the torch equivalent of the op inline (the same torch
primitives the reference calls) and checks our JAX implementation against
it on random inputs with copied weights.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def t2j(x):
    return jnp.asarray(x.detach().numpy())


# --------------------------------------------------------------------------
# Gram volume (GAM core) vs torch.det
# --------------------------------------------------------------------------

def test_gram_volume3_matches_torch_det():
    from signal_tpu.ops.volume import gram_volume3

    rng = np.random.default_rng(0)
    a = rng.standard_normal((5, 16)).astype(np.float32)
    b = rng.standard_normal((7, 16)).astype(np.float32)
    c = rng.standard_normal((7, 16)).astype(np.float32)
    # normalize like GAM does
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    c /= np.linalg.norm(c, axis=1, keepdims=True)

    ta, tb, tc = map(torch.tensor, (a, b, c))
    ll = torch.einsum("bi,bi->b", ta, ta).unsqueeze(1).expand(-1, 7)
    lv = ta @ tb.T
    la = ta @ tc.T
    vv = torch.einsum("bi,bi->b", tb, tb).unsqueeze(0).expand(5, -1)
    va = torch.einsum("bi,bi->b", tb, tc).unsqueeze(0).expand(5, -1)
    aa = torch.einsum("bi,bi->b", tc, tc).unsqueeze(0).expand(5, -1)
    G = torch.stack([
        torch.stack([ll, lv, la], dim=-1),
        torch.stack([lv, vv, va], dim=-1),
        torch.stack([la, va, aa], dim=-1),
    ], dim=-2)
    ref = torch.sqrt(torch.abs(torch.det(G.float()))).numpy()

    ours = np.asarray(gram_volume3(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)))
    # fp32 cancellation bounds agreement: torch's LU and the closed form
    # both lose ~3 digits when the Gram matrix nears singularity.
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=1e-4)


# --------------------------------------------------------------------------
# Bilinear grid sample vs F.grid_sample
# --------------------------------------------------------------------------

@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_matches_torch(align):
    from signal_tpu.ops.grid_sample import bilinear_grid_sample

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 16, 8)).astype(np.float32)
    # include out-of-range coords to exercise zero padding
    grid = (rng.uniform(-1.4, 1.4, (2, 4, 2, 2))).astype(np.float32)

    ref = F.grid_sample(torch.tensor(x), torch.tensor(grid),
                        mode="bilinear", align_corners=align).numpy()
    ours = np.asarray(bilinear_grid_sample(jnp.asarray(x), jnp.asarray(grid), align_corners=align))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------
# MHA vs nn.MultiheadAttention (packed QKV, batch_first)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("cross", [False, True])
def test_mha_matches_torch(cross):
    from signal_tpu.ops.attention import mha

    dim, heads = 64, 8
    m = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
    m.eval()
    rng = np.random.default_rng(2)
    q = rng.standard_normal((3, 5, dim)).astype(np.float32)
    kv = rng.standard_normal((3, 11, dim)).astype(np.float32) if cross else q

    with torch.no_grad():
        ref, _ = m(torch.tensor(q), torch.tensor(kv), torch.tensor(kv), need_weights=False)

    params = {
        "qkv_kernel": t2j(m.in_proj_weight).T,
        "qkv_bias": t2j(m.in_proj_bias),
        "out_kernel": t2j(m.out_proj.weight).T,
        "out_bias": t2j(m.out_proj.bias),
    }
    ours = mha(params, jnp.asarray(q), jnp.asarray(kv) if cross else None,
               num_heads=heads, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4, atol=2e-5)


# --------------------------------------------------------------------------
# LayerNorm / QuickGELU / distmat
# --------------------------------------------------------------------------

def test_layer_norm_matches_torch():
    from signal_tpu.ops.attention import layer_norm

    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 7, 32)).astype(np.float32)
    ln = torch.nn.LayerNorm(32)
    with torch.no_grad():
        ln.weight.copy_(torch.randn(32))
        ln.bias.copy_(torch.randn(32))
        ref = ln(torch.tensor(x)).numpy()
    params = {"scale": t2j(ln.weight), "bias": t2j(ln.bias)}
    ours = np.asarray(layer_norm(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_euclidean_distmat_matches_reference_formula():
    from signal_tpu.ops.distmat import euclidean_distmat

    rng = np.random.default_rng(4)
    # distinct x/y: the self-distance diagonal is sqrt(clamp(≈0)) where
    # fp32 rounding makes torch/XLA legitimately disagree
    x = rng.standard_normal((6, 12)).astype(np.float32)
    y = rng.standard_normal((5, 12)).astype(np.float32)
    tx, ty = torch.tensor(x), torch.tensor(y)
    xx = tx.pow(2).sum(1, keepdim=True).expand(6, 5)
    yy = ty.pow(2).sum(1, keepdim=True).expand(5, 6).t()
    dist = (xx + yy - 2 * tx @ ty.t()).clamp(min=1e-12).sqrt().numpy()
    ours = np.asarray(euclidean_distmat(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, dist, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# Losses vs torch
# --------------------------------------------------------------------------

def test_label_smooth_ce_matches_torch():
    from signal_tpu.losses import cross_entropy_label_smooth

    rng = np.random.default_rng(5)
    logits = rng.standard_normal((8, 10)).astype(np.float32)
    targets = rng.integers(0, 10, 8)
    logp = F.log_softmax(torch.tensor(logits), dim=1)
    onehot = torch.zeros(8, 10).scatter_(1, torch.tensor(targets)[:, None], 1)
    smoothed = 0.9 * onehot + 0.1 / 10
    ref = (-smoothed * logp).mean(0).sum().item()
    ours = float(cross_entropy_label_smooth(jnp.asarray(logits), jnp.asarray(targets), 10))
    assert abs(ours - ref) < 1e-5


def test_soft_triplet_matches_torch():
    from signal_tpu.losses import triplet_loss

    rng = np.random.default_rng(6)
    feats = rng.standard_normal((8, 16)).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2, 3, 3])

    tf_ = torch.tensor(feats)
    xx = tf_.pow(2).sum(1, keepdim=True).expand(8, 8)
    dist = (xx + xx.t() - 2 * tf_ @ tf_.t()).clamp(min=1e-12).sqrt()
    tl = torch.tensor(labels)
    is_pos = tl.expand(8, 8).eq(tl.expand(8, 8).t())
    d_ap = dist[is_pos].view(8, -1).max(1)[0]
    d_an = dist[~is_pos].view(8, -1).min(1)[0]
    ref = torch.nn.SoftMarginLoss()(d_an - d_ap, torch.ones(8)).item()

    ours, ap, an = triplet_loss(jnp.asarray(feats), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(ap), d_ap.numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(an), d_an.numpy(), rtol=1e-4)
    assert abs(float(ours) - ref) < 1e-5


def test_margin_triplet_matches_torch():
    from signal_tpu.losses import triplet_loss

    rng = np.random.default_rng(7)
    feats = rng.standard_normal((8, 16)).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    tf_ = torch.tensor(feats)
    xx = tf_.pow(2).sum(1, keepdim=True).expand(8, 8)
    dist = (xx + xx.t() - 2 * tf_ @ tf_.t()).clamp(min=1e-12).sqrt()
    tl = torch.tensor(labels)
    is_pos = tl.expand(8, 8).eq(tl.expand(8, 8).t())
    d_ap = dist[is_pos].view(8, -1).max(1)[0]
    d_an = dist[~is_pos].view(8, -1).min(1)[0]
    ref = torch.nn.MarginRankingLoss(margin=0.3)(d_an, d_ap, torch.ones(8)).item()
    ours = float(triplet_loss(jnp.asarray(feats), jnp.asarray(labels), margin=0.3)[0])
    assert abs(ours - ref) < 1e-5


# --------------------------------------------------------------------------
# BNNeck vs torch BatchNorm1d
# --------------------------------------------------------------------------

def test_bnneck_train_and_eval_match_torch():
    from signal_tpu.models.bnneck import bnneck_apply, init_bnneck

    dim = 12
    bn = torch.nn.BatchNorm1d(dim)
    with torch.no_grad():
        bn.weight.copy_(torch.rand(dim) + 0.5)
    rng = np.random.default_rng(8)
    params, state = init_bnneck(dim)
    params = dict(params, scale=t2j(bn.weight))

    # two training steps, then eval
    for i in range(2):
        x = rng.standard_normal((16, dim)).astype(np.float32)
        bn.train()
        ref = bn(torch.tensor(x)).detach().numpy()
        ours, state = bnneck_apply(params, state, jnp.asarray(x), training=True)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    np.testing.assert_allclose(np.asarray(state["mean"]), bn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state["var"]), bn.running_var.numpy(), rtol=1e-4, atol=1e-6)

    bn.eval()
    x = rng.standard_normal((4, dim)).astype(np.float32)
    ref = bn(torch.tensor(x)).detach().numpy()
    ours, _ = bnneck_apply(params, state, jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)
