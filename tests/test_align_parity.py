"""GAM / LAM / DAS parity tests vs inline torch transcriptions."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from signal_tpu.models.align import (  # noqa: E402
    align_forward,
    das_forward,
    das_reference_points,
    gam_loss,
    init_align_params,
    init_das_params,
    lam_loss,
)


def test_gam_loss_matches_torch():
    rng = np.random.default_rng(0)
    B, L, D = 6, 8, 16
    patches = rng.standard_normal((B, 3, L, D)).astype(np.float32)
    temp = 0.07

    # torch transcription of Cls_Align (mean-pool → normalize → volume CE)
    tp = torch.tensor(patches)
    feats = [F.normalize(tp[:, m].mean(1), dim=-1) for m in range(3)]
    a, b, c = feats
    ll = torch.einsum("bi,bi->b", a, a).unsqueeze(1).expand(-1, B)
    lv = a @ b.T
    la = a @ c.T
    vv = torch.einsum("bi,bi->b", b, b).unsqueeze(0).expand(B, -1)
    va = torch.einsum("bi,bi->b", b, c).unsqueeze(0).expand(B, -1)
    aa = torch.einsum("bi,bi->b", c, c).unsqueeze(0).expand(B, -1)
    G = torch.stack([
        torch.stack([ll, lv, la], dim=-1),
        torch.stack([lv, vv, va], dim=-1),
        torch.stack([la, va, aa], dim=-1),
    ], dim=-2)
    V = torch.sqrt(torch.abs(torch.det(G.float()))) / temp
    targets = torch.arange(B)
    ref = 0.5 * (
        F.cross_entropy(-V, targets, label_smoothing=0.1)
        + F.cross_entropy(-V.T, targets, label_smoothing=0.1)
    )

    ours = gam_loss(jnp.asarray(patches), jnp.asarray(temp, jnp.float32))
    # fp32 det cancellation: torch LU vs closed form agree to ~1e-3
    assert abs(float(ours) - float(ref)) < 1e-3


def test_das_reference_points_match_torch():
    hk, wk = 4, 2
    ry, rx = torch.meshgrid(
        torch.linspace(0.5, hk - 0.5, hk), torch.linspace(0.5, wk - 0.5, wk), indexing="ij")
    ref = torch.stack((ry, rx), -1)
    ref[..., 1].div_(wk - 1.0).mul_(2.0).sub_(1.0)
    ref[..., 0].div_(hk - 1.0).mul_(2.0).sub_(1.0)
    ours = das_reference_points(hk, wk)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-6)


def test_das_forward_matches_torch():
    rng = np.random.default_rng(1)
    B, C, H, W = 2, 8, 16, 8
    stride, factor, ksize = 4, 2.0, 4
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    params = init_das_params(jax.random.PRNGKey(0), C, ksize=ksize)

    # torch transcription of DA_sample.forward
    tx = torch.tensor(x)
    w_pq = torch.tensor(np.asarray(params["proj_q"]["kernel"]).transpose(3, 2, 0, 1))
    b_pq = torch.tensor(np.asarray(params["proj_q"]["bias"]))
    w_c1 = torch.tensor(np.asarray(params["off_conv1"]["kernel"]).transpose(3, 2, 0, 1))
    b_c1 = torch.tensor(np.asarray(params["off_conv1"]["bias"]))
    # depthwise HWIO [k,k,1,C] → torch [C,1,k,k]
    w_dw = torch.tensor(np.asarray(params["off_dw"]["kernel"]).transpose(3, 2, 0, 1))
    b_dw = torch.tensor(np.asarray(params["off_dw"]["bias"]))
    w_o = torch.tensor(np.asarray(params["off_out"]["kernel"]).transpose(3, 2, 0, 1))

    q = F.conv2d(tx, w_pq, b_pq)
    h = F.gelu(F.conv2d(q, w_c1, b_c1))
    h = F.gelu(F.conv2d(h, w_dw, b_dw, stride=stride, groups=C))
    off = F.conv2d(h, w_o)                                   # [B, 1, Hk, Wk]
    hk, wk = off.shape[2], off.shape[3]
    rngs = torch.tensor([1.0 / (hk - 1.0), 1.0 / (wk - 1.0)]).reshape(1, 2, 1, 1)
    off = off.tanh().mul(rngs).mul(factor)                    # broadcast → [B,2,Hk,Wk]
    off = off.permute(0, 2, 3, 1)                             # [B, Hk, Wk, 2]
    ry, rx = torch.meshgrid(torch.linspace(0.5, hk - 0.5, hk),
                            torch.linspace(0.5, wk - 0.5, wk), indexing="ij")
    ref_pts = torch.stack((ry, rx), -1)
    ref_pts[..., 1].div_(wk - 1.0).mul_(2.0).sub_(1.0)
    ref_pts[..., 0].div_(hk - 1.0).mul_(2.0).sub_(1.0)
    pos = (off + ref_pts[None]).clamp(-1.0, 1.0)
    ref = F.grid_sample(tx, pos[..., (1, 0)], mode="bilinear", align_corners=True).numpy()

    ours = das_forward(params, jnp.asarray(x), stride=stride, offset_range_factor=factor)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


def test_lam_loss_symmetric_zero():
    """Identical modalities through identical DAS params → zero LAM loss."""
    rng = np.random.default_rng(2)
    B, L, D, h, w = 2, 32, 8, 8, 4
    one = rng.standard_normal((B, 1, L, D)).astype(np.float32)
    patches = np.repeat(one, 3, axis=1)
    params = init_align_params(jax.random.PRNGKey(1), D)
    params["DAS_n"] = params["DAS_r"]
    params["DAS_t"] = params["DAS_r"]
    loss = lam_loss(params, jnp.asarray(patches), h, w)
    assert float(loss) < 1e-10


def test_align_forward_stages():
    rng = np.random.default_rng(3)
    patches = rng.standard_normal((4, 3, 32, 8)).astype(np.float32)
    params = init_align_params(jax.random.PRNGKey(2), 8)
    gam, lam = align_forward(params, jnp.asarray(patches), h=8, w=4, stage="CLS")
    assert lam is None and np.isfinite(float(gam))
    gam2, lam2 = align_forward(params, jnp.asarray(patches), h=8, w=4, stage="together_CLS_Patch")
    assert np.isfinite(float(gam2)) and np.isfinite(float(lam2))


def test_das_rejects_grid_smaller_than_stride():
    """A grid under the offset conv's 4x4/stride-4 footprint must error
    loudly (the reference's torch Conv2d would raise output-size-0 too),
    not produce an empty tensor and nan losses downstream."""
    params = init_align_params(jax.random.PRNGKey(0), 8)
    patches = jnp.zeros((2, 3, 8, 8))  # L=8 → grid 4x2
    with pytest.raises(ValueError, match="DAS needs"):
        lam_loss(params, patches, h=4, w=2)
