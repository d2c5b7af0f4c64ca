"""OSNet backbone: parity vs the imported reference module, gradients,
Signal-model integration, analytic FLOPs."""

import dataclasses
import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from signal_tpu.config import Config  # noqa: E402
from signal_tpu.models.osnet import (  # noqa: E402
    OSNET_VARIANTS, init_osnet_params, load_torchreid_osnet, osnet_forward)

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_osnet():
    path = os.path.join(REFERENCE, "modeling/backbones/basic_cnn_params/osnet.py")
    if not os.path.exists(path):
        pytest.skip("reference checkout not present")
    spec = importlib.util.spec_from_file_location("ref_osnet_mod", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_osnet_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_osnet_matches_reference_module(ref_osnet, tmp_path):
    """Eval forward of our osnet_x0_25 == the reference OSNet's
    featuremaps() with the SAME weights (round-tripped through the
    torchreid .pth importer — the importer is under test too)."""
    torch.manual_seed(0)
    model = ref_osnet.osnet_x0_25(num_classes=4, pretrained=False).eval()
    # non-trivial running stats so eval BN is actually exercised
    g = torch.Generator().manual_seed(1)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.data = 0.05 * torch.randn(
                m.running_mean.shape, generator=g)
            m.running_var.data = 0.5 + torch.rand(
                m.running_var.shape, generator=g)
    pth = str(tmp_path / "osnet_x0_25.pth")
    torch.save(model.state_dict(), pth)

    channels = OSNET_VARIANTS["osnet_x0_25"]
    params, state = init_osnet_params(jax.random.PRNGKey(0), channels=channels)
    params, state = load_torchreid_osnet(pth, params, state)

    rng = np.random.default_rng(2)
    imgs = rng.standard_normal((2, 3, 64, 32)).astype(np.float32)
    with torch.no_grad():
        want = model.featuremaps(torch.tensor(imgs)).numpy()  # [2, 128, 4, 2]
    tokens, pooled, _ = osnet_forward(params, state, jnp.asarray(imgs),
                                      training=False,
                                      compute_dtype=jnp.float32)
    got = np.asarray(tokens).transpose(0, 2, 1).reshape(*want.shape)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(pooled), want.mean((2, 3)),
                               atol=2e-2, rtol=2e-3)


def test_osnet_backward_through_trunk():
    params, state = init_osnet_params(
        jax.random.PRNGKey(0), channels=OSNET_VARIANTS["osnet_x0_25"])
    x = jnp.ones((2, 3, 64, 32), jnp.float32)

    def loss(p):
        _, pooled, _ = osnet_forward(p, state, x, training=True)
        return jnp.sum(pooled ** 2)

    grads = jax.grad(loss)(params)
    gmax = np.asarray(jnp.abs(grads["stem"]["conv"]).max())
    assert np.isfinite(gmax) and gmax > 0
    # gate params receive gradient too (shared gate used 4x)
    ggate = np.asarray(jnp.abs(
        grads["stage1"]["blocks"][0]["gate"]["fc2_kernel"]).max())
    assert np.isfinite(ggate) and ggate > 0


def test_osnet_bn_state_updates_only_in_training():
    params, state = init_osnet_params(
        jax.random.PRNGKey(0), channels=OSNET_VARIANTS["osnet_x0_25"])
    imgs = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 3, 64, 32)), jnp.float32)
    _, _, s_eval = osnet_forward(params, state, imgs, training=False,
                                 compute_dtype=jnp.float32)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), s_eval, state))
    _, _, s_train = osnet_forward(params, state, imgs, training=True,
                                  compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(state["stem"]["bn"]["mean"]),
                           np.asarray(s_train["stem"]["bn"]["mean"]))


def test_signal_model_with_osnet_backbone():
    from signal_tpu.models.signal_model import (
        ModelSpec, forward_eval, forward_train, init_signal_params)

    cfg = Config()
    cfg.MODEL.TRANSFORMER_TYPE = "osnet_x0_25"
    cfg.INPUT.SIZE_TRAIN = (64, 64)
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    cfg.MODEL.TOPK = 3
    cfg.MODEL.stageName = "together_CLS_Patch"
    spec = ModelSpec.from_config(cfg, num_classes=5, camera_num=2)
    assert spec.backbone == "osnet" and spec.feat_dim == 128
    assert (spec.h, spec.w) == (4, 4)
    spec = dataclasses.replace(spec, compute_dtype="float32")

    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    assert "base" in bn
    rng = np.random.default_rng(0)
    imgs = {m: jnp.asarray(rng.standard_normal((2, 3, 64, 64)), jnp.float32)
            for m in ("RGB", "NI", "TI")}
    cams = jnp.asarray([0, 1])
    out, new_bn = forward_train(params, bn, imgs, cams, spec)
    assert out["scores"][0].shape == (2, 5)
    assert np.isfinite(float(out["lam"]))
    assert not np.allclose(
        np.asarray(bn["base"]["stem"]["bn"]["mean"]),
        np.asarray(new_bn["base"]["stem"]["bn"]["mean"]))
    feat = forward_eval(params, bn, imgs, cams, spec)
    assert feat.shape == (2, 6 * 128)


def test_osnet_analytic_flops():
    """osnet_x1_0 at 256×128 ≈ 0.98 GMACs/image → ~2 GFLOPs × 3 modal."""
    from signal_tpu.models.signal_model import ModelSpec
    from signal_tpu.utils.flops import signal_analytic_flops

    cfg = Config()
    cfg.MODEL.TRANSFORMER_TYPE = "osnet_x1_0"
    spec = ModelSpec.from_config(cfg, num_classes=171, camera_num=4)
    f = signal_analytic_flops(spec, 1)
    assert 4e9 < f < 8e9
    assert signal_analytic_flops(spec, 1, train=True) == 3.0 * f
