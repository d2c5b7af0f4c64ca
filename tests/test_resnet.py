"""ResNet-50 backbone: torch parity, BN-state behavior, model integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from signal_tpu.config import Config  # noqa: E402
from signal_tpu.models.resnet import (  # noqa: E402
    BOTTLENECK_COUNTS, init_resnet50_params, resnet50_forward)


class _TorchBottleneck(nn.Module):
    def __init__(self, cin, w, stride, down):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, w, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(w)
        self.conv2 = nn.Conv2d(w, w, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(w)
        self.conv3 = nn.Conv2d(w, 4 * w, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(4 * w)
        self.down = None
        if down:
            self.down = nn.Sequential(nn.Conv2d(cin, 4 * w, 1, stride, bias=False),
                                      nn.BatchNorm2d(4 * w))
        self.relu = nn.ReLU()

    def forward(self, x):
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        sc = self.down(x) if self.down is not None else x
        return self.relu(h + sc)


class _TorchResNet50(nn.Module):
    """Torchvision-style resnet50 feature trunk, last_stride=1."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for si, (w, n) in enumerate(zip((64, 128, 256, 512), BOTTLENECK_COUNTS)):
            stride = 1 if si in (0, 3) else 2  # last_stride=1
            blocks = []
            for bi in range(n):
                blocks.append(_TorchBottleneck(cin, w, stride if bi == 0 else 1,
                                               down=bi == 0))
                cin = 4 * w
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for si in range(4):
            x = getattr(self, f"layer{si + 1}")(x)
        return x


def _copy_into_torch(model: _TorchResNet50, params, state):
    def setc(conv, arr):
        conv.weight.data = torch.tensor(np.asarray(arr)).permute(3, 2, 0, 1)

    def setbn(bn, p, s):
        bn.weight.data = torch.tensor(np.asarray(p["scale"]))
        bn.bias.data = torch.tensor(np.asarray(p["bias"]))
        bn.running_mean.data = torch.tensor(np.asarray(s["mean"]))
        bn.running_var.data = torch.tensor(np.asarray(s["var"]))

    setc(model.conv1, params["stem"]["conv"])
    setbn(model.bn1, params["stem"]["bn"], state["stem"]["bn"])
    for si in range(4):
        for bi in range(BOTTLENECK_COUNTS[si]):
            tb = getattr(model, f"layer{si + 1}")[bi]
            p = params[f"layer{si + 1}"][bi]
            s = state[f"layer{si + 1}"][bi]
            for ci in (1, 2, 3):
                setc(getattr(tb, f"conv{ci}"), p[f"conv{ci}"])
                setbn(getattr(tb, f"bn{ci}"), p[f"bn{ci}"], s[f"bn{ci}"])
            if tb.down is not None:
                setc(tb.down[0], p["down_conv"])
                setbn(tb.down[1], p["down_bn"], s["down_bn"])


def test_resnet50_matches_torch_eval():
    params, state = init_resnet50_params(jax.random.PRNGKey(0))
    # non-trivial running stats so eval-mode BN is actually exercised
    state = jax.tree.map(
        lambda x: x + 0.05 * np.random.default_rng(0).standard_normal(x.shape)
        .astype(np.float32) if x.ndim else x, state)
    state = jax.tree.map(lambda x: jnp.abs(x), state)  # keep vars positive

    model = _TorchResNet50().eval()
    _copy_into_torch(model, params, state)

    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((2, 3, 64, 32)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(imgs)).numpy()          # [2, 2048, 4, 2]
    tokens, pooled, _ = resnet50_forward(params, state, jnp.asarray(imgs),
                                         training=False,
                                         compute_dtype=jnp.float32)
    got = np.asarray(tokens).transpose(0, 2, 1).reshape(2, 2048, 4, 2)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(pooled), want.mean((2, 3)),
                               atol=2e-2, rtol=2e-3)


def test_resnet50_bn_state_updates_only_in_training():
    params, state = init_resnet50_params(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(2).standard_normal((2, 3, 64, 32)),
                       jnp.float32)
    _, _, s_eval = resnet50_forward(params, state, imgs, training=False,
                                    compute_dtype=jnp.float32)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), s_eval, state))
    _, _, s_train = resnet50_forward(params, state, imgs, training=True,
                                     compute_dtype=jnp.float32)
    m0 = state["stem"]["bn"]["mean"]
    m1 = s_train["stem"]["bn"]["mean"]
    assert not np.allclose(np.asarray(m0), np.asarray(m1))


def test_signal_model_with_resnet_backbone():
    from signal_tpu.models.signal_model import (
        ModelSpec, forward_eval, forward_train, init_signal_params)

    cfg = Config()
    cfg.MODEL.TRANSFORMER_TYPE = "resnet50"
    cfg.INPUT.SIZE_TRAIN = (64, 64)
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    cfg.MODEL.TOPK = 3
    cfg.MODEL.stageName = "together_CLS_Patch"
    spec = ModelSpec.from_config(cfg, num_classes=5, camera_num=2)
    assert spec.backbone == "resnet" and spec.feat_dim == 2048
    assert (spec.h, spec.w) == (4, 4)
    spec = dataclasses.replace(spec, compute_dtype="float32")

    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    assert "base" in bn  # backbone BN running stats live in the state tree
    rng = np.random.default_rng(0)
    imgs = {m: jnp.asarray(rng.standard_normal((2, 3, 64, 64)), jnp.float32)
            for m in ("RGB", "NI", "TI")}
    cams = jnp.asarray([0, 1])
    out, new_bn = forward_train(params, bn, imgs, cams, spec)
    assert out["scores"][0].shape == (2, 5)
    assert np.isfinite(float(out["lam"]))
    # backbone BN stats advanced
    assert not np.allclose(
        np.asarray(bn["base"]["stem"]["bn"]["mean"]),
        np.asarray(new_bn["base"]["stem"]["bn"]["mean"]))
    feat = forward_eval(params, bn, imgs, cams, spec)
    assert feat.shape == (2, 6 * 2048)


def test_resnet_param_groups_and_adam_step():
    """Regression: list-valued param nodes (resnet stages) must flow
    through build_param_groups and the optimizer update."""
    from signal_tpu.solver import adam_init, adam_update, build_param_groups

    cfg = Config()
    cfg.MODEL.TRANSFORMER_TYPE = "resnet50"
    params, _ = init_resnet50_params(jax.random.PRNGKey(0))
    params = {"base": params,
              "classifier": {"kernel": jnp.zeros((2048, 5))}}
    lr_tree, wd_tree, tr_tree = build_param_groups(params, cfg)
    assert isinstance(lr_tree["base"]["layer1"], list)
    grads = jax.tree.map(jnp.ones_like, params)
    state = adam_init(params)
    new_params, _ = adam_update(
        grads, state, params, base_lr_tree=lr_tree, wd_tree=wd_tree,
        trainable_tree=tr_tree, lr_a=jnp.float32(0.0), lr_b=jnp.float32(1.0))
    moved = np.asarray(new_params["base"]["layer1"][0]["conv1"])
    assert not np.allclose(moved, np.asarray(params["base"]["layer1"][0]["conv1"]))


def test_resnet_family_depths():
    """resnet101/152 share the structure-driven forward + importer."""
    import jax
    import jax.numpy as jnp

    from signal_tpu.models.resnet import (
        RESNET_BLOCK_COUNTS, init_resnet50_params, resnet50_forward)

    params, state = init_resnet50_params(
        jax.random.PRNGKey(0), block_counts=RESNET_BLOCK_COUNTS[101])
    assert len(params["layer3"]) == 23
    x = jnp.zeros((2, 3, 64, 32), jnp.float32)
    tokens, pooled, _ = resnet50_forward(params, state, x)
    assert tokens.shape == (2, (64 // 16) * (32 // 16), 2048)
    assert pooled.shape == (2, 2048)

    from signal_tpu.config import Config
    from signal_tpu.models.signal_model import ModelSpec

    cfg = Config()
    cfg.MODEL.TRANSFORMER_TYPE = "resnet101"
    cfg.INPUT.SIZE_TRAIN = (64, 32)
    spec = ModelSpec.from_config(cfg, num_classes=4, camera_num=2)
    assert spec.backbone == "resnet" and spec.layers == 101


def test_resnet_backward_through_trunk():
    """Regression: preferred_element_type=f32 on bf16 conv operands breaks
    the conv-transpose grad rule — the trunk must be differentiable."""
    import jax

    params, state = init_resnet50_params(jax.random.PRNGKey(0))
    x = jnp.ones((2, 3, 64, 32), jnp.float32)

    def loss(p):
        _, pooled, _ = resnet50_forward(p, state, x, training=True)
        return jnp.sum(pooled ** 2)

    g = jax.grad(loss)(params)
    gnorm = np.asarray(jnp.abs(g["stem"]["conv"]).max())
    assert np.isfinite(gnorm) and gnorm > 0
