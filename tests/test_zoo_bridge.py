"""The CNN-zoo bridge: every reference zoo member lowered to JAX and
parity-checked against the torch module it came from.

One representative per source file runs in the default suite (covers
every architecture code path / aten-op combination); the width/depth
variants of the same files run under ``-m slow``. CAL is asserted
broken-at-source (see ``signal_tpu/models/zoo.py`` docstring).
"""

import inspect
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

from signal_tpu.models.zoo import (           # noqa: E402
    ZOO, build_zoo_backbone, load_zoo_module)

ZOO_DIR = "/root/reference/modeling/backbones/basic_cnn_params"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ZOO_DIR), reason="reference checkout not present")

# one per source file — distinct architectures / op mixes
REPRESENTATIVES = [
    "densenet121", "se_resnet50", "mobilenetv2_x1_0", "shufflenet",
    "shufflenet_v2_x1_0", "squeezenet1_0", "xception", "inceptionv4",
    "inceptionresnetv2", "nasnetamobile", "mlfn", "pcb_p6", "resnet50mid",
    "osnet_ain_x1_0", "resnet50_ibn_a", "resnet50_ibn_b", "hacnn", "mudeep",
]
VARIANTS = sorted(set(ZOO) - set(REPRESENTATIVES))


def _build_torch(name, num_classes=7):
    entry = ZOO[name]
    mod = load_zoo_module(ZOO_DIR, entry.file)
    f = getattr(mod, entry.factory)
    sig = inspect.signature(f)
    kw = dict(entry.kwargs)
    if "num_classes" in sig.parameters:
        kw.setdefault("num_classes", num_classes)
    if "loss" in sig.parameters:
        kw.setdefault("loss", "softmax")
    if "pretrained" in sig.parameters:
        kw.setdefault("pretrained", False)
    return f(**kw).eval()


def _parity(name):
    entry = ZOO[name]
    torch.manual_seed(0)
    bm = build_zoo_backbone(name, zoo_dir=ZOO_DIR, num_classes=7,
                            batch_size=2)
    torch.manual_seed(0)
    tm = _build_torch(name)
    gen = torch.Generator().manual_seed(42)
    x = torch.randn(2, 3, *entry.input_hw, generator=gen)
    with torch.no_grad():
        ref = tm(x)
    if isinstance(ref, (tuple, list)):       # train-mode style returns
        ref = ref[0]
    ref = ref.numpy()
    out = np.asarray(jax.jit(bm.fn)(bm.params, jnp.asarray(x.numpy())))
    assert out.shape == ref.shape
    assert out.shape[-1] == entry.feat_dim
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-8)
    assert err < 1e-4, f"{name}: relative error {err:.2e}"


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_zoo_parity(name):
    _parity(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", VARIANTS)
def test_zoo_parity_variants(name):
    _parity(name)


def test_bridged_module_differentiable():
    """Fine-tuning path: grads flow to every float param of a bridged
    net (frozen BN stats ride along as non-float or unused leaves)."""
    torch.manual_seed(0)
    bm = build_zoo_backbone("mobilenetv2_x1_0", zoo_dir=ZOO_DIR,
                            num_classes=5, batch_size=2)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 3, 256, 128)), jnp.float32)

    def loss_fn(fparams):
        p = dict(bm.params)
        p.update(fparams)
        return jnp.sum(bm.fn(p, x) ** 2)

    fparams = {k: bm.params[k] for k in bm.float_keys}
    grads = jax.grad(loss_fn)(fparams)
    # conv/classifier weights must receive nonzero grads
    nonzero = sum(float(jnp.abs(g).max()) > 0 for g in grads.values())
    assert nonzero > len(grads) * 0.5
    assert all(np.isfinite(np.asarray(g)).all() for g in grads.values())


def test_bridged_bf16_compute():
    """compute_dtype=bfloat16 routes convs/matmuls to MXU dtype while
    staying close to the fp32 result."""
    torch.manual_seed(0)
    bm32 = build_zoo_backbone("se_resnet50", zoo_dir=ZOO_DIR,
                              num_classes=5, batch_size=2)
    torch.manual_seed(0)
    bm16 = build_zoo_backbone("se_resnet50", zoo_dir=ZOO_DIR,
                              num_classes=5, batch_size=2,
                              compute_dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((2, 3, 256, 128)), jnp.float32)
    a = np.asarray(bm32(x))
    b = np.asarray(bm16(x))
    denom = np.abs(a).max() + 1e-8
    assert np.abs(a - b).max() / denom < 0.05


def test_train_mode_bridge_bn_stats_and_logits():
    """Train-mode lowering (torch.export path): batch-stat BN forward
    matches torch's train forward, and the returned running-stat updates
    match torch's in-place updates exactly."""
    torch.manual_seed(0)
    bm = build_zoo_backbone("mobilenetv2_x1_0", zoo_dir=ZOO_DIR,
                            num_classes=6, batch_size=4, train_mode=True)
    torch.manual_seed(0)
    tm = _build_torch("mobilenetv2_x1_0", num_classes=6).train()
    gen = torch.Generator().manual_seed(3)
    x = torch.randn(4, 3, 256, 128, generator=gen)
    torch.manual_seed(7)      # dropout draw (values not compared)
    ref = tm(x)
    if isinstance(ref, (tuple, list)):
        ref = ref[0]

    import jax.random as jr
    out, updates = bm.fn(bm.params, jnp.asarray(x.numpy()),
                         rng=jr.PRNGKey(7))
    assert set(updates) == set(bm.buffer_targets)
    # every BN running stat matches torch's post-forward value
    ref_buffers = dict(tm.named_buffers())
    checked = 0
    for k, v in updates.items():
        if k.endswith(("running_mean", "running_var")):
            r = ref_buffers[k].detach().numpy()
            np.testing.assert_allclose(np.asarray(v), r, rtol=2e-5,
                                       atol=1e-6, err_msg=k)
            checked += 1
    assert checked > 50  # mobilenetv2 has 52 BN layers
    # logits: mobilenetv2's classifier has no dropout before it? it does —
    # compare only shape/finiteness (dropout draws differ across frameworks)
    assert np.asarray(out).shape == tuple(ref.shape)
    assert np.isfinite(np.asarray(out)).all()


def test_train_mode_bridge_logit_parity_no_dropout():
    """With a dropout-free net (se_resnet50), train-mode logits match
    torch exactly."""
    torch.manual_seed(0)
    bm = build_zoo_backbone("se_resnet50", zoo_dir=ZOO_DIR,
                            num_classes=6, batch_size=2, train_mode=True)
    torch.manual_seed(0)
    tm = _build_torch("se_resnet50", num_classes=6).train()
    gen = torch.Generator().manual_seed(5)
    x = torch.randn(2, 3, 256, 128, generator=gen)
    ref = tm(x)
    if isinstance(ref, (tuple, list)):
        ref = ref[0]
    ref = ref.detach().numpy()
    out, _ = bm.fn(bm.params, jnp.asarray(x.numpy()))
    if isinstance(out, tuple):
        out = out[0]
    err = np.abs(np.asarray(out) - ref).max() / (np.abs(ref).max() + 1e-8)
    assert err < 1e-3, f"train-mode relative error {err:.2e}"


def test_cal_is_broken_at_source():
    """CAL cannot run in the reference: classifier_bap is Linear(6144,768)
    (`cal.py:314`) but BAP emits 8*2048=16384 features (`cal.py:171-219`)."""
    mod = load_zoo_module(ZOO_DIR, "cal.py")
    m = mod.CAL(num_classes=7).eval()
    with pytest.raises(RuntimeError):
        with torch.no_grad():
            m(torch.randn(2, 3, 256, 128))


def test_zoo_dir_error_message(monkeypatch):
    monkeypatch.delenv("SIGNAL_ZOO_DIR", raising=False)
    with pytest.raises(ValueError):
        build_zoo_backbone("se_resnet50", zoo_dir=None)
    with pytest.raises(KeyError):
        build_zoo_backbone("not_a_net", zoo_dir=ZOO_DIR)
