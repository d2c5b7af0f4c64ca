"""AOT serving export (`signal_tpu/serving.py`): jax.export round-trip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signal_tpu import serving
from signal_tpu.config import Config
from signal_tpu.models.signal_model import (ModelSpec, forward_eval,
                                            init_signal_params)


def _tiny():
    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    cfg.MODEL.stageName = "together_CLS_Patch"
    spec = ModelSpec.from_config(cfg, num_classes=8, camera_num=2)
    spec = dataclasses.replace(spec, layers=2, width=256, feat_dim=64,
                               num_heads=4, h=4, w=4, topk=4)
    params, bn_state = init_signal_params(jax.random.PRNGKey(0), spec)
    return spec, params, bn_state


def test_symbolic_batch_export_round_trip(tmp_path):
    """One artifact serves multiple batch sizes; features track the
    direct forward (bf16 reassociation noise between compilations is
    expected — compare by cosine)."""
    spec, params, bn_state = _tiny()
    ex = serving.export_eval(params, bn_state, spec, image_size=(64, 64))
    path = serving.save_exported(ex, str(tmp_path / "artifact"),
                                 extra_manifest={"feat_dim": 384})
    call, manifest = serving.load_exported(path)
    assert manifest["feat_dim"] == 384
    assert manifest["bytes"] > 0

    spec_x = dataclasses.replace(spec, use_flash=False)
    for B in (2, 5):
        rng = np.random.default_rng(B)
        imgs = {m: jnp.asarray(rng.standard_normal((B, 3, 64, 64)),
                               jnp.float32) for m in ("RGB", "NI", "TI")}
        cam = jnp.asarray(rng.integers(0, 2, B), jnp.int32)
        got = np.asarray(call(imgs, cam))
        want = np.asarray(forward_eval(params, bn_state, imgs, cam, spec_x))
        assert got.shape == (B, 384)
        cos = np.sum(got * want, -1) / (
            np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1))
        assert cos.min() > 0.999, cos
        np.testing.assert_allclose(got, want, atol=5e-2)


def test_uint8_fixed_batch_export(tmp_path):
    """normalize=(mean,std) bakes the uint8→Normalize stage into the
    graph: the artifact takes raw uint8 crops."""
    spec, params, bn_state = _tiny()
    ex = serving.export_eval(params, bn_state, spec, image_size=(64, 64),
                             batch=3, normalize=((0.5,) * 3, (0.5,) * 3))
    path = serving.save_exported(ex, str(tmp_path / "u8"))
    call, manifest = serving.load_exported(path)
    assert "uint8" in manifest["in_avals"][0]

    rng = np.random.default_rng(0)
    imgs = {m: jnp.asarray(rng.integers(0, 256, (3, 3, 64, 64)), jnp.uint8)
            for m in ("RGB", "NI", "TI")}
    cam = jnp.zeros((3,), jnp.int32)
    out = np.asarray(call(imgs, cam))
    assert out.shape == (3, 384) and np.isfinite(out).all()

    # matches feeding pre-normalized floats to the direct forward
    spec_x = dataclasses.replace(spec, use_flash=False)
    f = {m: (v.astype(jnp.float32) / 255.0 - 0.5) / 0.5
         for m, v in imgs.items()}
    want = np.asarray(forward_eval(params, bn_state, f, cam, spec_x))
    np.testing.assert_allclose(out, want, atol=5e-2)


def test_fixed_batch_export_off_tpu_drops_pallas():
    """A flash-enabled spec exported at a fixed batch on a non-TPU host
    (or for a non-TPU target) must fall back to XLA attention — the
    kernel's lowering is backend-dependent, so keeping it would bake
    either an unloadable Mosaic call or slow interpret-mode emulation
    into the artifact."""
    spec, params, bn_state = _tiny()
    spec = dataclasses.replace(spec, use_flash=True)
    assert jax.default_backend() != "tpu"  # conftest pins CPU
    for platforms in (None, ("cpu",), ("tpu",)):
        ex = serving.export_eval(params, bn_state, spec,
                                 image_size=(64, 64), batch=2,
                                 platforms=platforms)
        # NB: can't grep for 'pallas' — MLIR loc metadata embeds the
        # caller's (this test's) function name
        assert "tpu_custom_call" not in ex.mlir_module()


def test_build_model_for_test_requires_camera_num_with_sie():
    """Skipping the dataset scan (--num_classes) while MODEL.SIE_CAMERA
    is on must fail fast: a guessed camera count builds an SIE table the
    checkpoint cannot load into."""
    import pytest

    from signal_tpu.cli import build_model_for_test

    cfg = Config()
    assert cfg.MODEL.SIE_CAMERA
    with pytest.raises(ValueError, match="camera_num"):
        build_model_for_test(cfg, num_classes=8)


def test_export_rejects_wrong_rank():
    spec, params, bn_state = _tiny()
    ex = serving.export_eval(params, bn_state, spec, image_size=(64, 64),
                             batch=2)
    bad = {m: jnp.zeros((2, 3, 32, 64), jnp.float32)
           for m in ("RGB", "NI", "TI")}
    try:
        ex.call(bad, jnp.zeros((2,), jnp.int32))
    except Exception:
        pass
    else:  # pragma: no cover
        raise AssertionError("mismatched input shape was accepted")


def test_multiplatform_export_and_mesh_serving(tmp_path):
    """One artifact lowered for ('cpu','tpu'), and data-parallel serving:
    the deserialized module called under jit with mesh-sharded inputs —
    GSPMD partitions the embedded StableHLO."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs the virtual multi-device CPU mesh")

    spec, params, bn_state = _tiny()
    ex = serving.export_eval(params, bn_state, spec, image_size=(64, 64),
                             platforms=("cpu", "tpu"))
    assert tuple(ex.platforms) == ("cpu", "tpu")
    path = serving.save_exported(ex, str(tmp_path / "mp"))
    call, manifest = serving.load_exported(path)
    assert manifest["platforms"] == ["cpu", "tpu"]

    n = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()).reshape(n), ("data",))
    sh = NamedSharding(mesh, P("data"))
    B = 2 * n
    rng = np.random.default_rng(0)
    imgs_np = {m: rng.standard_normal((B, 3, 64, 64)).astype(np.float32)
               for m in ("RGB", "NI", "TI")}
    imgs = {m: jax.device_put(jnp.asarray(v), sh) for m, v in imgs_np.items()}
    cam = jax.device_put(jnp.zeros((B,), jnp.int32), sh)

    served = np.asarray(jax.jit(call)(imgs, cam))
    single = np.asarray(call(imgs_np, np.zeros((B,), np.int32)))
    assert served.shape == (B, 384)
    np.testing.assert_allclose(served, single, atol=5e-2)


def test_bridged_export_round_trip(tmp_path):
    """torch CNN → bridge → StableHLO artifact → load → same outputs
    (weights baked in; torch absent at serve time)."""
    torch = pytest.importorskip("torch")
    import numpy as np
    import torch.nn as nn

    from signal_tpu.serving import (export_bridged, load_exported_bridged,
                                    save_exported)
    from signal_tpu.torch_bridge import lower_torch_module

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 8, 3, stride=2, padding=1)
            self.bn = nn.BatchNorm2d(8)
            self.fc = nn.Linear(8, 5)

        def forward(self, x):
            return self.fc(torch.relu(self.bn(self.conv(x))).mean((2, 3)))

    torch.manual_seed(0)
    bm = lower_torch_module(Net().eval(), (torch.randn(4, 3, 32, 32),))
    ex = export_bridged(bm)
    path = save_exported(ex, str(tmp_path / "bridged"),
                         extra_manifest={"bridge": True})
    call, manifest = load_exported_bridged(path)
    assert manifest["bridge"] is True

    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((4, 3, 32, 32)), jnp.float32)
    np.testing.assert_allclose(np.asarray(call(x)), np.asarray(bm(x)),
                               rtol=1e-5, atol=1e-6)

    # shape-specialized: wrong batch must be rejected by the artifact
    bad = jnp.zeros((2, 3, 32, 32), jnp.float32)
    with pytest.raises(Exception):
        call(bad)
