"""Model-level behavior tests (tiny spec; CPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from signal_tpu.config import Config
from signal_tpu.models.signal_model import (
    ModelSpec, forward_eval, forward_train, init_signal_params)


def tiny_spec(**over):
    cfg = Config()
    cfg.MODEL.USE_A = over.pop("use_a", True)
    cfg.MODEL.USE_B = over.pop("use_b", True)
    cfg.MODEL.TOPK = over.pop("topk", 4)
    cfg.MODEL.DIRECT = over.pop("direct", 1)
    cfg.MODEL.stageName = over.pop("stage", "together_CLS_Patch")
    spec = ModelSpec.from_config(cfg, num_classes=over.pop("num_classes", 10),
                                 camera_num=over.pop("camera_num", 4))
    return dataclasses.replace(
        spec, layers=2, width=64, feat_dim=32, num_heads=4, h=8, w=4,
        use_flash=False, compute_dtype="float32", **over)


def tiny_batch(spec, B=8, seed=0):
    rng = np.random.default_rng(seed)
    imgs = {m: jnp.asarray(rng.standard_normal((B, 3, spec.h * 16, spec.w * 16)),
                           jnp.float32) for m in ("RGB", "NI", "TI")}
    cam = jnp.asarray(rng.integers(0, spec.camera_num, B))
    return imgs, cam


def test_full_model_output_shapes():
    spec = tiny_spec()
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    imgs, cam = tiny_batch(spec)
    out, new_bn = forward_train(params, bn, imgs, cam, spec)
    assert len(out["scores"]) == 2 and len(out["feats"]) == 2
    assert out["scores"][0].shape == (8, 10)
    assert out["feats"][0].shape == (8, 96)      # 3 × feat_dim
    assert out["feats"][1].shape == (8, 96)      # SIM fused
    assert out["gam"] is not None and out["lam"] is not None
    feat = forward_eval(params, bn, imgs, cam, spec)
    assert feat.shape == (8, 192)                # ori ⊕ vars


def test_baseline_sign1_heads():
    spec = tiny_spec(use_a=False, use_b=False)
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    imgs, cam = tiny_batch(spec)
    out, _ = forward_train(params, bn, imgs, cam, spec)
    assert len(out["scores"]) == 1
    assert out["gam"] is None and out["lam"] is None
    feat = forward_eval(params, bn, imgs, cam, spec)
    assert feat.shape == (8, 96)


def test_non_direct_mode_three_heads():
    spec = tiny_spec(direct=0, use_a=True, use_b=False)
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    imgs, cam = tiny_batch(spec)
    out, _ = forward_train(params, bn, imgs, cam, spec)
    assert len(out["scores"]) == 4               # r, n, t, vars
    assert out["feats"][0].shape == (8, 32)


def test_cls_stage_skips_lam():
    spec = tiny_spec(stage="CLS")
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    imgs, cam = tiny_batch(spec)
    out, _ = forward_train(params, bn, imgs, cam, spec)
    assert out["gam"] is not None and out["lam"] is None


def test_batched_encoder_matches_sequential():
    """Batching the 3 modalities into one encoder call must equal three
    sequential calls (the reference's layout, `make_model.py:181-183`)."""
    from signal_tpu.models import vit as vit_mod

    spec = tiny_spec()
    params, _ = init_signal_params(jax.random.PRNGKey(0), spec)
    imgs, cam = tiny_batch(spec, B=4)
    cv = spec.sie_coe * params["cv_embed"][cam]

    per_modality = []
    for m in ("RGB", "NI", "TI"):
        p, c = vit_mod.vit_forward(params["base"], imgs[m], cv,
                                   num_heads=spec.num_heads,
                                   compute_dtype=jnp.float32)
        per_modality.append((p, c))

    stacked = jnp.concatenate([imgs[m] for m in ("RGB", "NI", "TI")], axis=0)
    pb, cb = vit_mod.vit_forward(params["base"], stacked, jnp.tile(cv, (3, 1)),
                                 num_heads=spec.num_heads,
                                 compute_dtype=jnp.float32)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(pb[i * 4:(i + 1) * 4]),
                                   np.asarray(per_modality[i][0]), rtol=2e-5, atol=2e-5)


def test_miss_modality_changes_features():
    spec = tiny_spec()
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    imgs, cam = tiny_batch(spec)
    full = forward_eval(params, bn, imgs, cam, spec)
    spec_miss = dataclasses.replace(spec, miss="r")
    missing = forward_eval(params, bn, imgs, cam, spec_miss)
    assert not np.allclose(np.asarray(full), np.asarray(missing))


def test_bn_state_updates_in_training():
    spec = tiny_spec(use_a=False, use_b=False)
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    imgs, cam = tiny_batch(spec)
    _, new_bn = forward_train(params, bn, imgs, cam, spec)
    assert not np.allclose(np.asarray(new_bn["bottleneck"]["mean"]),
                           np.asarray(bn["bottleneck"]["mean"]))


def test_mixed_camera_batch_matches_per_sample():
    """Regression: the batched [B*3] encoder must give every row ITS OWN
    sample's SIE embedding (a tile-vs-repeat bug once conditioned most
    samples on another sample's camera)."""
    spec = tiny_spec(use_a=False, use_b=False, camera_num=3)
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    imgs, _ = tiny_batch(spec, B=3)
    cams = jnp.asarray([0, 1, 2])
    full = forward_eval(params, bn, imgs, cams, spec)
    for b in range(3):
        one = {m: v[b:b + 1] for m, v in imgs.items()}
        single = forward_eval(params, bn, one, cams[b:b + 1], spec)
        np.testing.assert_allclose(np.asarray(full[b]), np.asarray(single[0]),
                                   rtol=2e-5, atol=2e-5)


def test_packed_batch_matches_dict():
    """The single-buffer H2D path: a packed [B, 3modal, 3ch, H, W] array
    must produce bit-identical outputs to the {'RGB','NI','TI'} dict
    (forward_eval stacks the dict into exactly that layout)."""
    spec = tiny_spec()
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    imgs, cam = tiny_batch(spec)
    packed = jnp.stack([imgs[m] for m in ("RGB", "NI", "TI")], axis=1)
    np.testing.assert_array_equal(
        np.asarray(forward_eval(params, bn, imgs, cam, spec)),
        np.asarray(forward_eval(params, bn, packed, cam, spec)))


def test_packed_uint8_normalize_matches_dict():
    from signal_tpu.data.augment import normalize_images

    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.integers(0, 256, (2, 3, 3, 8, 8), dtype=np.uint8))
    mean, std = (0.5, 0.4, 0.3), (0.5, 0.6, 0.7)
    out_packed = normalize_images(packed, mean, std)
    out_dict = normalize_images(
        {"RGB": packed[:, 0], "NI": packed[:, 1], "TI": packed[:, 2]},
        mean, std)
    for i, m in enumerate(("RGB", "NI", "TI")):
        np.testing.assert_allclose(np.asarray(out_packed[:, i]),
                                   np.asarray(out_dict[m]), rtol=1e-6)


def test_overlap_stride_forward():
    """STRIDE_SIZE < 16 (overlapping patch conv, `clip/model.py:433`
    semantics): the grid formula (img−16)//stride+1 must drive both the
    conv and the trusted image_size round-trip."""
    from signal_tpu.config import Config

    cfg = Config()
    cfg.MODEL.USE_A = False
    cfg.MODEL.USE_B = False
    cfg.MODEL.STRIDE_SIZE = (12, 12)
    cfg.INPUT.SIZE_TRAIN = (64, 64)
    cfg.INPUT.SIZE_TEST = (64, 64)
    spec = ModelSpec.from_config(cfg, num_classes=5, camera_num=2)
    assert (spec.h, spec.w) == (5, 5)          # (64-16)//12+1
    assert spec.image_size == (64, 64)          # trusted, not reconstructed
    spec = dataclasses.replace(spec, layers=2, width=64, feat_dim=32,
                               num_heads=4, use_flash=False,
                               compute_dtype="float32")
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(0)
    imgs = {m: jnp.asarray(rng.standard_normal((2, 3, 64, 64)), jnp.float32)
            for m in ("RGB", "NI", "TI")}
    feat = forward_eval(params, bn, imgs, jnp.asarray([0, 1]), spec)
    assert feat.shape == (2, 96)


def test_image_size_ambiguous_overlap_raises():
    """dataclasses.replace that shrinks the grid under an overlapping
    stride makes image_size unreconstructable — must raise, not guess."""
    import pytest

    from signal_tpu.config import Config

    cfg = Config()
    cfg.MODEL.STRIDE_SIZE = (12, 12)
    cfg.INPUT.SIZE_TRAIN = (64, 64)
    spec = ModelSpec.from_config(cfg, num_classes=5, camera_num=2)
    shrunk = dataclasses.replace(spec, h=4, w=4)
    with pytest.raises(ValueError, match="ambiguous"):
        _ = shrunk.image_size
