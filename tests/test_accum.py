"""Gradient accumulation (SOLVER.ACCUM_ITER — TPU-native knob).

Semantics: the global batch [B] is split into A contiguous microbatches
of B/A; each microbatch runs the full forward/backward (losses — incl.
the batch-level triplet mining and GAM contrastive — are computed WITHIN
the microbatch, standard accumulation semantics), gradients are averaged,
and ONE optimizer update is applied.

Core property tested here: a duplicated batch [h; h] at ACCUM_ITER=2 must
produce exactly the updates of the single batch h at ACCUM_ITER=1 — each
microbatch sees precisely h, so per-microbatch losses/grads/BN batch
stats all coincide with the unaccumulated step (BN *running* stats apply
their momentum twice and are deliberately not compared).

The equality tests use SGD: its update is linear in the grads, so a
near-zero-grad leaf stays near-equal. Adam's m/√v normalizes ANY grad to
a ±lr-sized step, amplifying fp-noise sign flips on analytically-zero
grads into full-size param differences (observed on a 96-element leaf).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from signal_tpu.config import Config


def _tiny(num_classes=8, use_center=False):
    from signal_tpu.models.signal_model import ModelSpec

    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    cfg.MODEL.TOPK = 4
    cfg.MODEL.stageName = "together_CLS_Patch"
    cfg.SOLVER.OPTIMIZER_NAME = "SGD"
    cfg.SOLVER.IMS_PER_BATCH = 16
    if use_center:
        cfg.MODEL.METRIC_LOSS_TYPE = "triplet_center"
    spec = ModelSpec.from_config(cfg, num_classes=num_classes, camera_num=2)
    spec = dataclasses.replace(spec, layers=2, width=64, feat_dim=32,
                               num_heads=4, h=4, w=4, topk=4, use_flash=False,
                               compute_dtype="float32")
    return cfg, spec


def _half_batch(num_classes, B=8, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    if dtype == np.uint8:
        imgs = {m: rng.integers(0, 256, (B, 3, 64, 64), dtype=np.uint8)
                for m in ("RGB", "NI", "TI")}
    else:
        imgs = {m: rng.standard_normal((B, 3, 64, 64)).astype(np.float32)
                for m in ("RGB", "NI", "TI")}
    return {
        "imgs": imgs,
        "pids": rng.integers(0, num_classes, B),
        "camids": rng.integers(0, 2, B),
    }


def _dup(batch):
    """[h; h]: the duplicated two-microbatch global batch."""
    return jax.tree.map(lambda x: np.concatenate([x, x], axis=0), batch)


def _run_step(cfg, spec, params, bn, batch, mesh=None, centers=None):
    from signal_tpu.engine.train import _device_batch, make_train_step
    from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs

    group_trees = build_param_groups(params, cfg)
    step = make_train_step(spec, cfg, spec.num_classes, mesh=mesh)
    lr_a, lr_b = schedule_coeffs(cfg, 1)
    db = _device_batch(batch, mesh, accum=cfg.SOLVER.ACCUM_ITER)
    p = jax.tree.map(jnp.copy, params)
    opt = (jax.tree.map(lambda x: jnp.zeros_like(x, jnp.float32), p)
           if cfg.SOLVER.OPTIMIZER_NAME == "SGD" else adam_init(p))
    new_p, _, _, loss, acc, new_centers = step(
        p, jax.tree.map(jnp.copy, bn), opt, db,
        jnp.float32(lr_a), jnp.float32(lr_b),
        jax.tree.map(jnp.asarray, group_trees), None,
        None if centers is None else jnp.copy(centers))
    return new_p, float(loss), float(acc), new_centers


def test_accum2_matches_unaccumulated_on_duplicated_batch():
    from signal_tpu.models.signal_model import init_signal_params

    cfg, spec = _tiny()
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    h = _half_batch(spec.num_classes)

    p_ref, loss_ref, acc_ref, _ = _run_step(cfg, spec, params, bn, h)

    cfg2 = cfg.clone()
    cfg2.SOLVER.ACCUM_ITER = 2
    p_acc, loss_acc, acc_acc, _ = _run_step(cfg2, spec, params, bn, _dup(h))

    np.testing.assert_allclose(loss_acc, loss_ref, rtol=1e-5)
    np.testing.assert_allclose(acc_acc, acc_ref, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_accum_uint8_and_center_loss_path():
    """uint8 pixels (device normalize inside the microbatch scan) + the
    center-loss branch: duplicated-batch equality incl. the centers."""
    from signal_tpu.models.signal_model import init_signal_params

    cfg, spec = _tiny(use_center=True)
    params, bn = init_signal_params(jax.random.PRNGKey(1), spec)
    cdim = 3 * spec.feat_dim if spec.direct else spec.feat_dim
    centers = jax.random.normal(jax.random.PRNGKey(7),
                                (spec.num_classes, cdim), jnp.float32)
    h = _half_batch(spec.num_classes, dtype=np.uint8, seed=1)

    p_ref, loss_ref, _, c_ref = _run_step(cfg, spec, params, bn, h,
                                          centers=centers)
    cfg2 = cfg.clone()
    cfg2.SOLVER.ACCUM_ITER = 2
    p_acc, loss_acc, _, c_acc = _run_step(cfg2, spec, params, bn, _dup(h),
                                          centers=centers)

    # rtol 1e-4: CPU matmuls run bf16 AMX passes at default precision, so
    # the scan-vs-inline op ordering shifts the loss by a few 1e-5 relative
    np.testing.assert_allclose(loss_acc, loss_ref, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(c_acc), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 (virtual) devices")
def test_accum_under_dp_mesh_matches_single_device():
    """ACCUM_ITER=2 on the 8-device DP mesh (microbatch axis replicated,
    batch axis sharded over 'data') equals the single-device accum step."""
    from signal_tpu.models.signal_model import init_signal_params
    from signal_tpu.parallel.mesh import create_mesh, shard_params

    cfg, spec = _tiny()
    cfg.SOLVER.ACCUM_ITER = 2
    params, bn = init_signal_params(jax.random.PRNGKey(2), spec)
    full = _dup(_half_batch(spec.num_classes, seed=2))

    p_ref, loss_ref, acc_ref, _ = _run_step(cfg, spec, params, bn, full)

    mesh = create_mesh(num_data=8, num_model=1)
    with mesh:
        p8 = shard_params(jax.tree.map(jnp.copy, params), mesh)
        p_dp, loss_dp, acc_dp, _ = _run_step(cfg, spec, p8, bn, full,
                                             mesh=mesh)
    np.testing.assert_allclose(loss_dp, loss_ref, rtol=1e-4)
    np.testing.assert_allclose(acc_dp, acc_ref, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 (virtual) devices")
def test_accum_composes_with_tensor_parallelism():
    """ACCUM_ITER=2 on a 4x2 ('data','model') mesh — microbatch scan over
    TP-sharded ViT blocks — matches the single-device accum step."""
    from signal_tpu.models.signal_model import init_signal_params
    from signal_tpu.parallel.mesh import create_mesh, shard_params

    cfg, spec = _tiny(num_classes=8)
    cfg.SOLVER.ACCUM_ITER = 2
    cfg.PARALLEL.MODEL_AXIS = 2
    params, bn = init_signal_params(jax.random.PRNGKey(3), spec)
    full = _dup(_half_batch(spec.num_classes, seed=3))

    p_ref, loss_ref, acc_ref, _ = _run_step(cfg, spec, params, bn, full)

    mesh = create_mesh(num_data=4, num_model=2)
    with mesh:
        ptp = shard_params(jax.tree.map(jnp.copy, params), mesh)
        p_tp, loss_tp, acc_tp, _ = _run_step(cfg, spec, ptp, bn, full,
                                             mesh=mesh)
    np.testing.assert_allclose(loss_tp, loss_ref, rtol=1e-4)
    np.testing.assert_allclose(acc_tp, acc_ref, rtol=1e-6)
    # params too — loss/acc are forward-only, a backward bug under the
    # sharded scan (e.g. a bad reduction on row-parallel grad shards)
    # would not show in them
    for a, b in zip(jax.tree.leaves(p_tp), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


def test_accum_rejects_indivisible_batch():
    from signal_tpu.engine.train import _device_batch

    h = _half_batch(8, B=6)
    with pytest.raises(ValueError, match="ACCUM_ITER"):
        _device_batch(h, None, accum=4)
