"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from signal_tpu.config import Config


requires_8_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


@requires_8_devices
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@requires_8_devices
def test_dp_matches_single_device_loss():
    """Data-parallel sharded step computes the same loss as unsharded."""
    from signal_tpu.engine.train import make_train_step
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
    from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs

    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    cfg.MODEL.TOPK = 4
    cfg.MODEL.stageName = "together_CLS_Patch"
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.IMS_PER_BATCH = 16
    num_classes = 8
    spec = ModelSpec.from_config(cfg, num_classes=num_classes, camera_num=2)
    # w=4 (not 2): LAM's DAS requires both grid dims >= its stride of 4
    spec = dataclasses.replace(spec, layers=2, width=64, feat_dim=32,
                               num_heads=4, h=4, w=4, topk=4, use_flash=False,
                               compute_dtype="float32")

    params, bn_state = init_signal_params(jax.random.PRNGKey(0), spec)
    group_trees = build_param_groups(params, cfg)
    train_step = make_train_step(spec, cfg, num_classes)

    B = 16
    rng = np.random.default_rng(0)
    batch = {
        "imgs": {m: jnp.asarray(rng.standard_normal((B, 3, 64, 64)), jnp.float32)
                 for m in ("RGB", "NI", "TI")},
        "pids": jnp.asarray(rng.integers(0, num_classes, B)),
        "camids": jnp.asarray(rng.integers(0, 2, B)),
    }
    lr_a, lr_b = schedule_coeffs(cfg, 1)

    # single device (deep-copy state: the step donates its buffers)
    _, _, _, loss_ref, acc_ref, _ = train_step(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, bn_state),
        adam_init(params), batch, jnp.float32(lr_a), jnp.float32(lr_b),
        group_trees)

    # 8-device DP mesh
    mesh = create_mesh(num_data=8, num_model=1)
    with mesh:
        p8 = shard_params(jax.tree.map(jnp.copy, params), mesh)
        b8 = shard_batch(batch, mesh)
        _, _, _, loss_dp, acc_dp, _ = train_step(
            p8, jax.tree.map(jnp.copy, bn_state), adam_init(p8), b8,
            jnp.float32(lr_a), jnp.float32(lr_b), group_trees)

    assert np.isfinite(float(loss_ref)), "single-device loss must be finite"
    np.testing.assert_allclose(float(loss_ref), float(loss_dp), rtol=1e-4)
    np.testing.assert_allclose(float(acc_ref), float(acc_dp), rtol=1e-6)


@requires_8_devices
def test_tp_forward_matches_single_device():
    """Tensor-parallel (2-way) forward equals replicated forward."""
    import dataclasses as dc

    from signal_tpu.models.signal_model import (
        ModelSpec, forward_eval, init_signal_params)
    from signal_tpu.parallel.mesh import create_mesh, shard_batch, shard_params

    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = False
    cfg.MODEL.TOPK = 4
    spec = ModelSpec.from_config(cfg, num_classes=8, camera_num=2)
    spec = dc.replace(spec, layers=2, width=64, feat_dim=32, num_heads=4,
                      h=4, w=2, use_flash=False, compute_dtype="float32")
    params, bn = init_signal_params(jax.random.PRNGKey(1), spec)
    rng = np.random.default_rng(1)
    imgs = {m: jnp.asarray(rng.standard_normal((8, 3, 64, 32)), jnp.float32)
            for m in ("RGB", "NI", "TI")}
    cam = jnp.asarray(rng.integers(0, 2, 8))

    ref = forward_eval(params, bn, imgs, cam, spec)

    mesh = create_mesh(num_data=4, num_model=2)
    fn = jax.jit(lambda p, s, x, c: forward_eval(p, s, x, c, spec))
    with mesh:
        p_tp = shard_params(params, mesh)
        sharded = shard_batch({"imgs": imgs, "camids": cam}, mesh)
        out = fn(p_tp, bn, sharded["imgs"], sharded["camids"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-4)


@requires_8_devices
def test_tp_flash_forward_matches_single_device():
    """The Pallas attention kernel runs SHARDED under 2-way TP (shard_map
    over 'model' head groups) and matches the single-device kernel.
    Width 256 / 4 heads → per-shard 128 columns, the Mosaic lane size."""
    import dataclasses as dc

    from signal_tpu.models.signal_model import (
        ModelSpec, forward_eval, init_signal_params)
    from signal_tpu.parallel.mesh import (
        create_mesh, shard_batch, shard_params, use_mesh)

    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = False
    cfg.MODEL.TOPK = 4
    spec = ModelSpec.from_config(cfg, num_classes=8, camera_num=2)
    spec = dc.replace(spec, layers=2, width=256, feat_dim=64, num_heads=4,
                      h=4, w=2, use_flash=True, compute_dtype="float32")
    params, bn = init_signal_params(jax.random.PRNGKey(1), spec)
    rng = np.random.default_rng(1)
    imgs = {m: jnp.asarray(rng.standard_normal((8, 3, 64, 32)), jnp.float32)
            for m in ("RGB", "NI", "TI")}
    cam = jnp.asarray(rng.integers(0, 2, 8))

    ref = forward_eval(params, bn, imgs, cam, spec)   # single-device kernel

    mesh = create_mesh(num_data=4, num_model=2)
    fn = jax.jit(lambda p, s, x, c: forward_eval(p, s, x, c, spec))
    with mesh, use_mesh(mesh):
        p_tp = shard_params(params, mesh)
        sharded = shard_batch({"imgs": imgs, "camids": cam}, mesh)
        out = fn(p_tp, bn, sharded["imgs"], sharded["camids"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


@requires_8_devices
def test_dp_flash_forward_matches_single_device():
    """Pure data parallelism (8×1) also routes the Pallas kernel through
    shard_map — GSPMD would otherwise compute the custom call replicated
    (all-gathered operands), silently wasting the mesh."""
    import dataclasses as dc

    from signal_tpu.models.signal_model import (
        ModelSpec, forward_eval, init_signal_params)
    from signal_tpu.parallel.mesh import (
        create_mesh, shard_batch, shard_params, use_mesh)

    cfg = Config()
    cfg.MODEL.USE_A = False
    cfg.MODEL.USE_B = False
    spec = ModelSpec.from_config(cfg, num_classes=8, camera_num=2)
    spec = dc.replace(spec, layers=2, width=256, feat_dim=64, num_heads=4,
                      h=4, w=2, use_flash=True, compute_dtype="float32")
    params, bn = init_signal_params(jax.random.PRNGKey(3), spec)
    rng = np.random.default_rng(3)
    imgs = {m: jnp.asarray(rng.standard_normal((8, 3, 64, 32)), jnp.float32)
            for m in ("RGB", "NI", "TI")}
    cam = jnp.asarray(rng.integers(0, 2, 8))

    ref = forward_eval(params, bn, imgs, cam, spec)

    mesh = create_mesh(num_data=8, num_model=1)
    fn = jax.jit(lambda p, s, x, c: forward_eval(p, s, x, c, spec))
    with mesh, use_mesh(mesh):
        p_dp = shard_params(params, mesh)
        sharded = shard_batch({"imgs": imgs, "camids": cam}, mesh)
        out = fn(p_dp, bn, sharded["imgs"], sharded["camids"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


@requires_8_devices
def test_tp_train_step_matches_single_device():
    """Full train step (fwd+bwd+Adam) under 4×2 dp×tp with the Pallas
    kernel ON equals the single-device step: same loss, same updated
    params (within fp32 reduction tolerance)."""
    from signal_tpu.engine.train import make_train_step
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
    from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs

    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    cfg.MODEL.TOPK = 4
    cfg.MODEL.stageName = "together_CLS_Patch"
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.IMS_PER_BATCH = 8
    num_classes = 8
    spec = ModelSpec.from_config(cfg, num_classes=num_classes, camera_num=2)
    # w=4: LAM's DAS needs both grid dims >= its stride of 4; width 256 /
    # 4 heads so the 2-way TP shard is a 128-column Mosaic block
    spec = dataclasses.replace(spec, layers=2, width=256, feat_dim=64,
                               num_heads=4, h=4, w=4, topk=4, use_flash=True,
                               compute_dtype="float32")

    params, bn_state = init_signal_params(jax.random.PRNGKey(2), spec)
    group_trees = build_param_groups(params, cfg)

    B = 8
    rng = np.random.default_rng(2)
    batch = {
        "imgs": {m: jnp.asarray(rng.standard_normal((B, 3, 64, 64)), jnp.float32)
                 for m in ("RGB", "NI", "TI")},
        "pids": jnp.asarray(rng.integers(0, num_classes, B)),
        "camids": jnp.asarray(rng.integers(0, 2, B)),
    }
    lr_a, lr_b = schedule_coeffs(cfg, 1)
    la, lb = jnp.float32(lr_a), jnp.float32(lr_b)

    step_1dev = make_train_step(spec, cfg, num_classes)
    p_ref, _, _, loss_ref, acc_ref, _ = step_1dev(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, bn_state),
        adam_init(params), batch, la, lb, group_trees)

    mesh = create_mesh(num_data=4, num_model=2)
    step_tp = make_train_step(spec, cfg, num_classes, mesh=mesh)
    with mesh:
        p8 = shard_params(jax.tree.map(jnp.copy, params), mesh)
        b8 = shard_batch(batch, mesh)
        p_tp, _, _, loss_tp, acc_tp, _ = step_tp(
            p8, jax.tree.map(jnp.copy, bn_state), adam_init(p8), b8,
            la, lb, group_trees)

    assert np.isfinite(float(loss_ref))
    np.testing.assert_allclose(float(loss_ref), float(loss_tp), rtol=1e-4)
    np.testing.assert_allclose(float(acc_ref), float(acc_tp), rtol=1e-6)
    # updated params must match leaf-for-leaf. Tolerance: Adam's first
    # step normalizes each gradient to ±lr (m/√v ≈ sign(g)), so fp32
    # cross-device reduction order flips near-zero gradient elements by
    # up to 2·lr — absolute, not relative, noise (measured max 1.3e-3)
    flat_ref = jax.tree.leaves(p_ref)
    flat_tp = jax.tree.leaves(p_tp)
    moved = 0
    for a, b, orig in zip(flat_ref, flat_tp, jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-3)
        moved += int(not np.allclose(np.asarray(a), np.asarray(orig)))
    assert moved > 0, "no parameter moved after the step"


@requires_8_devices
def test_checkpoint_roundtrip_of_sharded_state(tmp_path):
    """Orbax save/load of a TP-sharded TrainState: saving gathers the
    shards, loading + re-sharding reproduces the exact values — the
    production save-on-mesh / resume-on-mesh path."""
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.parallel.mesh import create_mesh, shard_params
    from signal_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.TOPK = 4
    spec = ModelSpec.from_config(cfg, num_classes=8, camera_num=2)
    spec = dataclasses.replace(spec, layers=2, width=256, feat_dim=64,
                               num_heads=4, h=4, w=4)
    params, bn = init_signal_params(jax.random.PRNGKey(5), spec)

    mesh = create_mesh(num_data=4, num_model=2)
    p_sharded = shard_params(params, mesh)
    path = str(tmp_path / "sharded_ckpt")
    save_checkpoint(path, {"params": p_sharded, "bn_state": bn, "epoch": 3})

    tree = load_checkpoint(path, {"params": params, "bn_state": bn, "epoch": 0})
    assert int(tree["epoch"]) == 3
    re_sharded = shard_params(tree["params"], mesh)
    for a, b in zip(jax.tree.leaves(p_sharded), jax.tree.leaves(re_sharded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_8_devices
def test_eval_mesh_matches_single_device(tmp_path):
    """do_inference over a data-parallel mesh = single-device mAP/CMC."""
    import dataclasses as dc

    from signal_tpu.data import make_dataloader
    from signal_tpu.engine.eval import do_inference
    from signal_tpu.models.signal_model import (
        ModelSpec, init_signal_params)
    from signal_tpu.parallel.mesh import create_mesh

    cfg = Config()
    cfg.DATASETS.NAMES = "synthetic"
    cfg.INPUT.SIZE_TRAIN = (64, 64)
    cfg.INPUT.SIZE_TEST = (64, 64)
    cfg.TEST.IMS_PER_BATCH = 8
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = False
    cfg.MODEL.TOPK = 3
    (_, _, val_loader, num_query, num_classes, cam_num, _) = make_dataloader(cfg)
    spec = ModelSpec.from_config(cfg, num_classes, cam_num)
    spec = dc.replace(spec, layers=2, width=32, feat_dim=16, num_heads=4,
                      h=4, w=4, use_flash=False, compute_dtype="float32")
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)

    cmc_ref, map_ref = do_inference(cfg, spec, params, bn, val_loader, num_query)
    (_, _, val_loader2, *_), = [make_dataloader(cfg)]  # fresh iterator
    mesh = create_mesh(num_data=8, num_model=1)
    cmc_dp, map_dp = do_inference(cfg, spec, params, bn, val_loader2,
                                  num_query, mesh=mesh)
    np.testing.assert_allclose(map_dp, map_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cmc_dp), np.asarray(cmc_ref), atol=1e-6)


@requires_8_devices
def test_sp_forward_matches_single_device():
    """PARALLEL.SEQUENCE (Megatron-SP): token-sharded residual stream
    under 4×2 dp×tp equals the replicated forward. Flash kernel ON — the
    shard_map entry reshards the token-sharded stream to head groups."""
    import dataclasses as dc

    from signal_tpu.models.signal_model import (
        ModelSpec, forward_eval, init_signal_params)
    from signal_tpu.parallel.mesh import (
        create_mesh, shard_batch, shard_params, use_mesh)

    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = False
    cfg.MODEL.TOPK = 4
    cfg.PARALLEL.SEQUENCE = True
    spec = ModelSpec.from_config(cfg, num_classes=8, camera_num=2)
    spec = dc.replace(spec, layers=2, width=256, feat_dim=64, num_heads=4,
                      h=4, w=2, use_flash=True, compute_dtype="float32")
    assert spec.sequence_parallel
    params, bn = init_signal_params(jax.random.PRNGKey(5), spec)
    rng = np.random.default_rng(5)
    imgs = {m: jnp.asarray(rng.standard_normal((8, 3, 64, 32)), jnp.float32)
            for m in ("RGB", "NI", "TI")}
    cam = jnp.asarray(rng.integers(0, 2, 8))

    ref = forward_eval(params, bn, imgs, cam, spec)  # no mesh → SP no-op

    mesh = create_mesh(num_data=4, num_model=2)
    fn = jax.jit(lambda p, s, x, c: forward_eval(p, s, x, c, spec))
    with mesh, use_mesh(mesh):
        p_tp = shard_params(params, mesh)
        sharded = shard_batch({"imgs": imgs, "camids": cam}, mesh)
        out = fn(p_tp, bn, sharded["imgs"], sharded["camids"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


@requires_8_devices
def test_sp_train_step_matches_single_device():
    """Full train step under 4×2 dp×tp WITH sequence parallelism equals
    the single-device step (loss + updated params) — proving the
    token-sharded layout threads correctly through remat'd backward."""
    from signal_tpu.engine.train import make_train_step
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
    from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs

    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    cfg.MODEL.TOPK = 4
    cfg.MODEL.stageName = "together_CLS_Patch"
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.PARALLEL.SEQUENCE = True
    num_classes = 8
    spec = ModelSpec.from_config(cfg, num_classes=num_classes, camera_num=2)
    spec = dataclasses.replace(spec, layers=2, width=256, feat_dim=64,
                               num_heads=4, h=4, w=4, topk=4, use_flash=True,
                               compute_dtype="float32")

    params, bn_state = init_signal_params(jax.random.PRNGKey(6), spec)
    group_trees = build_param_groups(params, cfg)

    B = 8
    rng = np.random.default_rng(6)
    batch = {
        "imgs": {m: jnp.asarray(rng.standard_normal((B, 3, 64, 64)), jnp.float32)
                 for m in ("RGB", "NI", "TI")},
        "pids": jnp.asarray(rng.integers(0, num_classes, B)),
        "camids": jnp.asarray(rng.integers(0, 2, B)),
    }
    lr_a, lr_b = schedule_coeffs(cfg, 1)
    la, lb = jnp.float32(lr_a), jnp.float32(lr_b)

    step_1dev = make_train_step(spec, cfg, num_classes)
    p_ref, _, _, loss_ref, acc_ref, _ = step_1dev(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, bn_state),
        adam_init(params), batch, la, lb, group_trees)

    mesh = create_mesh(num_data=4, num_model=2)
    step_sp = make_train_step(spec, cfg, num_classes, mesh=mesh)
    with mesh:
        p8 = shard_params(jax.tree.map(jnp.copy, params), mesh)
        b8 = shard_batch(batch, mesh)
        p_sp, _, _, loss_sp, acc_sp, _ = step_sp(
            p8, jax.tree.map(jnp.copy, bn_state), adam_init(p8), b8,
            la, lb, group_trees)

    assert np.isfinite(float(loss_ref))
    np.testing.assert_allclose(float(loss_ref), float(loss_sp), rtol=1e-4)
    np.testing.assert_allclose(float(acc_ref), float(acc_sp), rtol=1e-6)
    # same tolerance rationale as the TP test above (Adam step-1 sign
    # normalization turns reduction-order noise into ±lr absolute noise)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-3)


@requires_8_devices
def test_sp_composes_with_accum_and_zero1():
    """SEQUENCE + ACCUM_ITER=2 + SHARD_OPT_STATE on the 4×2 mesh equals
    the same accumulated step on one device — the three levers users
    combine for the biggest model that fits (token-sharded activations,
    microbatched HBM peak, dp-sharded moments)."""
    from signal_tpu.engine.train import _device_batch, make_train_step
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.parallel.mesh import create_mesh, shard_params
    from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs

    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = False
    cfg.MODEL.TOPK = 4
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.ACCUM_ITER = 2
    cfg.PARALLEL.SEQUENCE = True
    cfg.PARALLEL.SHARD_OPT_STATE = True
    num_classes = 8
    spec = ModelSpec.from_config(cfg, num_classes=num_classes, camera_num=2)
    spec = dataclasses.replace(spec, layers=2, width=256, feat_dim=64,
                               num_heads=4, h=4, w=4, topk=4, use_flash=True,
                               compute_dtype="float32")

    params, bn_state = init_signal_params(jax.random.PRNGKey(7), spec)
    group_trees = build_param_groups(params, cfg)

    B = 8
    rng = np.random.default_rng(7)
    raw = {
        "imgs": {m: rng.standard_normal((B, 3, 64, 64)).astype(np.float32)
                 for m in ("RGB", "NI", "TI")},
        "pids": rng.integers(0, num_classes, B),
        "camids": rng.integers(0, 2, B),
    }
    lr_a, lr_b = schedule_coeffs(cfg, 1)
    la, lb = jnp.float32(lr_a), jnp.float32(lr_b)

    cfg_1dev = cfg.clone()
    cfg_1dev.PARALLEL.SHARD_OPT_STATE = False  # no mesh on one device
    step_1dev = make_train_step(spec, cfg_1dev, num_classes)
    b1 = _device_batch(raw, accum=2)
    _, _, _, loss_ref, _, _ = step_1dev(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, bn_state),
        adam_init(params), b1, la, lb, group_trees)

    mesh = create_mesh(num_data=4, num_model=2)
    step_sp = make_train_step(spec, cfg, num_classes, mesh=mesh)
    with mesh:
        p8 = shard_params(jax.tree.map(jnp.copy, params), mesh)
        b8 = _device_batch(raw, mesh, accum=2)
        _, _, _, loss_sp, _, _ = step_sp(
            p8, jax.tree.map(jnp.copy, bn_state), adam_init(p8), b8,
            la, lb, group_trees)

    assert np.isfinite(float(loss_ref))
    np.testing.assert_allclose(float(loss_ref), float(loss_sp), rtol=1e-4)
