"""Pipeline-parallelism tests on the 8-device virtual CPU mesh.

The GPipe schedule (`signal_tpu/parallel/pipeline.py`) must be
numerically invisible: per-sample ops only, so microbatch slicing and
stage hopping cannot change any sample's math vs the plain lax.scan.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from signal_tpu.config import Config

requires_8_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def _tiny_blocks(key, layers=4, width=64):
    from signal_tpu.ops.attention import init_layer_norm, init_mha

    ks = jax.random.split(key, layers)

    def one(k):
        k1, k2 = jax.random.split(k)
        return {
            "ln_1": init_layer_norm(width),
            "attn": init_mha(k1, width),
            "ln_2": init_layer_norm(width),
            "mlp": {
                "fc_kernel": 0.02 * jax.random.normal(k2, (width, 4 * width)),
                "fc_bias": jnp.zeros((4 * width,)),
                "proj_kernel": 0.02 * jax.random.normal(k2, (4 * width, width)),
                "proj_bias": jnp.zeros((width,)),
            },
        }

    return jax.tree.map(lambda *xs: jnp.stack(xs), *[one(k) for k in ks])


@requires_8_devices
@pytest.mark.parametrize("microbatches", [2, 4])
def test_pipeline_blocks_matches_scan(microbatches):
    """pipeline_blocks == lax.scan over the same stacked blocks, and the
    gradients w.r.t. the block weights agree."""
    from functools import partial

    from signal_tpu.models.vit import _block
    from signal_tpu.parallel.mesh import create_mesh
    from signal_tpu.parallel.pipeline import pipeline_blocks

    blocks = _tiny_blocks(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 9, 64))
    block_fn = partial(_block, num_heads=4, compute_dtype=jnp.float32,
                       use_flash=False)

    def ref_fn(b, h):
        def body(c, lp):
            return block_fn(lp, c), None
        return jax.lax.scan(body, h, b)[0]

    ref = ref_fn(blocks, x)
    mesh = create_mesh(num_data=2, num_model=1, num_pipe=2,
                       devices=jax.devices()[:4])
    out = pipeline_blocks(blocks, x, block_fn, mesh=mesh,
                          microbatches=microbatches)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # gradient equality (AD transposes the ppermute pipeline correctly)
    tgt = jax.random.normal(jax.random.PRNGKey(2), ref.shape)
    g_ref = jax.grad(lambda b: jnp.sum(ref_fn(b, x) * tgt))(blocks)
    g_pp = jax.grad(lambda b: jnp.sum(
        pipeline_blocks(b, x, block_fn, mesh=mesh,
                        microbatches=microbatches) * tgt))(blocks)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@requires_8_devices
def test_pipeline_forward_matches_single_device():
    """Full Signal eval forward on a (data=2, pipe=2) mesh == unsharded."""
    from signal_tpu.models.signal_model import (
        ModelSpec, forward_eval, init_signal_params)
    from signal_tpu.parallel.mesh import (
        create_mesh, shard_batch, shard_params, use_mesh)

    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = False
    cfg.MODEL.TOPK = 4
    cfg.PARALLEL.MODEL_AXIS = 1
    cfg.PARALLEL.PIPE_AXIS = 2
    cfg.PARALLEL.PIPE_MICROBATCH = 4
    spec = ModelSpec.from_config(cfg, num_classes=8, camera_num=2)
    spec = dataclasses.replace(spec, layers=2, width=64, feat_dim=32,
                               num_heads=4, h=4, w=2, use_flash=False,
                               compute_dtype="float32")
    params, bn = init_signal_params(jax.random.PRNGKey(1), spec)
    rng = np.random.default_rng(1)
    imgs = {m: jnp.asarray(rng.standard_normal((8, 3, 64, 32)), jnp.float32)
            for m in ("RGB", "NI", "TI")}
    cam = jnp.asarray(rng.integers(0, 2, 8))

    # no pipe mesh active → spec.pipe_stages falls back to the plain scan
    ref = forward_eval(params, bn, imgs, cam, spec)

    mesh = create_mesh(num_data=2, num_model=1, num_pipe=2,
                       devices=jax.devices()[:4])
    fn = jax.jit(lambda p, s, x, c: forward_eval(p, s, x, c, spec))
    with mesh, use_mesh(mesh):
        p_pp = shard_params(params, mesh)
        sharded = shard_batch({"imgs": imgs, "camids": cam}, mesh)
        out = fn(p_pp, bn, sharded["imgs"], sharded["camids"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


@requires_8_devices
def test_pipeline_train_step_matches_single_device():
    """Train step (fwd+bwd+Adam) under dp×pp == the single-device step."""
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
    cfg.PARALLEL.PIPE_AXIS = 2
    num_classes = 8
    spec = ModelSpec.from_config(cfg, num_classes=num_classes, camera_num=2)
    spec = dataclasses.replace(spec, layers=2, width=64, feat_dim=32,
                               num_heads=4, h=4, w=4, topk=4, use_flash=False,
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

    mesh = create_mesh(num_data=4, num_model=1, num_pipe=2)
    step_pp = make_train_step(spec, cfg, num_classes, mesh=mesh)
    with mesh:
        p8 = shard_params(jax.tree.map(jnp.copy, params), mesh)
        b8 = shard_batch(batch, mesh)
        p_pp, _, _, loss_pp, acc_pp, _ = step_pp(
            p8, jax.tree.map(jnp.copy, bn_state), adam_init(p8), b8,
            la, lb, group_trees)

    assert np.isfinite(float(loss_ref))
    np.testing.assert_allclose(float(loss_ref), float(loss_pp), rtol=1e-4)
    np.testing.assert_allclose(float(acc_ref), float(acc_pp), rtol=1e-6)
    moved = 0
    for a, b, orig in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_pp),
                          jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-3)
        moved += int(not np.allclose(np.asarray(a), np.asarray(orig)))
    assert moved > 0, "no parameter moved after the step"


@requires_8_devices
def test_pipeline_rejects_bad_shapes():
    from functools import partial

    from signal_tpu.models.vit import _block
    from signal_tpu.parallel.mesh import create_mesh
    from signal_tpu.parallel.pipeline import pipeline_blocks

    blocks = _tiny_blocks(jax.random.PRNGKey(0), layers=3)
    x = jnp.zeros((8, 9, 64))
    block_fn = partial(_block, num_heads=4, compute_dtype=jnp.float32,
                       use_flash=False)
    mesh = create_mesh(num_data=2, num_model=1, num_pipe=2,
                       devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="divide the block count"):
        pipeline_blocks(blocks, x, block_fn, mesh=mesh)
    blocks4 = _tiny_blocks(jax.random.PRNGKey(0), layers=4)
    with pytest.raises(ValueError, match="PIPE_MICROBATCH"):
        pipeline_blocks(blocks4, x, block_fn, mesh=mesh, microbatches=3)


def test_tp_pp_mutually_exclusive():
    from signal_tpu.parallel.mesh import create_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    with pytest.raises(AssertionError, match="mutually exclusive"):
        create_mesh(num_data=2, num_model=2, num_pipe=2)


def test_pipe_requires_clip_backbone():
    from signal_tpu.models.signal_model import ModelSpec

    cfg = Config()
    cfg.MODEL.TRANSFORMER_TYPE = "vit_base_patch16_224"
    cfg.PARALLEL.PIPE_AXIS = 2
    with pytest.raises(ValueError, match="CLIP ViT"):
        ModelSpec.from_config(cfg, num_classes=4, camera_num=2)
