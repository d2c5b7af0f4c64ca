"""ZeRO-1 optimizer-state sharding (PARALLEL.SHARD_OPT_STATE)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from signal_tpu.config import Config

requires_8_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def _setup(optimizer="Adam"):
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.solver import build_param_groups, schedule_coeffs

    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = False
    cfg.MODEL.TOPK = 4
    cfg.MODEL.stageName = "together_CLS_Patch"
    cfg.SOLVER.OPTIMIZER_NAME = optimizer
    cfg.SOLVER.IMS_PER_BATCH = 8
    num_classes = 8
    spec = ModelSpec.from_config(cfg, num_classes=num_classes, camera_num=2)
    spec = dataclasses.replace(spec, layers=2, width=64, feat_dim=32,
                               num_heads=4, h=4, w=2, topk=4, use_flash=False,
                               compute_dtype="float32")
    params, bn = init_signal_params(jax.random.PRNGKey(4), spec)
    group_trees = build_param_groups(params, cfg)
    rng = np.random.default_rng(4)
    B = 8
    batch = {
        "imgs": {m: jnp.asarray(rng.standard_normal((B, 3, 64, 32)), jnp.float32)
                 for m in ("RGB", "NI", "TI")},
        "pids": jnp.asarray(rng.integers(0, num_classes, B)),
        "camids": jnp.asarray(rng.integers(0, 2, B)),
    }
    lr_a, lr_b = schedule_coeffs(cfg, 1)
    return cfg, spec, params, bn, group_trees, batch, num_classes, lr_a, lr_b


def test_zero1_shardings_widen_with_data_axis():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    from signal_tpu.parallel.mesh import create_mesh, zero1_shardings

    mesh = create_mesh(num_data=4, num_model=2)
    params = {
        "w": jnp.zeros((13, 768, 768)),   # 13 % 4 != 0 → widen on axis 1
        "b": jnp.zeros((3,)),             # nothing divides → replicated
        "k": jnp.zeros((8, 5)),           # axis 0 divides
    }
    z = zero1_shardings(params, mesh)
    assert tuple(z["w"].spec)[:2] == (None, "data")
    assert all(s is None for s in tuple(z["b"].spec))
    assert tuple(z["k"].spec)[0] == "data"


@requires_8_devices
@pytest.mark.parametrize("optimizer", ["Adam", "SGD"])
def test_zero1_step_matches_replicated(optimizer):
    """Sharded-moment step == replicated step (loss and updated params),
    and the moments really are partitioned over 'data'."""
    from signal_tpu.engine.train import make_train_step
    from signal_tpu.parallel.mesh import (
        create_mesh, shard_batch, shard_params, zero1_shardings)
    from signal_tpu.solver import adam_init

    (cfg, spec, params, bn, group_trees, batch, num_classes,
     lr_a, lr_b) = _setup(optimizer)
    la, lb = jnp.float32(lr_a), jnp.float32(lr_b)
    use_sgd = optimizer == "SGD"

    def fresh_opt(p):
        return (jax.tree.map(lambda x: jnp.zeros_like(x, jnp.float32), p)
                if use_sgd else adam_init(p))

    step_ref = make_train_step(spec, cfg, num_classes)
    p_ref, _, _, loss_ref, _, _ = step_ref(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, bn),
        fresh_opt(params), batch, la, lb, group_trees)

    cfg_z = cfg.clone()
    cfg_z.PARALLEL.SHARD_OPT_STATE = True
    mesh = create_mesh(num_data=8, num_model=1)
    step_z = make_train_step(spec, cfg_z, num_classes, mesh=mesh)
    with mesh:
        p8 = shard_params(jax.tree.map(jnp.copy, params), mesh)
        z = zero1_shardings(p8, mesh)
        opt0 = fresh_opt(p8)
        if use_sgd:
            opt0 = jax.tree.map(jax.device_put, opt0, z)
        else:
            opt0 = opt0._replace(mu=jax.tree.map(jax.device_put, opt0.mu, z),
                                 nu=jax.tree.map(jax.device_put, opt0.nu, z))
        b8 = shard_batch(batch, mesh)
        p_z, _, opt_z, loss_z, _, _ = step_z(
            p8, jax.tree.map(jnp.copy, bn), opt0, b8, la, lb, group_trees)

    np.testing.assert_allclose(float(loss_ref), float(loss_z), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_z)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-3)
    # the moments must come back still sharded (per-device shard smaller
    # than the global array) — params replicated
    moments = opt_z if use_sgd else opt_z.mu
    sharded = [lf for lf in jax.tree.leaves(moments)
               if lf.ndim and lf.addressable_shards[0].data.shape != lf.shape]
    assert sharded, "no moment leaf is partitioned over 'data'"
    for lf in jax.tree.leaves(p_z):
        assert lf.addressable_shards[0].data.shape == lf.shape
