"""MoE MLP (MODEL.MOE_EXPERTS) + expert parallelism tests.

The reference declares MODEL.MoE_Loss_weight without a consumer
(`config/defaults.py:28`); signal_tpu gives it one (`ops/moe.py`). These
tests pin: dispatch/combine algebra (identical experts == dense MLP),
capacity-drop semantics, the Switch aux-loss scale, engine integration
(the knob changes the loss), upcycled full-model parity, and EP-sharded
equality on the virtual mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signal_tpu.config import Config
from signal_tpu.ops.attention import linear, quick_gelu
from signal_tpu.ops.moe import (
    init_moe_params,
    moe_capacity,
    moe_mlp,
    upcycle_dense_mlp,
)

requires_8_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def _dense_mlp(mlp, x):
    h = quick_gelu(linear(mlp["fc_kernel"], mlp["fc_bias"], x, jnp.float32))
    return linear(mlp["proj_kernel"], mlp["proj_bias"], h, jnp.float32)


def _tiled_moe(key, dense, num_experts, width):
    p = upcycle_dense_mlp(dense, num_experts)
    p["router"] = 0.02 * jax.random.normal(key, (width, num_experts),
                                           jnp.float32)
    return p


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("top_k", [1, 2])
def test_identical_experts_match_dense(top_k, dtype):
    """With every expert a copy of the dense MLP and no capacity drops,
    routing is irrelevant: normalized gates sum to 1 and the MoE layer
    must reproduce the dense MLP exactly (this pins the one-hot
    dispatch/combine einsum algebra). Runs in BOTH compute dtypes — the
    shipping default is bf16 (`signal_model.py`), and the r04 regression
    (CPU DotThunk lacking bf16 dots) lived exactly in the dtype the
    tests skipped."""
    d, hidden, E = 32, 64, 4
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    dense = {
        "fc_kernel": jax.random.normal(k1, (d, hidden), jnp.float32) * 0.05,
        "fc_bias": jnp.zeros((hidden,)),
        "proj_kernel": jax.random.normal(k2, (hidden, d), jnp.float32) * 0.05,
        "proj_bias": jnp.zeros((d,)),
    }
    params = _tiled_moe(k3, dense, E, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 10, d), jnp.float32)
    # capacity_factor = E → C = k·L ≥ L: no expert can overflow
    y, aux = moe_mlp(params, x, top_k=top_k, capacity_factor=float(E),
                     compute_dtype=jnp.dtype(dtype))
    ref = _dense_mlp(dense, x)
    tol = dict(rtol=1e-5, atol=1e-5) if dtype == "float32" else \
        dict(rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), **tol)
    # near-uniform fresh router → aux ≈ 1 (E·Σf·P with P ≈ 1/E)
    assert 0.8 <= float(aux) <= float(E) + 1e-4


def test_k1_router_gets_task_gradient():
    """At the default MOE_TOPK=1 the combine weight is p/sg(p+eps)
    (straight-through normalization): forward must stay exactly 1 for
    the kept tokens (upcycle contract) while the ROUTER still receives a
    task-loss gradient — plain p/(p+eps) has ~zero derivative and the
    router could only learn from the aux loss (advisor r4 finding)."""
    d, hidden, E = 16, 32, 4
    params = init_moe_params(jax.random.PRNGKey(8), d, hidden, E)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, d), jnp.float32)

    def task_loss(p):
        y, _ = moe_mlp(p, x, top_k=1, capacity_factor=float(E),
                       compute_dtype=jnp.float32)
        return jnp.sum(y ** 2)

    g = jax.grad(task_loss)(params)
    assert float(jnp.linalg.norm(g["router"])) > 1e-6
    # experts obviously train too
    assert float(jnp.linalg.norm(g["fc_kernel"])) > 1e-6


def test_capacity_drop_zeroes_overflow_tokens():
    """Force every token to expert 0 with capacity for only the first
    C tokens per group: kept slots match the dense expert, dropped
    tokens output exactly zero (their residual rides through)."""
    d, hidden, E, L = 16, 32, 4, 12
    k1, _ = jax.random.split(jax.random.PRNGKey(2))
    dense = {
        "fc_kernel": jax.random.normal(k1, (d, hidden), jnp.float32) * 0.05,
        "fc_bias": jnp.zeros((hidden,)),
        "proj_kernel": jnp.eye(hidden, d, dtype=jnp.float32),
        "proj_bias": jnp.zeros((d,)),
    }
    params = upcycle_dense_mlp(dense, E)
    router = jnp.zeros((d, E), jnp.float32).at[:, 0].set(10.0)
    params["router"] = router
    cf = 1.0
    C = moe_capacity(L, E, 1, cf)  # = 3 — expert 0 keeps 3 of 12 tokens
    # all-positive inputs → logits[:, 0] = 10·Σx_d > 0 beats the other
    # experts' 0 for EVERY token (a constant router column alone doesn't:
    # the sign of Σx_d decides)
    x = 0.1 + jnp.abs(
        jax.random.normal(jax.random.PRNGKey(3), (2, L, d), jnp.float32))
    y, _ = moe_mlp(params, x, top_k=1, capacity_factor=cf,
                   compute_dtype=jnp.float32)
    ref = _dense_mlp(dense, x)
    np.testing.assert_allclose(np.asarray(y[:, :C]), np.asarray(ref[:, :C]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(y[:, C:]),
                                  np.zeros_like(np.asarray(y[:, C:])))


def test_aux_loss_scale():
    """Balanced router → aux = 1.0 exactly at its minimum shape; a
    fully-collapsed router (all mass on one expert) → aux ≈ E."""
    d, E, L = 16, 4, 8
    params = init_moe_params(jax.random.PRNGKey(4), d, 32, E)
    # all-positive tokens so a constant router column really collapses
    # the routing (logits col = w·Σx_d — the sign of Σx_d decides)
    x = 0.1 + jnp.abs(
        jax.random.normal(jax.random.PRNGKey(5), (2, L, d), jnp.float32))

    params_c = dict(params,
                    router=jnp.zeros((d, E)).at[:, 2].set(50.0))
    _, aux_c = moe_mlp(params_c, x, compute_dtype=jnp.float32)
    np.testing.assert_allclose(float(aux_c), float(E), rtol=1e-3)

    # fresh small-scale router: near-uniform probs → aux ≈ 1 (it can dip
    # slightly below 1 when the argmax fractions decorrelate from P)
    _, aux_u = moe_mlp(params, x, compute_dtype=jnp.float32)
    assert 0.8 <= float(aux_u) <= float(E) + 1e-4


def _moe_cfg(num_experts=4):
    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    cfg.MODEL.TOPK = 4
    cfg.MODEL.stageName = "together_CLS_Patch"
    cfg.MODEL.MOE_EXPERTS = num_experts
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.IMS_PER_BATCH = 8
    return cfg


def _tiny(spec, dtype="float32"):
    return dataclasses.replace(spec, layers=2, width=64, feat_dim=32,
                               num_heads=4, h=4, w=4, topk=4, use_flash=False,
                               compute_dtype=dtype)


def _tiny_batch(num_classes=8, B=8):
    rng = np.random.default_rng(7)
    return {
        "imgs": {m: jnp.asarray(rng.standard_normal((B, 3, 64, 64)),
                                jnp.float32) for m in ("RGB", "NI", "TI")},
        "pids": jnp.asarray(rng.integers(0, num_classes, B)),
        "camids": jnp.asarray(rng.integers(0, 2, B)),
    }


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_moe_loss_weight_is_consumed(dtype):
    """The reference's dormant MoE_Loss_weight knob must move the loss
    (aux >= 1 whenever MOE_EXPERTS > 1, so weights 0 vs 1 must differ).
    Parameterized over compute dtype: bf16 is the shipping default."""
    from signal_tpu.engine.train import make_train_step
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs

    num_classes = 8
    cfg = _moe_cfg()
    spec = _tiny(ModelSpec.from_config(cfg, num_classes, camera_num=2), dtype)
    assert spec.moe_experts == 4
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    assert "moe" in params["base"]["blocks"]
    assert "mlp" not in params["base"]["blocks"]
    gt = build_param_groups(params, cfg)
    batch = _tiny_batch(num_classes)
    lr_a, lr_b = schedule_coeffs(cfg, 1)

    losses = {}
    for w in (0.0, 1.0):
        cfg.MODEL.MoE_Loss_weight = w
        step = make_train_step(spec, cfg, num_classes)
        _, _, _, loss, _, _ = step(
            jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, bn),
            adam_init(params), batch, jnp.float32(lr_a), jnp.float32(lr_b), gt)
        losses[w] = float(loss)
    assert np.isfinite(losses[0.0]) and np.isfinite(losses[1.0])
    # the weight-1 loss carries the aux term (≈1 for a fresh router)
    assert losses[1.0] - losses[0.0] >= 0.5


def test_upcycled_moe_model_matches_dense_model():
    """Full-model check: a dense tower upcycled into E identical experts
    (router fresh, no-drop capacity) evaluates exactly like the dense
    tower — the integration contract of `clip_loader.load_clip_into_params`
    on an MoE spec."""
    from signal_tpu.models.signal_model import (
        ModelSpec, forward_eval, init_signal_params)
    from signal_tpu.ops.moe import upcycle_dense_mlp as up

    num_classes = 8
    dense_spec = _tiny(ModelSpec.from_config(_moe_cfg(0), num_classes,
                                             camera_num=2))
    moe_spec = dataclasses.replace(_tiny(ModelSpec.from_config(
        _moe_cfg(4), num_classes, camera_num=2)), moe_capacity=4.0)

    params, bn = init_signal_params(jax.random.PRNGKey(0), dense_spec)
    params_moe, bn_moe = init_signal_params(jax.random.PRNGKey(0), moe_spec)
    # same tree except mlp→moe: copy everything, upcycle the dense MLP
    blocks_d = params["base"]["blocks"]
    # up() tiles the [L, ...] stacks to [E, L, ...]; the blocks carry
    # [L, E, ...] (layer-major scan axis) — move the expert axis inside
    moe = jax.tree.map(lambda a: jnp.moveaxis(a, 0, 1),
                       up(blocks_d["mlp"], 4))
    moe["router"] = params_moe["base"]["blocks"]["moe"]["router"]
    p = jax.tree.map(jnp.copy, params)
    p["base"]["blocks"] = {k: v for k, v in blocks_d.items() if k != "mlp"}
    p["base"]["blocks"]["moe"] = moe
    for k in list(params_moe):
        if k != "base":
            p[k] = params_moe[k]  # heads init'd from the same key anyway

    batch = _tiny_batch(num_classes)
    ref = forward_eval(params, bn, batch["imgs"], batch["camids"], dense_spec)
    got = forward_eval(p, bn_moe, batch["imgs"], batch["camids"], moe_spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@requires_8_devices
def test_ep_sharded_train_step_matches_single_device():
    """Expert-parallel (experts over 'model', data over 'data') train
    step computes the same loss as the single-device step."""
    from signal_tpu.engine.train import make_train_step
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
    from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs

    num_classes = 8
    cfg = _moe_cfg(4)
    cfg.PARALLEL.MODEL_AXIS = 4
    spec = _tiny(ModelSpec.from_config(cfg, num_classes, camera_num=2))
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    gt = build_param_groups(params, cfg)
    batch = _tiny_batch(num_classes)
    lr_a, lr_b = schedule_coeffs(cfg, 1)

    step = make_train_step(spec, cfg, num_classes)
    _, _, _, loss_ref, acc_ref, _ = step(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, bn),
        adam_init(params), batch, jnp.float32(lr_a), jnp.float32(lr_b), gt)

    mesh = create_mesh(num_data=2, num_model=4)
    step_ep = make_train_step(spec, cfg, num_classes, mesh=mesh)
    with mesh:
        p_ep = shard_params(jax.tree.map(jnp.copy, params), mesh)
        # the expert axis of the [L, E, ...] stacks is sharded over 'model'
        fc = p_ep["base"]["blocks"]["moe"]["fc_kernel"]
        assert "model" in str(fc.sharding.spec)
        b_ep = shard_batch(batch, mesh)
        _, _, _, loss_ep, acc_ep, _ = step_ep(
            p_ep, jax.tree.map(jnp.copy, bn), adam_init(p_ep), b_ep,
            jnp.float32(lr_a), jnp.float32(lr_b), gt)

    np.testing.assert_allclose(float(loss_ref), float(loss_ep), rtol=1e-4)
    np.testing.assert_allclose(float(acc_ref), float(acc_ep), rtol=1e-6)


@requires_8_devices
def test_sp_ep_composed_train_step_matches_single_device():
    """SEQUENCE (Megatron-SP, tokens over 'model') composed with
    MOE_EXPERTS (experts over 'model') in the same tower: GSPMD reshards
    the residual stream token→expert layout around every MoE block. The
    composition is allowed (unlike PIPE/FROZEN/PROMPT) — this test pins
    that it stays numerically identical to the single-device step
    (advisor r4: the only risky composition without an equality test)."""
    from signal_tpu.engine.train import make_train_step
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
    from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs

    num_classes = 8
    cfg = _moe_cfg(4)
    cfg.PARALLEL.MODEL_AXIS = 4
    cfg.PARALLEL.SEQUENCE = True
    spec = _tiny(ModelSpec.from_config(cfg, num_classes, camera_num=2))
    assert spec.sequence_parallel and spec.moe_experts == 4
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    gt = build_param_groups(params, cfg)
    batch = _tiny_batch(num_classes)
    lr_a, lr_b = schedule_coeffs(cfg, 1)

    step = make_train_step(spec, cfg, num_classes)
    _, _, _, loss_ref, acc_ref, _ = step(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, bn),
        adam_init(params), batch, jnp.float32(lr_a), jnp.float32(lr_b), gt)

    mesh = create_mesh(num_data=2, num_model=4)
    step_sp_ep = make_train_step(spec, cfg, num_classes, mesh=mesh)
    with mesh:
        p = shard_params(jax.tree.map(jnp.copy, params), mesh)
        b = shard_batch(batch, mesh)
        _, _, _, loss, acc, _ = step_sp_ep(
            p, jax.tree.map(jnp.copy, bn), adam_init(p), b,
            jnp.float32(lr_a), jnp.float32(lr_b), gt)

    np.testing.assert_allclose(float(loss_ref), float(loss), rtol=1e-4)
    np.testing.assert_allclose(float(acc_ref), float(acc), rtol=1e-6)


def test_moe_config_validation():
    cfg = _moe_cfg(4)
    cfg.PARALLEL.PIPE_AXIS = 2
    from signal_tpu.models.signal_model import ModelSpec

    with pytest.raises(ValueError, match="PIPE_AXIS"):
        ModelSpec.from_config(cfg, 8, camera_num=2)

    cfg = _moe_cfg(3)
    cfg.PARALLEL.MODEL_AXIS = 2
    with pytest.raises(ValueError, match="divisible"):
        ModelSpec.from_config(cfg, 8, camera_num=2)

    cfg = _moe_cfg(4)
    cfg.MODEL.FROZEN = True
    with pytest.raises(ValueError, match="FROZEN"):
        ModelSpec.from_config(cfg, 8, camera_num=2)

    cfg = _moe_cfg(4)
    cfg.MODEL.TRANSFORMER_TYPE = "resnet50"
    with pytest.raises(ValueError, match="CLIP ViT"):
        ModelSpec.from_config(cfg, 8, camera_num=2)
