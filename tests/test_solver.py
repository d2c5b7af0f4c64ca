"""Solver tests: schedules vs the reference formulas, param-group rules,
Adam torch parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from signal_tpu.config import Config
from signal_tpu.solver import (
    adam_init,
    adam_update,
    build_param_groups,
    cosine_schedule_coeffs,
    multistep_schedule_coeffs,
    schedule_coeffs,
)

torch = pytest.importorskip("torch")


def test_cosine_schedule_matches_timm_formula():
    """Check against a direct transcription of timm's CosineLRScheduler
    (`solver/cosine_lr.py:67-94` with factory defaults)."""
    import math

    base_lr, epochs, warmup_t = 3.5e-4, 50, 10
    lr_min, warmup_lr_init = 0.001 * base_lr, 0.1 * base_lr
    for group_base in (base_lr, 5e-6, base_lr * 2):
        for t in range(0, epochs):
            a, b = cosine_schedule_coeffs(t, max_epochs=epochs, base_lr=base_lr,
                                          warmup_t=warmup_t, noise=False)
            ours = a + b * group_base
            if t < warmup_t:
                ref = warmup_lr_init + t * (group_base - warmup_lr_init) / warmup_t
            else:
                ref = lr_min + 0.5 * (group_base - lr_min) * (
                    1 + math.cos(math.pi * t / epochs))
            assert abs(ours - ref) < 1e-12, (group_base, t)


def test_cosine_noise_matches_torch_generator():
    """LR noise must reproduce the reference's torch.Generator draw
    (`solver/scheduler.py:93-104`)."""
    a, b = cosine_schedule_coeffs(20, max_epochs=50, base_lr=1e-3, warmup_t=0,
                                  noise=True, noise_seed=42)
    g = torch.Generator()
    g.manual_seed(42 + 20)
    while True:
        noise = torch.randn(1, generator=g).item()
        if abs(noise) < 0.67:
            break
    import math

    lr_min = 0.001 * 1e-3
    c = 0.5 * (1 + math.cos(math.pi * 20 / 50))
    expected = (lr_min * (1 - c) + c * 1e-3) * (1 + noise)
    assert abs((a + b * 1e-3) - expected) < 1e-12


def test_multistep_schedule():
    kw = dict(steps=(20, 40), gamma=0.1, warmup_factor=0.01, warmup_iters=0)
    for t, mult in ((0, 1.0), (19, 1.0), (20, 0.1), (39, 0.1), (40, 0.01)):
        a, b = multistep_schedule_coeffs(t, **kw)
        assert a == 0.0 and abs(b - mult) < 1e-12


def test_param_group_rules():
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    import dataclasses

    cfg = Config()
    cfg.MODEL.TRANSFORMER_TYPE = "ViT-B-16"
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    spec = ModelSpec.from_config(cfg, num_classes=4, camera_num=2)
    spec = dataclasses.replace(spec, layers=2, width=32, feat_dim=16,
                               num_heads=4, h=4, w=2, topk=2)
    params, _ = init_signal_params(jax.random.PRNGKey(0), spec)
    lr_tree, wd_tree, tr_tree = build_param_groups(params, cfg)

    # CLIP backbone pinned to 5e-6 (`make_optimizer.py:15-19`)
    assert lr_tree["base"]["proj"] == 5e-6
    assert lr_tree["base"]["blocks"]["attn"]["qkv_kernel"] == 5e-6
    # bias gets ×BIAS_LR_FACTOR outside base
    assert lr_tree["SIM"]["select"]["W_q"]["bias"] == 1e-3 * cfg.SOLVER.BIAS_LR_FACTOR
    # BNNeck bias frozen
    assert tr_tree["bottleneck"]["bias"] is False
    assert tr_tree["bottleneck"]["scale"] is True
    # unused W_v frozen
    assert tr_tree["SIM"]["select"]["W_v"]["kernel"] is False

    # MSVR310 classifier ×100 (`make_optimizer.py:26-29`)
    cfg2 = Config()
    cfg2.DATASETS.NAMES = "MSVR310"
    cfg2.SOLVER.BASE_LR = 5e-6
    lr2, wd2, _ = build_param_groups(params, cfg2)
    assert abs(lr2["classifier"]["kernel"] - 5e-6 * 100) < 1e-12
    assert wd2["classifier"]["kernel"] == cfg2.SOLVER.WEIGHT_DECAY_BIAS


def test_frozen_backbone_rule():
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    import dataclasses

    cfg = Config()
    cfg.MODEL.FROZEN = True
    spec = ModelSpec.from_config(cfg, num_classes=4, camera_num=2)
    spec = dataclasses.replace(spec, layers=2, width=32, feat_dim=16,
                               num_heads=4, h=4, w=2, topk=2)
    params, _ = init_signal_params(jax.random.PRNGKey(0), spec)
    _, _, tr = build_param_groups(params, cfg)
    assert tr["base"]["proj"] is False
    assert tr["classifier"]["kernel"] is True


def test_adam_matches_torch():
    """Two steps of our Adam vs torch.optim.Adam (L2 weight decay)."""
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    lr, wd = 1e-3, 1e-4

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([{"params": [tw], "lr": lr, "weight_decay": wd}])

    params = {"w": jnp.asarray(w0)}
    state = adam_init(params)
    trees = ({"w": lr}, {"w": wd}, {"w": True})

    for step in range(2):
        g = rng.standard_normal((4, 3)).astype(np.float32)
        opt.zero_grad()
        tw.grad = torch.tensor(g.copy())
        opt.step()
        params, state = adam_update(
            {"w": jnp.asarray(g)}, state, params,
            base_lr_tree=trees[0], wd_tree=trees[1], trainable_tree=trees[2],
            lr_a=jnp.float32(0.0), lr_b=jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_adam_respects_frozen_mask():
    params = {"w": jnp.ones((2, 2)), "frozen": jnp.ones((2, 2))}
    state = adam_init(params)
    grads = {"w": jnp.ones((2, 2)), "frozen": jnp.ones((2, 2))}
    trees = ({"w": 1.0, "frozen": 1.0}, {"w": 0.0, "frozen": 0.0},
             {"w": True, "frozen": False})
    new_params, _ = adam_update(grads, state, params,
                                base_lr_tree=trees[0], wd_tree=trees[1],
                                trainable_tree=trees[2],
                                lr_a=jnp.float32(0.0), lr_b=jnp.float32(1.0))
    assert not np.allclose(np.asarray(new_params["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(new_params["frozen"]), 1.0)


def test_adamw_matches_torch():
    """Two steps of our decoupled-decay mode vs torch.optim.AdamW."""
    rng = np.random.default_rng(4)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    lr, wd = 1e-3, 1e-2

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.AdamW([{"params": [tw], "lr": lr, "weight_decay": wd}])

    params = {"w": jnp.asarray(w0)}
    state = adam_init(params)
    trees = ({"w": lr}, {"w": wd}, {"w": True})

    for step in range(2):
        g = rng.standard_normal((4, 3)).astype(np.float32)
        opt.zero_grad()
        tw.grad = torch.tensor(g.copy())
        opt.step()
        params, state = adam_update(
            {"w": jnp.asarray(g)}, state, params,
            base_lr_tree=trees[0], wd_tree=trees[1], trainable_tree=trees[2],
            lr_a=jnp.float32(0.0), lr_b=jnp.float32(1.0), decoupled_wd=True)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
