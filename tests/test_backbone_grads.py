"""One real train step through EVERY backbone family.

Regression guard for the class of bug found on the resnet trunk (a
forward that works but whose backward dies in a grad rule): each
backbone must produce a finite loss AND move its base parameters."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signal_tpu.config import Config
from signal_tpu.engine.train import make_train_step
from signal_tpu.models.signal_model import ModelSpec, init_signal_params
from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs

VARIANTS = [
    ("ViT-B-16", {}),                       # CLIP tower
    ("ViT-B-16", {"ADAPTER": True}),        # MambaPro adapter branch
    ("ViT-B-16", {"PROMPT": True}),         # MambaPro prompt branch
    ("vit_base_patch16_224", {}),           # imagenet ViT
    ("deit_small_patch16_224", {}),
    ("vit_small_patch16_224", {}),
    ("t2t_vit_t_14", {}),
    ("resnet101", {}),
]


@pytest.mark.parametrize("ttype,extra", VARIANTS,
                         ids=[f"{t}{'-' + next(iter(e)) if e else ''}"
                              for t, e in VARIANTS])
def test_one_train_step_moves_base(ttype, extra):
    cfg = Config()
    cfg.MODEL.TRANSFORMER_TYPE = ttype
    cfg.MODEL.USE_A = False
    cfg.MODEL.USE_B = False
    cfg.INPUT.SIZE_TRAIN = (64, 64)
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.IMS_PER_BATCH = 4
    for k, v in extra.items():
        setattr(cfg.MODEL, k, v)
    num_classes = 4
    spec = ModelSpec.from_config(cfg, num_classes=num_classes, camera_num=2)
    if spec.backbone != "resnet":  # shrink tower depth for speed
        spec = dataclasses.replace(spec, layers=2, use_flash=False)

    key = jax.random.PRNGKey(0)
    params, bn_state = init_signal_params(key, spec)
    group_trees = build_param_groups(params, cfg)
    opt_state = adam_init(params)
    step = make_train_step(spec, cfg, num_classes)

    rng = np.random.default_rng(0)
    B = cfg.SOLVER.IMS_PER_BATCH
    batch = {
        "imgs": {m: jnp.asarray(rng.standard_normal((B, 3, 64, 64)),
                                jnp.float32) for m in ("RGB", "NI", "TI")},
        "pids": jnp.asarray(rng.integers(0, num_classes, B)),
        "camids": jnp.asarray(rng.integers(0, 2, B)),
    }
    lr_a, lr_b = schedule_coeffs(cfg, 1)
    step_rng = jax.random.PRNGKey(1)
    before = jax.tree.leaves(params["base"])[0].copy()
    new_params, _, _, loss, acc, _ = step(
        params, bn_state, opt_state, batch,
        jnp.float32(lr_a), jnp.float32(lr_b), group_trees, step_rng)
    assert np.isfinite(float(loss))
    after = jax.tree.leaves(new_params["base"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after)), \
        "base params did not move — backward through the trunk is broken"
