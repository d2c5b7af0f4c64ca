"""MODEL.FROZEN → LoRA fine-tuning path.

Reference semantics (`modeling/meta_arch.py:66-78`, `modeling/clip/
LoRA.py:307-343` in maxingan2412/Signal): FROZEN=True freezes every
backbone parameter and trains only the low-rank adapters (plus everything
outside the backbone: heads, SIM, AlignM, SIE embeddings). Here the
adapters are a parallel factor tree at ``params['lora']`` merged into the
base weights inside ``_encode``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signal_tpu.config import Config
from signal_tpu.models.lora import apply_lora
from signal_tpu.models.signal_model import ModelSpec, init_signal_params


def _tiny_cfg(frozen: bool) -> Config:
    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = False
    cfg.MODEL.TOPK = 4
    cfg.MODEL.FROZEN = frozen
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.IMS_PER_BATCH = 4
    return cfg


def _tiny_spec(cfg, num_classes=4):
    spec = ModelSpec.from_config(cfg, num_classes=num_classes, camera_num=2)
    return dataclasses.replace(spec, layers=2, width=64, feat_dim=32,
                               num_heads=4, h=4, w=4, topk=4, use_flash=False,
                               compute_dtype="float32", lora_rank=2)


def _leaves_with_paths(tree, path=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaves_with_paths(v, f"{path}.{k}" if path else k)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _leaves_with_paths(v, f"{path}.{i}")
    elif tree is not None:
        yield path, tree


def test_frozen_creates_lora_leaves_and_unfrozen_does_not():
    cfg = _tiny_cfg(frozen=True)
    params, _ = init_signal_params(jax.random.PRNGKey(0), _tiny_spec(cfg))
    assert "lora" in params
    paths = [p for p, _ in _leaves_with_paths(params["lora"])]
    assert any(p.endswith("lora_A") for p in paths)
    assert any(p.endswith("lora_B") for p in paths)
    # factors exist for the attention and MLP kernels of the tower
    assert any("qkv_kernel" in p for p in paths)
    assert any("fc_kernel" in p for p in paths)

    cfg2 = _tiny_cfg(frozen=False)
    params2, _ = init_signal_params(jax.random.PRNGKey(0), _tiny_spec(cfg2))
    assert "lora" not in params2


def test_frozen_step_trains_only_lora_and_heads():
    """One FROZEN train step: base leaves bit-identical, some lora_B leaf
    moves (B starts at zero so the merged weights start == base), and the
    merged encoder weights shift."""
    from signal_tpu.engine.train import make_train_step
    from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs

    cfg = _tiny_cfg(frozen=True)
    num_classes = 4
    spec = _tiny_spec(cfg, num_classes)
    params, bn_state = init_signal_params(jax.random.PRNGKey(0), spec)
    before = jax.tree.map(jnp.copy, params)

    group_trees = build_param_groups(params, cfg)
    train_step = make_train_step(spec, cfg, num_classes)

    B = 4
    rng = np.random.default_rng(0)
    batch = {
        "imgs": {m: jnp.asarray(rng.standard_normal((B, 3, 64, 64)), jnp.float32)
                 for m in ("RGB", "NI", "TI")},
        "pids": jnp.asarray(rng.integers(0, num_classes, B)),
        "camids": jnp.asarray(rng.integers(0, 2, B)),
    }
    lr_a, lr_b = schedule_coeffs(cfg, 1)
    new_params, _, _, loss, _, _ = train_step(
        params, bn_state, adam_init(before), batch,
        jnp.float32(lr_a), jnp.float32(lr_b), group_trees)
    assert np.isfinite(float(loss))

    # backbone frozen bit-exactly
    for path, leaf in _leaves_with_paths(new_params["base"], "base"):
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(_get(before, path)),
            err_msg=f"frozen base leaf moved: {path}")

    # at least one lora_B moved (grad wrt B = scale·Aᵀ·dL/dW ≠ 0)
    moved = [p for p, leaf in _leaves_with_paths(new_params["lora"], "lora")
             if p.endswith("lora_B")
             and not np.array_equal(np.asarray(leaf), np.asarray(_get(before, p)))]
    assert moved, "no lora_B factor was updated"
    # lora_scale (alpha/r constant) must not move
    for p, leaf in _leaves_with_paths(new_params["lora"], "lora"):
        if p.endswith("lora_scale"):
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(_get(before, p)))

    # heads still train under FROZEN (reference: only self.base is frozen)
    cls_moved = not np.array_equal(
        np.asarray(new_params["classifier"]["kernel"]),
        np.asarray(before["classifier"]["kernel"]))
    assert cls_moved

    # the merged forward shifts: W + A·B·scale differs once B ≠ 0
    merged_before = apply_lora(before["base"], before["lora"])
    merged_after = apply_lora(new_params["base"], new_params["lora"])
    diffs = [not np.allclose(np.asarray(a), np.asarray(b))
             for (_, a), (_, b) in zip(_leaves_with_paths(merged_after),
                                       _leaves_with_paths(merged_before))]
    assert any(diffs), "LoRA update did not shift the merged weights"


def _get(tree, dotted):
    node = tree
    for part in dotted.split("."):
        node = node[int(part)] if isinstance(node, (list, tuple)) else node[part]
    return node


def test_lora_merge_is_identity_at_init():
    """B=0 at init ⇒ the FROZEN model's forward equals the plain model's."""
    from signal_tpu.models.signal_model import forward_eval

    cfg_f = _tiny_cfg(frozen=True)
    cfg_p = _tiny_cfg(frozen=False)
    spec_f, spec_p = _tiny_spec(cfg_f), _tiny_spec(cfg_p)
    params_f, bn_f = init_signal_params(jax.random.PRNGKey(0), spec_f)
    params_p, bn_p = init_signal_params(jax.random.PRNGKey(0), spec_p)

    B = 2
    rng = np.random.default_rng(1)
    imgs = {m: jnp.asarray(rng.standard_normal((B, 3, 64, 64)), jnp.float32)
            for m in ("RGB", "NI", "TI")}
    cam = jnp.zeros((B,), jnp.int32)
    out_f = forward_eval(params_f, bn_f, imgs, cam, spec_f)
    out_p = forward_eval(params_p, bn_p, imgs, cam, spec_p)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("backbone_cfg", ["vit_base_patch16_224"])
def test_frozen_imagenet_tower_also_gets_lora(backbone_cfg):
    cfg = _tiny_cfg(frozen=True)
    cfg.MODEL.TRANSFORMER_TYPE = backbone_cfg
    spec = _tiny_spec(cfg)
    params, _ = init_signal_params(jax.random.PRNGKey(0), spec)
    assert "lora" in params and params["lora"], "imagenet tower missing LoRA"
