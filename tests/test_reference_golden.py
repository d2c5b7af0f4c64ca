"""Composed full-model golden parity: the ACTUAL reference ``Signal``
module (`/root/reference/modeling/make_model.py:22-290`), built on CPU
torch at the RGBNT201 flagship config (ViT-B-16 CLIP tower, DIRECT=1,
USE_A+USE_B, SIE camera), with weights copied from the JAX pytree via the
existing exporter — then one eval forward and one train forward compared
head-for-head.

The module-level parity suite (test_reference_parity_import.py) checks
SIM/GAM/LAM/triplet in isolation; THIS file checks the composition the
pieces never see together: BNNeck wiring, head order, the
``[ori, vars_total]`` concat order, and SIE application inside the tower
(`modeling/meta_arch.py:96-112`). If any of those drift, the end-to-end
features diverge even though every module test stays green.

The reference build chain needs timm/fvcore/a pretrained ``ViT-B-16.pt``
none of which exist here, so the fixture stubs exactly those seams:
- ``timm``/``fvcore`` → minimal attribute stubs (trunc_normal_, DropPath
  as identity — every config in play has drop_path_rate 0)
- ``modeling.make_model_clipreid.load_clip_to_cpu`` → the reference's own
  ``clip.build_model`` (`modeling/clip/model.py:651`) fed a FABRICATED
  random fp32 ViT-B/16 state dict (the real file is 1.7 GB; parity only
  needs both sides to hold the same numbers)
- ``nn.Module.to('cuda')`` → no-op (meta_arch hard-codes `.to("cuda")`)

Everything else — VisionTransformer, SIE lookup, SIM, AlignM, BNNecks,
classifiers, the full forward — is the reference's own code.
"""

import dataclasses
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not present")

B, NUM_CLASSES, CAM_NUM = 8, 8, 4


def _rand(rng, *shape):
    return torch.tensor(rng.standard_normal(shape).astype(np.float32) * 0.02)


def _fake_full_clip_sd(rng):
    """A complete OpenAI-CLIP state dict at ViT-B/16 vision dims (random
    weights). The text tower is shrunk to 1 layer / width 64 — `Signal`
    keeps only ``clip_model.visual`` (`modeling/meta_arch.py:77`), so the
    text side only has to satisfy `build_model`'s dim probing."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _fabricate import fake_clip_visual_sd

    sd = fake_clip_visual_sd(rng, width=768, layers=12, out=512, grid=14)
    tw, tl = 64, 1
    sd["text_projection"] = _rand(rng, tw, 512)   # embed_dim ← shape[1]
    sd["positional_embedding"] = _rand(rng, 77, tw)
    sd["token_embedding.weight"] = _rand(rng, 512, tw)
    sd["ln_final.weight"] = torch.ones(tw)
    sd["ln_final.bias"] = torch.zeros(tw)
    sd["logit_scale"] = torch.tensor(4.6)
    for i in range(tl):
        pre = f"transformer.resblocks.{i}"
        sd.update({
            f"{pre}.ln_1.weight": torch.ones(tw),
            f"{pre}.ln_1.bias": torch.zeros(tw),
            f"{pre}.attn.in_proj_weight": _rand(rng, 3 * tw, tw),
            f"{pre}.attn.in_proj_bias": torch.zeros(3 * tw),
            f"{pre}.attn.out_proj.weight": _rand(rng, tw, tw),
            f"{pre}.attn.out_proj.bias": torch.zeros(tw),
            f"{pre}.ln_2.weight": torch.ones(tw),
            f"{pre}.ln_2.bias": torch.zeros(tw),
            f"{pre}.mlp.c_fc.weight": _rand(rng, 4 * tw, tw),
            f"{pre}.mlp.c_fc.bias": torch.zeros(4 * tw),
            f"{pre}.mlp.c_proj.weight": _rand(rng, tw, 4 * tw),
            f"{pre}.mlp.c_proj.bias": torch.zeros(tw),
        })
    return sd


@pytest.fixture(scope="module")
def ref_make_model():
    """Import the reference `modeling.make_model` with its unavailable
    dependencies stubbed (see module docstring). Yields the module;
    restores `nn.Module.to` on teardown."""
    import importlib.util

    import torch.nn as nn

    for pkg, sub in (("modeling", "modeling"),
                     ("modeling.backbones", "modeling/backbones"),
                     ("modeling.backbones.basic_cnn_params",
                      "modeling/backbones/basic_cnn_params"),
                     ("modeling.AddModule", "modeling/AddModule"),
                     ("modeling.clip", "modeling/clip"),
                     ("utils", "utils"), ("layers", "layers")):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [os.path.join(REFERENCE, sub)]
            sys.modules[pkg] = m

    class _DropPath(nn.Module):  # identity: drop_path_rate is 0 throughout
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def _to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    stubs = {}
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers_m = types.ModuleType("timm.models.layers")
        layers_m.trunc_normal_ = nn.init.trunc_normal_
        layers_m.DropPath = _DropPath
        layers_m.to_2tuple = _to_2tuple
        helpers = types.ModuleType("timm.models.helpers")
        helpers.load_pretrained = lambda *a, **k: None
        registry = types.ModuleType("timm.models.registry")
        registry.register_model = lambda f: f
        stubs.update({"timm": timm, "timm.models": models,
                      "timm.models.layers": layers_m,
                      "timm.models.helpers": helpers,
                      "timm.models.registry": registry})
    if "fvcore" not in sys.modules:
        fv = types.ModuleType("fvcore")
        fvnn = types.ModuleType("fvcore.nn")
        fvnn.flop_count = lambda *a, **k: ({}, {})
        jh = types.ModuleType("fvcore.nn.jit_handles")
        jh.elementwise_flop_counter = lambda *a, **k: (lambda *a2, **k2: 0)
        stubs.update({"fvcore": fv, "fvcore.nn": fvnn,
                      "fvcore.nn.jit_handles": jh})
    sys.modules.update(stubs)

    def load(name, relpath):
        if name in sys.modules and hasattr(sys.modules[name], "__file__"):
            return sys.modules[name]
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REFERENCE, relpath))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    # dependency order: vit_pytorch (trunc_normal_ source for clip.model),
    # then clip.model, then the meta_arch/make_model chain
    load("modeling.backbones.vit_pytorch", "modeling/backbones/vit_pytorch.py")
    clip_model_mod = load("modeling.clip.model", "modeling/clip/model.py")
    load("modeling.clip.LoRA", "modeling/clip/LoRA.py")
    load("utils.volume", "utils/volume.py")

    # the seam: load_clip_to_cpu reads a 1.7 GB '../ViT-B-16.pt'
    # (`make_model_clipreid.py:177-197`); rebuild it on a fabricated sd
    sd = _fake_full_clip_sd(np.random.default_rng(7))

    clipreid = types.ModuleType("modeling.make_model_clipreid")

    def load_clip_to_cpu(cfg, backbone_name, h_resolution, w_resolution,
                         vision_stride_size):
        assert backbone_name == "ViT-B-16"
        return clip_model_mod.build_model(
            cfg, {k: v.clone() for k, v in sd.items()},
            h_resolution, w_resolution, vision_stride_size)

    clipreid.load_clip_to_cpu = load_clip_to_cpu
    sys.modules["modeling.make_model_clipreid"] = clipreid

    orig_to = nn.Module.to

    def _cpu_to(self, *args, **kwargs):
        if args and args[0] == "cuda":
            return self
        return orig_to(self, *args, **kwargs)

    nn.Module.to = _cpu_to
    try:
        mm = load("modeling.make_model", "modeling/make_model.py")
        yield mm, sd
    finally:
        nn.Module.to = orig_to


def _flagship_cfg():
    from signal_tpu.config import Config

    cfg = Config()
    cfg.MODEL.TRANSFORMER_TYPE = "ViT-B-16"
    cfg.MODEL.DIRECT = 1
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    cfg.MODEL.SIE_CAMERA = True
    cfg.MODEL.SIE_COE = 1.0
    cfg.MODEL.STRIDE_SIZE = (16, 16)
    cfg.MODEL.TOPK = 4
    cfg.INPUT.SIZE_TRAIN = (256, 128)
    cfg.INPUT.SIZE_TEST = (256, 128)
    return cfg


@pytest.fixture(scope="module")
def golden(ref_make_model, tmp_path_factory):
    """Both models at RGBNT201 flagship config holding identical weights.

    JAX side: random init + the fabricated CLIP tower loaded through
    `load_clip_into_params` (the production .pt path, including the
    torch-exact 14×14→16×8 pos-embed resize). Torch side: the reference
    `Signal` built through its own factory, then overwritten with
    `export_reference_signal_state_dict(params)` — so ANY wiring drift
    between exporter, reference naming, and either forward shows up."""
    import jax

    from signal_tpu.models.clip_loader import (
        export_reference_signal_state_dict, load_clip_into_params)
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params

    mm, sd = ref_make_model
    cfg = _flagship_cfg()

    spec = ModelSpec.from_config(cfg, num_classes=NUM_CLASSES,
                                 camera_num=CAM_NUM)
    # fp32 + exact attention: this test is about composition, not dtype
    spec = dataclasses.replace(spec, compute_dtype="float32",
                               use_flash=False, remat=False)
    params, bn_state = init_signal_params(jax.random.PRNGKey(0), spec)

    pt = tmp_path_factory.mktemp("clip") / "ViT-B-16.pt"
    torch.save({k: v.clone() for k, v in sd.items()}, str(pt))
    params = load_clip_into_params(params, str(pt), spec)

    ref = mm.Signal(NUM_CLASSES, cfg, camera_num=CAM_NUM, view_num=0,
                    factory={})
    exported = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in export_reference_signal_state_dict(
                    params, bn_state, spec).items()}
    result = ref.load_state_dict(exported, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    leftover = [k for k in result.missing_keys
                if "num_batches_tracked" not in k]
    assert not leftover, f"ref params the exporter missed: {leftover}"

    rng = np.random.default_rng(3)
    imgs = {m: rng.standard_normal((B, 3, 256, 128)).astype(np.float32)
            for m in ("RGB", "NI", "TI")}
    cams = rng.integers(0, CAM_NUM, B)
    return ref, spec, params, bn_state, imgs, cams


def test_eval_features_match_reference(golden):
    """Inference: ours [B, 3072] == reference `concat([ori, vars_total])`
    (`make_model.py:284-290`), SIE applied inside the tower."""
    import jax.numpy as jnp

    from signal_tpu.models.signal_model import forward_eval

    ref, spec, params, bn_state, imgs, cams = golden
    ref.eval()
    with torch.no_grad():
        got_ref = ref({m: torch.from_numpy(v) for m, v in imgs.items()},
                      cam_label=torch.from_numpy(cams), training=False)
    got = forward_eval(params, bn_state,
                       {m: jnp.asarray(v) for m, v in imgs.items()},
                       jnp.asarray(cams), spec)
    assert got.shape == (B, 6 * spec.feat_dim) == tuple(got_ref.shape)
    # tolerance: fp32 accumulation noise through 12 ViT layers (different
    # matmul orders) measures ≤3e-3 abs; a composition bug (concat order,
    # BNNeck placement, SIE wiring) would be O(1)
    np.testing.assert_allclose(np.asarray(got), got_ref.numpy(),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("stage", ["CLS", "together_CLS_Patch"])
def test_train_heads_match_reference(golden, stage):
    """Training: every sign=3 head — ori_score/ori (BNNeck+classifier on
    the 3-modality concat), vars_score/vars_total (SIM head), GAM scalar,
    and (stage=together) the LAM scalar — against the reference tuple
    (`make_model.py:228-235`). BN layers run in train mode on both sides,
    so batch-stat BNNeck wiring is covered too."""
    import jax.numpy as jnp

    from signal_tpu.models.signal_model import forward_train

    ref, spec, params, bn_state, imgs, cams = golden
    spec = dataclasses.replace(spec, stage=stage)
    ref.train()
    with torch.no_grad():
        got_ref = ref({m: torch.from_numpy(v) for m, v in imgs.items()},
                      cam_label=torch.from_numpy(cams), training=True,
                      sge=stage)
    out, _ = forward_train(params, bn_state,
                           {m: jnp.asarray(v) for m, v in imgs.items()},
                           jnp.asarray(cams), spec)

    assert got_ref[0] == 3  # sign: direct + USE_A + USE_B
    sign, ori_score, ori, vars_score, vars_total, *rest = got_ref
    pairs = [
        ("ori_score", out["scores"][0], ori_score),
        ("ori", out["feats"][0], ori),
        ("vars_score", out["scores"][1], vars_score),
        ("vars_total", out["feats"][1], vars_total),
        ("gam", out["gam"], rest[0]),
    ]
    if stage == "together_CLS_Patch":
        pairs.append(("lam", out["lam"], rest[1]))
    else:
        assert len(rest) == 1 and out["lam"] is None
    for name, mine, theirs in pairs:
        np.testing.assert_allclose(
            np.asarray(mine), theirs.detach().numpy(),
            rtol=5e-3, atol=5e-3,
            err_msg=f"train head {name!r} diverged from the reference")


def test_reference_checkpoint_roundtrip_full_model(golden, tmp_path):
    """torch.save(ref.state_dict()) → `load_reference_signal_checkpoint`
    → identical eval features: the .pth import path (TEST.WEIGHT) is the
    exporter's exact inverse at flagship scale, not just tiny dims."""
    import jax
    import jax.numpy as jnp

    from signal_tpu.models.clip_loader import load_reference_signal_checkpoint
    from signal_tpu.models.signal_model import forward_eval, init_signal_params

    ref, spec, params, bn_state, imgs, cams = golden
    path = str(tmp_path / "signal_best.pth")
    torch.save(ref.state_dict(), path)
    params2, bn2 = init_signal_params(jax.random.PRNGKey(1), spec)
    params2, bn2 = load_reference_signal_checkpoint(params2, bn2, path, spec)

    j = {m: jnp.asarray(v) for m, v in imgs.items()}
    a = forward_eval(params, bn_state, j, jnp.asarray(cams), spec)
    b = forward_eval(params2, bn2, j, jnp.asarray(cams), spec)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_direct0_train_heads_match_reference(ref_make_model, tmp_path):
    """DIRECT=0 (the vehicle configs, RGBNT100/MSVR310): per-modality
    BNNeck+classifier heads instead of one concat head — the reference
    returns (sign, r_score, r, n_score, n, t_score, t, vars_score,
    vars_total, gam) at sge='CLS' (`make_model.py:240-255`). Covers the
    composition branch the DIRECT=1 golden tests never touch."""
    import jax
    import jax.numpy as jnp

    from signal_tpu.models.clip_loader import (
        export_reference_signal_state_dict, load_clip_into_params)
    from signal_tpu.models.signal_model import (
        ModelSpec, forward_eval, forward_train, init_signal_params)

    mm, sd = ref_make_model
    cfg = _flagship_cfg()
    cfg.MODEL.DIRECT = 0

    spec = ModelSpec.from_config(cfg, num_classes=NUM_CLASSES,
                                 camera_num=CAM_NUM)
    spec = dataclasses.replace(spec, compute_dtype="float32",
                               use_flash=False, remat=False, stage="CLS")
    params, bn_state = init_signal_params(jax.random.PRNGKey(5), spec)
    pt = tmp_path / "ViT-B-16.pt"
    torch.save({k: v.clone() for k, v in sd.items()}, str(pt))
    params = load_clip_into_params(params, str(pt), spec)

    ref = mm.Signal(NUM_CLASSES, cfg, camera_num=CAM_NUM, view_num=0,
                    factory={})
    exported = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in export_reference_signal_state_dict(
                    params, bn_state, spec).items()}
    result = ref.load_state_dict(exported, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    leftover = [k for k in result.missing_keys
                if "num_batches_tracked" not in k]
    assert not leftover, f"ref params the exporter missed: {leftover}"

    rng = np.random.default_rng(11)
    imgs = {m: rng.standard_normal((B, 3, 256, 128)).astype(np.float32)
            for m in ("RGB", "NI", "TI")}
    cams = rng.integers(0, CAM_NUM, B)

    ref.train()
    with torch.no_grad():
        got_ref = ref({m: torch.from_numpy(v) for m, v in imgs.items()},
                      cam_label=torch.from_numpy(cams), training=True,
                      sge="CLS")
    out, _ = forward_train(params, bn_state,
                           {m: jnp.asarray(v) for m, v in imgs.items()},
                           jnp.asarray(cams), spec)

    assert got_ref[0] == 3
    (_, r_score, r_g, n_score, n_g, t_score, t_g,
     vars_score, vars_total, gam) = got_ref
    pairs = [
        ("r_score", out["scores"][0], r_score), ("r", out["feats"][0], r_g),
        ("n_score", out["scores"][1], n_score), ("n", out["feats"][1], n_g),
        ("t_score", out["scores"][2], t_score), ("t", out["feats"][2], t_g),
        ("vars_score", out["scores"][3], vars_score),
        ("vars_total", out["feats"][3], vars_total),
        ("gam", out["gam"], gam),
    ]
    for name, mine, theirs in pairs:
        np.testing.assert_allclose(
            np.asarray(mine), theirs.detach().numpy(), rtol=5e-3, atol=5e-3,
            err_msg=f"DIRECT=0 train head {name!r} diverged")
    assert out["lam"] is None

    # eval side: DIRECT does not change inference ([ori, vars_total])
    ref.eval()
    with torch.no_grad():
        ev_ref = ref({m: torch.from_numpy(v) for m, v in imgs.items()},
                     cam_label=torch.from_numpy(cams), training=False)
    ev = forward_eval(params, bn_state,
                      {m: jnp.asarray(v) for m, v in imgs.items()},
                      jnp.asarray(cams), spec)
    np.testing.assert_allclose(np.asarray(ev), ev_ref.numpy(),
                               rtol=5e-3, atol=5e-3)


def test_adapter_train_eval_match_reference(ref_make_model, tmp_path):
    """MODEL.ADAPTER=True through the FULL imported reference ``Signal``:
    every block gains a parallel adapter MLP (x + mlp(ln2 x) + adapter(x),
    `clip/model.py:206-209,233-237`). One train + one eval golden at the
    flagship sign=3 config. The adapter kernels are trunc-normal at init
    (biases zero), so the branch carries real signal — a wiring drift
    (wrong residual point, missing QuickGELU) shows up O(1)."""
    import jax
    import jax.numpy as jnp

    from signal_tpu.models.clip_loader import (
        export_reference_signal_state_dict, load_clip_into_params)
    from signal_tpu.models.signal_model import (
        ModelSpec, forward_eval, forward_train, init_signal_params)

    mm, sd = ref_make_model
    cfg = _flagship_cfg()
    cfg.MODEL.ADAPTER = True

    spec = ModelSpec.from_config(cfg, num_classes=NUM_CLASSES,
                                 camera_num=CAM_NUM)
    spec = dataclasses.replace(spec, compute_dtype="float32",
                               use_flash=False, remat=False, stage="CLS")
    params, bn_state = init_signal_params(jax.random.PRNGKey(17), spec)
    pt = tmp_path / "ViT-B-16.pt"
    torch.save({k: v.clone() for k, v in sd.items()}, str(pt))
    params = load_clip_into_params(params, str(pt), spec)
    assert "adapter" in params["base"]["blocks"]

    ref = mm.Signal(NUM_CLASSES, cfg, camera_num=CAM_NUM, view_num=0,
                    factory={})
    assert hasattr(ref.clip_vision_encoder.base.transformer.resblocks[0],
                   "adapter_ffn")
    exported = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in export_reference_signal_state_dict(
                    params, bn_state, spec).items()}
    result = ref.load_state_dict(exported, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    leftover = [k for k in result.missing_keys
                if "num_batches_tracked" not in k]
    assert not leftover, f"ref params the exporter missed: {leftover}"

    rng = np.random.default_rng(19)
    imgs = {m: rng.standard_normal((B, 3, 256, 128)).astype(np.float32)
            for m in ("RGB", "NI", "TI")}
    cams = rng.integers(0, CAM_NUM, B)

    ref.train()
    with torch.no_grad():
        got_ref = ref({m: torch.from_numpy(v) for m, v in imgs.items()},
                      cam_label=torch.from_numpy(cams), training=True,
                      sge="CLS")
    out, _ = forward_train(params, bn_state,
                           {m: jnp.asarray(v) for m, v in imgs.items()},
                           jnp.asarray(cams), spec)
    assert got_ref[0] == 3
    _, ori_score, ori, vars_score, vars_total, gam = got_ref
    for name, mine, theirs in (("ori_score", out["scores"][0], ori_score),
                               ("ori", out["feats"][0], ori),
                               ("vars_score", out["scores"][1], vars_score),
                               ("vars_total", out["feats"][1], vars_total),
                               ("gam", out["gam"], gam)):
        np.testing.assert_allclose(
            np.asarray(mine), theirs.detach().numpy(), rtol=5e-3, atol=5e-3,
            err_msg=f"ADAPTER train head {name!r} diverged")

    ref.eval()
    with torch.no_grad():
        ev_ref = ref({m: torch.from_numpy(v) for m, v in imgs.items()},
                     cam_label=torch.from_numpy(cams), training=False)
    ev = forward_eval(params, bn_state,
                      {m: jnp.asarray(v) for m, v in imgs.items()},
                      jnp.asarray(cams), spec)
    np.testing.assert_allclose(np.asarray(ev), ev_ref.numpy(),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("with_adapter", [False, True])
def test_prompt_tower_matches_reference(ref_make_model, tmp_path,
                                        with_adapter):
    """MODEL.PROMPT golden at the imported-VisionTransformer level
    (`clip/model.py:298-340` forward_with_prompt; :342-386 with ADAPTER).
    The FULL reference ``Signal`` never passes ``modality`` to the tower
    (`make_model.py:181-183`), so the prompted forward is unreachable —
    and crashes — from the Signal entry (see
    test_prompt_through_signal_is_broken_at_source); the module level is
    where the reference's prompt code actually runs. Prompt tokens are
    zero at init (`clip/model.py:187-189`), which would make the branch a
    no-op — randomize them before the weight copy so every prompt path
    (own + transfer, two cross-modality adapters, the per-layer strip/
    re-append, the 3-group mean) carries signal."""
    import jax
    import jax.numpy as jnp

    from signal_tpu.models.clip_loader import (
        export_reference_signal_state_dict, load_clip_into_params)
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.models.vit_prompt import vit_forward_prompt

    mm, sd = ref_make_model
    import modeling.clip.model as clip_model_mod  # loaded by the fixture

    cfg = _flagship_cfg()
    cfg.MODEL.PROMPT = True
    cfg.MODEL.ADAPTER = with_adapter

    spec = ModelSpec.from_config(cfg, num_classes=NUM_CLASSES,
                                 camera_num=CAM_NUM)
    spec = dataclasses.replace(spec, compute_dtype="float32",
                               use_flash=False, remat=False)
    params, bn_state = init_signal_params(jax.random.PRNGKey(23), spec)
    pt = tmp_path / "ViT-B-16.pt"
    torch.save({k: v.clone() for k, v in sd.items()}, str(pt))
    params = load_clip_into_params(params, str(pt), spec)
    assert "prompt" in params
    rng = np.random.default_rng(29)
    for name in ("prompt_rgb", "prompt_nir", "prompt_tir"):
        params["prompt"][name] = jnp.asarray(
            rng.standard_normal(params["prompt"][name].shape) * 0.1,
            jnp.float32)

    # reference tower, prompt (+adapter) pattern, our weights
    ref_visual = clip_model_mod.VisionTransformer(
        h_resolution=16, w_resolution=8, patch_size=16, stride_size=16,
        width=768, layers=12, heads=12, output_dim=512, cfg=cfg)
    prefix = "clip_vision_encoder.base."
    visual_sd = {k[len(prefix):]: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in export_reference_signal_state_dict(
                     params, bn_state, spec).items()
                 if k.startswith(prefix)}
    result = ref_visual.load_state_dict(visual_sd, strict=True)
    assert not result.missing_keys and not result.unexpected_keys
    ref_visual.eval()

    imgs = rng.standard_normal((B, 3, 256, 128)).astype(np.float32)
    for modality, name in (("rgb", "rgb"), ("nir", "nir"), ("tir", "tir")):
        with torch.no_grad():
            got_ref = ref_visual(torch.from_numpy(imgs), None, modality)
        patches, cls = vit_forward_prompt(
            params["base"], params["prompt"], jnp.asarray(imgs), None,
            name, num_heads=12, compute_dtype=jnp.float32, use_flash=False)
        np.testing.assert_allclose(
            np.asarray(cls), got_ref[:, 0].numpy(), rtol=5e-3, atol=5e-3,
            err_msg=f"prompted CLS diverged (modality={modality}, "
                    f"adapter={with_adapter})")
        np.testing.assert_allclose(
            np.asarray(patches), got_ref[:, 1:].numpy(), rtol=5e-3,
            atol=5e-3,
            err_msg=f"prompted patches diverged (modality={modality}, "
                    f"adapter={with_adapter})")


def test_prompt_through_signal_is_broken_at_source(ref_make_model):
    """Evidence for the exclusion: the reference's ``Signal.forward``
    calls the tower without ``modality`` (`make_model.py:181-183`), and
    with MODEL.PROMPT=True `forward_with_prompt` falls through every
    modality branch and returns None → the next block unpacks it and
    crashes. The prompted family is therefore dead from the reference's
    own CLI; our MODEL.PROMPT wires the modality names through
    (`signal_model.py` prompted branch) — golden-tested at the module
    level above."""
    import inspect

    mm, sd = ref_make_model
    import modeling.clip.model as clip_model_mod

    src = inspect.getsource(mm.Signal.forward)
    assert "modality" not in src  # the Signal entry never passes it

    cfg = _flagship_cfg()
    cfg.MODEL.PROMPT = True
    ref_visual = clip_model_mod.VisionTransformer(
        h_resolution=16, w_resolution=8, patch_size=16, stride_size=16,
        width=768, layers=2, heads=12, output_dim=512, cfg=cfg)
    ref_visual.eval()
    x = torch.zeros(2, 3, 256, 128)
    with pytest.raises(TypeError), torch.no_grad():
        ref_visual(x, None, None)  # modality=None: what Signal passes


@pytest.mark.parametrize("use_a", [False, True])
def test_ablation_signs_match_reference(ref_make_model, tmp_path, use_a):
    """The ablation branches: sign=1 (baseline, USE_A=USE_B=False) and
    sign=2 (+SIM, USE_B=False) return different tuples
    (`make_model.py:223-233`) and build different parameter sets; the
    sign=3 golden tests never construct them. One train + one eval
    forward each against the imported reference."""
    import jax
    import jax.numpy as jnp

    from signal_tpu.models.clip_loader import (
        export_reference_signal_state_dict, load_clip_into_params)
    from signal_tpu.models.signal_model import (
        ModelSpec, forward_eval, forward_train, init_signal_params)

    mm, sd = ref_make_model
    cfg = _flagship_cfg()
    cfg.MODEL.USE_A = use_a
    cfg.MODEL.USE_B = False

    spec = ModelSpec.from_config(cfg, num_classes=NUM_CLASSES,
                                 camera_num=CAM_NUM)
    spec = dataclasses.replace(spec, compute_dtype="float32",
                               use_flash=False, remat=False, stage="CLS")
    params, bn_state = init_signal_params(jax.random.PRNGKey(8), spec)
    pt = tmp_path / "ViT-B-16.pt"
    torch.save({k: v.clone() for k, v in sd.items()}, str(pt))
    params = load_clip_into_params(params, str(pt), spec)

    ref = mm.Signal(NUM_CLASSES, cfg, camera_num=CAM_NUM, view_num=0,
                    factory={})
    exported = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in export_reference_signal_state_dict(
                    params, bn_state, spec).items()}
    result = ref.load_state_dict(exported, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    leftover = [k for k in result.missing_keys
                if "num_batches_tracked" not in k]
    assert not leftover, f"ref params the exporter missed: {leftover}"

    rng = np.random.default_rng(13)
    imgs = {m: rng.standard_normal((B, 3, 256, 128)).astype(np.float32)
            for m in ("RGB", "NI", "TI")}
    cams = rng.integers(0, CAM_NUM, B)

    ref.train()
    with torch.no_grad():
        got_ref = ref({m: torch.from_numpy(v) for m, v in imgs.items()},
                      cam_label=torch.from_numpy(cams), training=True,
                      sge="CLS")
    out, _ = forward_train(params, bn_state,
                           {m: jnp.asarray(v) for m, v in imgs.items()},
                           jnp.asarray(cams), spec)

    assert got_ref[0] == (2 if use_a else 1)
    pairs = [("ori_score", out["scores"][0], got_ref[1]),
             ("ori", out["feats"][0], got_ref[2])]
    if use_a:
        pairs += [("vars_score", out["scores"][1], got_ref[3]),
                  ("vars_total", out["feats"][1], got_ref[4])]
    assert out["gam"] is None and out["lam"] is None
    for name, mine, theirs in pairs:
        np.testing.assert_allclose(
            np.asarray(mine), theirs.detach().numpy(), rtol=5e-3, atol=5e-3,
            err_msg=f"sign={2 if use_a else 1} head {name!r} diverged")

    ref.eval()
    with torch.no_grad():
        ev_ref = ref({m: torch.from_numpy(v) for m, v in imgs.items()},
                     cam_label=torch.from_numpy(cams), training=False)
    ev = forward_eval(params, bn_state,
                      {m: jnp.asarray(v) for m, v in imgs.items()},
                      jnp.asarray(cams), spec)
    assert ev.shape == tuple(ev_ref.shape)  # [B,3072] w/ SIM else [B,1536]
    np.testing.assert_allclose(np.asarray(ev), ev_ref.numpy(),
                               rtol=5e-3, atol=5e-3)
