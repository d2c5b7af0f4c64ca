"""Checkpoint-importer tests: fabricated torch state dicts → pytrees.

Covers the two compatibility surfaces a reference user depends on:
the OpenAI CLIP ViT archive (`load_clip_into_params`) and a trained
reference Signal .pth (`load_reference_signal_checkpoint`)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from signal_tpu.config import Config  # noqa: E402
from signal_tpu.models.clip_loader import (  # noqa: E402
    load_clip_into_params, load_reference_signal_checkpoint)
from signal_tpu.models.signal_model import (  # noqa: E402
    ModelSpec, forward_eval, init_signal_params)

WIDTH, LAYERS, OUT = 64, 2, 32
H, W = 4, 2  # target ReID grid


def _tiny_spec():
    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    cfg.MODEL.TOPK = 3
    cfg.MODEL.stageName = "together_CLS_Patch"
    spec = ModelSpec.from_config(cfg, num_classes=5, camera_num=2)
    return dataclasses.replace(spec, layers=LAYERS, width=WIDTH, feat_dim=OUT,
                               num_heads=4, h=H, w=W, use_flash=False,
                               compute_dtype="float32")


def _fake_clip_visual_sd(rng):
    """CLIP 'visual.*' tensors at tiny dims (pretrained 3x3 grid + CLS)."""
    t = lambda *s: torch.tensor(rng.standard_normal(s).astype(np.float32))  # noqa: E731
    sd = {
        "visual.conv1.weight": t(WIDTH, 3, 16, 16),               # OIHW
        "visual.class_embedding": t(WIDTH),
        "visual.positional_embedding": t(1 + 9, WIDTH),           # 3x3 grid
        "visual.ln_pre.weight": t(WIDTH), "visual.ln_pre.bias": t(WIDTH),
        "visual.ln_post.weight": t(WIDTH), "visual.ln_post.bias": t(WIDTH),
        "visual.proj": t(WIDTH, OUT),
    }
    for i in range(LAYERS):
        pre = f"visual.transformer.resblocks.{i}"
        sd.update({
            f"{pre}.ln_1.weight": t(WIDTH), f"{pre}.ln_1.bias": t(WIDTH),
            f"{pre}.attn.in_proj_weight": t(3 * WIDTH, WIDTH),
            f"{pre}.attn.in_proj_bias": t(3 * WIDTH),
            f"{pre}.attn.out_proj.weight": t(WIDTH, WIDTH),
            f"{pre}.attn.out_proj.bias": t(WIDTH),
            f"{pre}.ln_2.weight": t(WIDTH), f"{pre}.ln_2.bias": t(WIDTH),
            f"{pre}.mlp.c_fc.weight": t(4 * WIDTH, WIDTH),
            f"{pre}.mlp.c_fc.bias": t(4 * WIDTH),
            f"{pre}.mlp.c_proj.weight": t(WIDTH, 4 * WIDTH),
            f"{pre}.mlp.c_proj.bias": t(WIDTH),
        })
    return sd


def test_load_clip_into_params(tmp_path):
    rng = np.random.default_rng(0)
    sd = _fake_clip_visual_sd(rng)
    path = str(tmp_path / "ViT-tiny.pt")
    torch.save(sd, path)

    spec = _tiny_spec()
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    new = load_clip_into_params(params, path, spec)

    base = new["base"]
    # conv OIHW → HWIO
    np.testing.assert_allclose(
        np.asarray(base["conv1"]["kernel"]),
        sd["visual.conv1.weight"].numpy().transpose(2, 3, 1, 0))
    # pos-embed resized 3x3 → HxW (+CLS row preserved exactly)
    assert base["positional_embedding"].shape == (1 + H * W, WIDTH)
    np.testing.assert_allclose(np.asarray(base["positional_embedding"][0]),
                               sd["visual.positional_embedding"][0].numpy())
    # per-layer stacking + torch [out,in] → [in,out] transpose
    np.testing.assert_allclose(
        np.asarray(base["blocks"]["attn"]["qkv_kernel"][1]),
        sd["visual.transformer.resblocks.1.attn.in_proj_weight"].numpy().T)
    np.testing.assert_allclose(
        np.asarray(base["blocks"]["mlp"]["fc_bias"][0]),
        sd["visual.transformer.resblocks.0.mlp.c_fc.bias"].numpy())

    # loaded tower forwards
    imgs = {m: jnp.asarray(rng.standard_normal((2, 3, H * 16, W * 16)),
                           jnp.float32) for m in ("RGB", "NI", "TI")}
    feat = forward_eval(new, bn, imgs, jnp.asarray([0, 1]), spec)
    assert np.isfinite(np.asarray(feat)).all()


def test_load_reference_signal_checkpoint(tmp_path):
    """Roundtrip: our params → reference-style state dict → import."""
    spec = _tiny_spec()
    params, bn = init_signal_params(jax.random.PRNGKey(1), spec)
    rng = np.random.default_rng(1)

    t = lambda a: torch.tensor(np.asarray(a))  # noqa: E731
    sd = dict(_fake_clip_visual_sd(rng))
    sd = {k.replace("visual.", "clip_vision_encoder.base."): v
          for k, v in sd.items()}
    # a trained .pth stores the (non-square) ReID grid, imported verbatim
    sd["clip_vision_encoder.base.positional_embedding"] = torch.tensor(
        rng.standard_normal((1 + H * W, WIDTH)).astype(np.float32))
    sd["clip_vision_encoder.cv_embed"] = torch.tensor(
        rng.standard_normal((2, 1, WIDTH)).astype(np.float32))
    # BNNeck + classifier (direct path) and SIM head
    for name, dim in (("bottleneck", 3 * OUT), ("bottleneck_var", 3 * OUT)):
        sd[f"{name}.weight"] = t(rng.standard_normal(dim).astype(np.float32))
        sd[f"{name}.bias"] = t(np.zeros(dim, np.float32))
        sd[f"{name}.running_mean"] = t(rng.standard_normal(dim).astype(np.float32))
        sd[f"{name}.running_var"] = t(np.abs(rng.standard_normal(dim)).astype(np.float32))
    for name, dim in (("classifier", 3 * OUT), ("classifier_var", 3 * OUT)):
        sd[f"{name}.weight"] = t(rng.standard_normal((5, dim)).astype(np.float32))
    # SIM
    for w in ("W_q", "W_k", "W_v"):
        sd[f"SIM.token_selection.{w}.weight"] = t(
            rng.standard_normal((OUT, OUT)).astype(np.float32))
        sd[f"SIM.token_selection.{w}.bias"] = t(
            rng.standard_normal(OUT).astype(np.float32))
    mi = "SIM.modal_interactive"
    sd[f"{mi}.cross_attn.in_proj_weight"] = t(
        rng.standard_normal((3 * OUT, OUT)).astype(np.float32))
    sd[f"{mi}.cross_attn.in_proj_bias"] = t(np.zeros(3 * OUT, np.float32))
    sd[f"{mi}.cross_attn.out_proj.weight"] = t(
        rng.standard_normal((OUT, OUT)).astype(np.float32))
    sd[f"{mi}.cross_attn.out_proj.bias"] = t(np.zeros(OUT, np.float32))
    sd[f"{mi}.ffn.0.weight"] = t(rng.standard_normal((2 * OUT, OUT)).astype(np.float32))
    sd[f"{mi}.ffn.0.bias"] = t(np.zeros(2 * OUT, np.float32))
    sd[f"{mi}.ffn.2.weight"] = t(rng.standard_normal((OUT, 2 * OUT)).astype(np.float32))
    sd[f"{mi}.ffn.2.bias"] = t(np.zeros(OUT, np.float32))
    for i in (1, 2):
        sd[f"{mi}.norm{i}.weight"] = t(np.ones(OUT, np.float32))
        sd[f"{mi}.norm{i}.bias"] = t(np.zeros(OUT, np.float32))

    path = str(tmp_path / "Signalbest.pth")
    torch.save(sd, path)
    p2, bn2 = load_reference_signal_checkpoint(params, bn, path, spec)

    # cv_embed squeezed [cam, 1, W] → [cam, W]
    np.testing.assert_allclose(
        np.asarray(p2["cv_embed"]),
        sd["clip_vision_encoder.cv_embed"].numpy()[:, 0, :])
    # BNNeck running stats landed in state, torch [out,in] classifier → [in,out]
    np.testing.assert_allclose(np.asarray(bn2["bottleneck"]["mean"]),
                               sd["bottleneck.running_mean"].numpy())
    np.testing.assert_allclose(np.asarray(p2["classifier"]["kernel"]),
                               sd["classifier.weight"].numpy().T)
    np.testing.assert_allclose(
        np.asarray(p2["SIM"]["select"]["W_q"]["kernel"]),
        sd["SIM.token_selection.W_q.weight"].numpy().T)

    imgs = {m: jnp.asarray(rng.standard_normal((2, 3, H * 16, W * 16)),
                           jnp.float32) for m in ("RGB", "NI", "TI")}
    feat = forward_eval(p2, bn2, imgs, jnp.asarray([0, 1]), spec)
    assert np.isfinite(np.asarray(feat)).all()


def test_torch_state_dict_reads_jit_archives(tmp_path):
    """Real OpenAI ViT-B-16.pt files are torch.jit archives — the reader's
    first branch; the fabricated-checkpoint tests only cover the plain
    torch.save fallback."""
    from signal_tpu.models.clip_loader import _torch_state_dict

    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = torch.nn.Linear(4, 3)

        def forward(self, x):
            return self.lin(x)

    path = str(tmp_path / "scripted.pt")
    torch.jit.save(torch.jit.script(M()), path)
    sd = _torch_state_dict(path)
    assert isinstance(sd["lin.weight"], np.ndarray)
    assert sd["lin.weight"].shape == (3, 4)
    assert sd["lin.weight"].dtype == np.float32


def test_trained_grid_pos_embed_imports_verbatim():
    """A TRAINED Signal .pth stores the pos embed at the (non-square)
    ReID grid — pos_verbatim imports it untouched (the reference's
    load_param semantics); resize_pos_embed itself now refuses non-square
    sources (it previously crashed in reshape on 128 = 16x8 tokens, and a
    token-COUNT pass-through would be layout-ambiguous: 196 is both 14x14
    and 28x7)."""
    from signal_tpu.models.clip_loader import clip_visual_to_vit_params
    from signal_tpu.models.vit import resize_pos_embed

    rng = np.random.default_rng(3)
    sd = {k: v.numpy() for k, v in _fake_clip_visual_sd(rng).items()}
    pos = rng.standard_normal((1 + 16 * 8, WIDTH)).astype(np.float32)
    sd["visual.positional_embedding"] = pos

    base = clip_visual_to_vit_params(sd, 16, 8, LAYERS, pos_verbatim=True)
    np.testing.assert_array_equal(np.asarray(base["positional_embedding"]), pos)

    with pytest.raises(ValueError, match="not a square"):
        resize_pos_embed(jnp.asarray(pos), 16, 8)  # 128 tokens: non-square
    with pytest.raises(ValueError, match="mismatch"):
        clip_visual_to_vit_params(sd, 4, 2, LAYERS, pos_verbatim=True)


def _tree_paths_equal(a, b):
    la = jax.tree_util.tree_flatten_with_path(a)
    lb = jax.tree_util.tree_flatten_with_path(b)
    assert [k for k, _ in la[0]] == [k for k, _ in lb[0]]
    for (ka, va), (_, vb) in zip(la[0], lb[0]):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=0, atol=0, err_msg=str(ka))


@pytest.mark.parametrize("branch", ["base", "adapter", "prompt",
                                    "prompt_adapter"])
def test_torch_export_roundtrip(tmp_path, branch):
    """export_reference_signal_state_dict is the exact inverse of
    load_reference_signal_checkpoint: params → .pth → params is the
    identity (incl. the non-square trained pos-embed grid), for the base
    tower and for the MODEL.ADAPTER / MODEL.PROMPT branches, which use
    the reference's per-block `adapter_ffn` / `adapter_prompt_*` /
    `adapter_transfer` / `adapter_{r,n,t}` naming
    (`modeling/clip/model.py:183-209`)."""
    from signal_tpu.models.clip_loader import save_reference_signal_checkpoint

    spec = dataclasses.replace(
        _tiny_spec(),
        adapter=branch in ("adapter", "prompt_adapter"),
        prompt=branch in ("prompt", "prompt_adapter"))
    params, bn = init_signal_params(jax.random.PRNGKey(4), spec)
    if spec.prompt:  # zero-init prompt tokens would roundtrip trivially
        for name in ("prompt_rgb", "prompt_nir", "prompt_tir"):
            params["prompt"][name] = jax.random.normal(
                jax.random.PRNGKey(7), params["prompt"][name].shape)
    path = str(tmp_path / "exported.pth")
    save_reference_signal_checkpoint(params, bn, spec, path)

    p2, bn2 = load_reference_signal_checkpoint(params, bn, path, spec)
    _tree_paths_equal(p2, params)
    _tree_paths_equal(bn2, bn)


def test_export_torch_checkpoint_cli(tmp_path, monkeypatch):
    """scripts/export_torch_checkpoint.py end-to-end: orbax checkpoint in,
    reference-format .pth out, reimportable."""
    import sys

    from signal_tpu.utils.checkpoint import save_checkpoint

    spec = _tiny_spec()
    params, bn = init_signal_params(jax.random.PRNGKey(6), spec)
    ckpt = str(tmp_path / "orbax_ckpt")
    save_checkpoint(ckpt, {"params": params, "bn_state": bn})

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import export_torch_checkpoint

    out = str(tmp_path / "exported.pth")
    monkeypatch.setattr(sys, "argv", [
        "export_torch_checkpoint.py", "--config_file",
        "configs/synthetic/smoke.yml", "-o", out,
        "--num_classes", str(spec.num_classes),
        "--camera_num", str(spec.camera_num),
        # shrink + opts rebuild exactly _tiny_spec so shapes match the ckpt
        "--shrink", f"layers={LAYERS},width={WIDTH},feat_dim={OUT},"
                    "num_heads=4,use_flash=False,compute_dtype=float32",
        "TEST.WEIGHT", ckpt,
        "INPUT.SIZE_TRAIN", "(64, 32)", "INPUT.SIZE_TEST", "(64, 32)",
        "MODEL.USE_A", "True", "MODEL.USE_B", "True",
        "MODEL.stageName", "together_CLS_Patch", "MODEL.TOPK", "3",
    ])
    try:
        export_torch_checkpoint.main()
    except SystemExit as e:  # argparse exits 0 on success paths only
        assert not e.code
    assert os.path.exists(out)

    sd = torch.load(out, map_location="cpu", weights_only=True)
    assert "clip_vision_encoder.base.positional_embedding" in sd
    import dataclasses as dc

    from signal_tpu.models.clip_loader import export_reference_signal_state_dict

    spec = _tiny_spec()
    params, bn = init_signal_params(jax.random.PRNGKey(5), spec)
    with pytest.raises(NotImplementedError, match="reference state-dict"):
        export_reference_signal_state_dict(
            params, bn, dc.replace(spec, frozen=True))
