"""Fabricators for reference-format torch checkpoints at tiny dims
(key schema per `modeling/make_model.py` / `modeling/clip/model.py` in
maxingan2412/Signal). Used by the parity-harness smoke test."""

import numpy as np


def fake_clip_visual_sd(rng, width: int, layers: int, out: int,
                        grid: int = 3, grid_tokens: int | None = None):
    """OpenAI-CLIP 'visual.*' tensors (pretrained grid×grid + CLS).

    ``grid_tokens`` overrides the token count for TRAINED-checkpoint
    shapes, where the pos embed is already at the (non-square) ReID
    grid rather than CLIP's square pretrained one."""
    import torch

    n_grid = grid_tokens if grid_tokens is not None else grid * grid
    t = lambda *s: torch.tensor(rng.standard_normal(s).astype(np.float32) * 0.02)  # noqa: E731
    sd = {
        "visual.conv1.weight": t(width, 3, 16, 16),
        "visual.class_embedding": t(width),
        "visual.positional_embedding": t(1 + n_grid, width),
        "visual.ln_pre.weight": t(width), "visual.ln_pre.bias": t(width),
        "visual.ln_post.weight": t(width), "visual.ln_post.bias": t(width),
        "visual.proj": t(width, out),
    }
    for i in range(layers):
        pre = f"visual.transformer.resblocks.{i}"
        sd.update({
            f"{pre}.ln_1.weight": t(width), f"{pre}.ln_1.bias": t(width),
            f"{pre}.attn.in_proj_weight": t(3 * width, width),
            f"{pre}.attn.in_proj_bias": t(3 * width),
            f"{pre}.attn.out_proj.weight": t(width, width),
            f"{pre}.attn.out_proj.bias": t(width),
            f"{pre}.ln_2.weight": t(width), f"{pre}.ln_2.bias": t(width),
            f"{pre}.mlp.c_fc.weight": t(4 * width, width),
            f"{pre}.mlp.c_fc.bias": t(4 * width),
            f"{pre}.mlp.c_proj.weight": t(width, 4 * width),
            f"{pre}.mlp.c_proj.bias": t(width),
        })
    return sd


def fake_signal_sd(rng, width: int, layers: int, out: int, cam_num: int,
                   num_classes: int, with_align: bool = True,
                   grid_hw: tuple | None = None):
    """A full reference `Signal` state dict (direct head + SIM [+ AlignM]).

    ``grid_hw=(h, w)``: store the pos embed at the trained ReID grid —
    what a real released `Signal best.pth` contains (the reference
    resizes CLIP's 14×14 at BUILD time, so its state dict carries the
    non-square h×w grid)."""
    import torch

    t = lambda a: torch.tensor(np.asarray(a, np.float32))  # noqa: E731
    r = lambda *s: t(rng.standard_normal(s) * 0.02)        # noqa: E731
    grid_tokens = grid_hw[0] * grid_hw[1] if grid_hw else None
    sd = {k.replace("visual.", "clip_vision_encoder.base."): v
          for k, v in fake_clip_visual_sd(
              rng, width, layers, out, grid_tokens=grid_tokens).items()}
    sd["clip_vision_encoder.cv_embed"] = r(cam_num, 1, width)
    for name in ("bottleneck", "bottleneck_var"):
        dim = 3 * out
        sd[f"{name}.weight"] = t(np.ones(dim))
        sd[f"{name}.bias"] = t(np.zeros(dim))
        sd[f"{name}.running_mean"] = t(np.zeros(dim))
        sd[f"{name}.running_var"] = t(np.ones(dim))
    for name in ("classifier", "classifier_var"):
        sd[f"{name}.weight"] = r(num_classes, 3 * out)
    for w in ("W_q", "W_k", "W_v"):
        sd[f"SIM.token_selection.{w}.weight"] = r(out, out)
        sd[f"SIM.token_selection.{w}.bias"] = r(out)
    mi = "SIM.modal_interactive"
    sd[f"{mi}.cross_attn.in_proj_weight"] = r(3 * out, out)
    sd[f"{mi}.cross_attn.in_proj_bias"] = t(np.zeros(3 * out))
    sd[f"{mi}.cross_attn.out_proj.weight"] = r(out, out)
    sd[f"{mi}.cross_attn.out_proj.bias"] = t(np.zeros(out))
    sd[f"{mi}.ffn.0.weight"] = r(2 * out, out)
    sd[f"{mi}.ffn.0.bias"] = t(np.zeros(2 * out))
    sd[f"{mi}.ffn.2.weight"] = r(out, 2 * out)
    sd[f"{mi}.ffn.2.bias"] = t(np.zeros(out))
    for i in (1, 2):
        sd[f"{mi}.norm{i}.weight"] = t(np.ones(out))
        sd[f"{mi}.norm{i}.bias"] = t(np.zeros(out))
    if with_align:
        sd["AlignM.contra_temp"] = t(0.07)
        for mod in ("DAS_r", "DAS_n", "DAS_t"):
            pre = f"AlignM.{mod}"
            sd[f"{pre}.proj_q.weight"] = r(out, out, 1, 1)
            sd[f"{pre}.proj_q.bias"] = t(np.zeros(out))
            sd[f"{pre}.conv_offset.0.weight"] = r(out, out, 1, 1)
            sd[f"{pre}.conv_offset.0.bias"] = t(np.zeros(out))
            sd[f"{pre}.conv_offset.2.weight"] = r(out, 1, 4, 4)
            sd[f"{pre}.conv_offset.2.bias"] = t(np.zeros(out))
            sd[f"{pre}.conv_offset.4.weight"] = r(1, out, 1, 1)
    return sd
