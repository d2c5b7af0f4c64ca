"""Checkpoint converters: CLIP ViT-B-16 .pt / reference Signal .pth → pytrees.

Mirrors the reference's CLIP bootstrap (`modeling/make_model_clipreid.py:
177-197`, `modeling/clip/clip.py:86-182`, `modeling/clip/model.py:651-706`
in maxingan2412/Signal): read the torch archive (JIT or plain state_dict),
keep the visual tower, bilinear-resize the positional embedding from the
pretrained 14×14 grid to the ReID h×w grid (`model.py:712-729`), convert
to fp32.

Torch (CPU build, baked into the image) is used ONLY here, at load time.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from signal_tpu.models.vit import resize_pos_embed


def _torch_state_dict(path: str) -> Dict[str, Any]:
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def clip_visual_to_vit_params(sd: Dict[str, np.ndarray], h: int, w: int,
                              layers: int = 12,
                              pos_verbatim: bool = False) -> Dict[str, Any]:
    """CLIP 'visual.*' torch tensors → our stacked-block ViT pytree.

    ``pos_verbatim``: the source is a TRAINED checkpoint whose pos embed
    is already at the (possibly non-square) h×w ReID grid — import it
    unchanged, as the reference's `load_param` does, instead of resizing
    from a square pretrained grid. A count mismatch is a config error."""
    g = lambda k: jnp.asarray(sd[f"visual.{k}"])  # noqa: E731

    if pos_verbatim:
        pos = g("positional_embedding")
        if pos.shape[0] != 1 + h * w:
            raise ValueError(
                f"trained checkpoint pos embed has {pos.shape[0] - 1} grid "
                f"tokens but the config's grid is {h}x{w} = {h * w} — "
                f"checkpoint/config image-size or stride mismatch")
    else:
        pos = resize_pos_embed(g("positional_embedding"), h, w)

    def stack(fmt, transpose=None):
        arrs = []
        for i in range(layers):
            a = jnp.asarray(sd[f"visual.transformer.resblocks.{i}.{fmt}"])
            if transpose:
                a = a.T
            arrs.append(a)
        return jnp.stack(arrs)

    return {
        # torch conv OIHW → HWIO
        "conv1": {"kernel": jnp.transpose(g("conv1.weight"), (2, 3, 1, 0))},
        "class_embedding": g("class_embedding"),
        "positional_embedding": pos,
        "ln_pre": {"scale": g("ln_pre.weight"), "bias": g("ln_pre.bias")},
        "blocks": {
            "ln_1": {"scale": stack("ln_1.weight"), "bias": stack("ln_1.bias")},
            "attn": {
                "qkv_kernel": stack("attn.in_proj_weight", transpose=True),
                "qkv_bias": stack("attn.in_proj_bias"),
                "out_kernel": stack("attn.out_proj.weight", transpose=True),
                "out_bias": stack("attn.out_proj.bias"),
            },
            "ln_2": {"scale": stack("ln_2.weight"), "bias": stack("ln_2.bias")},
            "mlp": {
                "fc_kernel": stack("mlp.c_fc.weight", transpose=True),
                "fc_bias": stack("mlp.c_fc.bias"),
                "proj_kernel": stack("mlp.c_proj.weight", transpose=True),
                "proj_bias": stack("mlp.c_proj.bias"),
            },
        },
        "ln_post": {"scale": g("ln_post.weight"), "bias": g("ln_post.bias")},
        "proj": g("proj"),
    }


def load_clip_into_params(params: Dict[str, Any], path: str, spec) -> Dict[str, Any]:
    """Replace params['base'] with converted CLIP visual weights."""
    sd = _torch_state_dict(path)
    new = dict(params)
    base = clip_visual_to_vit_params(sd, spec.h, spec.w, spec.layers)
    # CLIP archives have no adapter weights — keep the freshly-initialized
    # MambaPro adapters (MODEL.ADAPTER) instead of silently dropping them
    old_blocks = params.get("base", {}).get("blocks", {})
    if "adapter" in old_blocks:
        base["blocks"]["adapter"] = old_blocks["adapter"]
    if "moe" in old_blocks:
        # MODEL.MOE_EXPERTS: sparse-upcycle the dense CLIP MLP into every
        # expert (per layer) and keep the freshly-initialized router —
        # step 0 computes the dense model (see ops/moe.py)
        from signal_tpu.ops.moe import upcycle_dense_mlp

        import jax

        n_experts = old_blocks["moe"]["fc_kernel"].shape[1]
        dense = base["blocks"].pop("mlp")
        per_layer = [upcycle_dense_mlp(
            jax.tree.map(lambda a: a[i], dense), n_experts)
            for i in range(spec.layers)]
        moe = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
        moe["router"] = old_blocks["moe"]["router"]
        base["blocks"]["moe"] = moe
    new["base"] = base
    return new


# --------------------------------------------------------------------------
# Reference Signal .pth → full signal_tpu param tree (eval parity path)
# --------------------------------------------------------------------------

_BN_MAP = {"weight": "scale", "bias": "bias"}


def load_reference_signal_checkpoint(params: Dict[str, Any], bn_state: Dict[str, Any],
                                     path: str, spec) -> tuple[Dict[str, Any], Dict[str, Any]]:
    """Import a torch Signal state_dict (keys per `modeling/make_model.py`)."""
    sd = _torch_state_dict(path)
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    # structural copy (fresh containers, shared leaves) — the SIM/AlignM
    # imports below assign into nested dicts and must not mutate the
    # caller's tree
    import jax

    p = jax.tree.map(lambda x: x, params)
    bn = jax.tree.map(lambda x: x, bn_state)

    # ViT tower under 'clip_vision_encoder.base.'
    base_sd = {k.replace("clip_vision_encoder.base.", "visual."): v
               for k, v in sd.items() if k.startswith("clip_vision_encoder.base.")}
    if base_sd:
        # trained checkpoints store the pos embed at the (non-square) ReID
        # grid — the reference resized CLIP's 14x14 at BUILD time and
        # load_param copies verbatim; pos_verbatim reproduces that
        p["base"] = clip_visual_to_vit_params(base_sd, spec.h, spec.w,
                                              spec.layers, pos_verbatim=True)

        def stack(fmt, transpose=False):
            arrs = []
            for i in range(spec.layers):
                a = jnp.asarray(base_sd[f"visual.transformer.resblocks.{i}.{fmt}"])
                arrs.append(a.T if transpose else a)
            return jnp.stack(arrs)

        if "visual.transformer.resblocks.0.adapter_ffn.0.weight" in base_sd:
            # MODEL.ADAPTER (`clip/model.py:206-209`)
            p["base"]["blocks"]["adapter"] = {
                "down_kernel": stack("adapter_ffn.0.weight", transpose=True),
                "down_bias": stack("adapter_ffn.0.bias"),
                "up_kernel": stack("adapter_ffn.2.weight", transpose=True),
                "up_bias": stack("adapter_ffn.2.bias"),
            }
        if "visual.transformer.resblocks.0.adapter_prompt_rgb" in base_sd:
            # MODEL.PROMPT (`clip/model.py:185-205`)
            def mlp(tname):
                return {
                    "fc1_kernel": stack(f"{tname}.0.weight", transpose=True),
                    "fc1_bias": stack(f"{tname}.0.bias"),
                    "fc2_kernel": stack(f"{tname}.3.weight", transpose=True),
                    "fc2_bias": stack(f"{tname}.3.bias"),
                }

            p["prompt"] = {
                "prompt_rgb": stack("adapter_prompt_rgb"),
                "prompt_nir": stack("adapter_prompt_nir"),
                "prompt_tir": stack("adapter_prompt_tir"),
                "transfer": mlp("adapter_transfer"),
                "adp_r": mlp("adapter_r"),
                "adp_n": mlp("adapter_n"),
                "adp_t": mlp("adapter_t"),
            }
    if "clip_vision_encoder.cv_embed" in sd:
        p["cv_embed"] = jnp.asarray(sd["clip_vision_encoder.cv_embed"]).squeeze(1)

    def bn_import(name, ours):
        p[ours] = {"scale": jnp.asarray(sd[f"{name}.weight"]),
                   "bias": jnp.asarray(sd[f"{name}.bias"])}
        bn[ours] = {"mean": jnp.asarray(sd[f"{name}.running_mean"]),
                    "var": jnp.asarray(sd[f"{name}.running_var"])}

    def cls_import(name, ours):
        p[ours] = {"kernel": jnp.asarray(sd[f"{name}.weight"]).T}

    for tname, oname in (("bottleneck", "bottleneck"),
                         ("bottleneck_r", "bottleneck_r"),
                         ("bottleneck_n", "bottleneck_n"),
                         ("bottleneck_t", "bottleneck_t"),
                         ("bottleneck_var", "bottleneck_var")):
        if f"{tname}.weight" in sd and oname in p:
            bn_import(tname, oname)
    for tname, oname in (("classifier", "classifier"),
                         ("classifier_r", "classifier_r"),
                         ("classifier_n", "classifier_n"),
                         ("classifier_t", "classifier_t"),
                         ("classifier_var", "classifier_var")):
        if f"{tname}.weight" in sd and oname in p:
            cls_import(tname, oname)

    if "SIM" in p and "SIM.token_selection.W_q.weight" in sd:
        sel = p["SIM"]["select"]
        for w in ("W_q", "W_k", "W_v"):
            sel[w] = {"kernel": jnp.asarray(sd[f"SIM.token_selection.{w}.weight"]).T,
                      "bias": jnp.asarray(sd[f"SIM.token_selection.{w}.bias"])}
        inter = p["SIM"]["interact"]
        mi = "SIM.modal_interactive"
        inter["cross_attn"] = {
            "qkv_kernel": jnp.asarray(sd[f"{mi}.cross_attn.in_proj_weight"]).T,
            "qkv_bias": jnp.asarray(sd[f"{mi}.cross_attn.in_proj_bias"]),
            "out_kernel": jnp.asarray(sd[f"{mi}.cross_attn.out_proj.weight"]).T,
            "out_bias": jnp.asarray(sd[f"{mi}.cross_attn.out_proj.bias"]),
        }
        inter["ffn"] = {
            "fc1": {"kernel": jnp.asarray(sd[f"{mi}.ffn.0.weight"]).T,
                    "bias": jnp.asarray(sd[f"{mi}.ffn.0.bias"])},
            "fc2": {"kernel": jnp.asarray(sd[f"{mi}.ffn.2.weight"]).T,
                    "bias": jnp.asarray(sd[f"{mi}.ffn.2.bias"])},
        }
        for i in (1, 2):
            inter[f"norm{i}"] = {"scale": jnp.asarray(sd[f"{mi}.norm{i}.weight"]),
                                 "bias": jnp.asarray(sd[f"{mi}.norm{i}.bias"])}

    if "AlignM" in p and "AlignM.contra_temp" in sd:
        al = p["AlignM"]
        al["contra_temp"] = jnp.asarray(sd["AlignM.contra_temp"])
        for mod, ours in (("DAS_r", "DAS_r"), ("DAS_n", "DAS_n"), ("DAS_t", "DAS_t")):
            d = al[ours]
            pre = f"AlignM.{mod}"
            d["proj_q"] = {
                "kernel": jnp.transpose(jnp.asarray(sd[f"{pre}.proj_q.weight"]), (2, 3, 1, 0)),
                "bias": jnp.asarray(sd[f"{pre}.proj_q.bias"])}
            d["off_conv1"] = {
                "kernel": jnp.transpose(jnp.asarray(sd[f"{pre}.conv_offset.0.weight"]), (2, 3, 1, 0)),
                "bias": jnp.asarray(sd[f"{pre}.conv_offset.0.bias"])}
            d["off_dw"] = {
                "kernel": jnp.transpose(jnp.asarray(sd[f"{pre}.conv_offset.2.weight"]), (2, 3, 1, 0)),
                "bias": jnp.asarray(sd[f"{pre}.conv_offset.2.bias"])}
            d["off_out"] = {
                "kernel": jnp.transpose(jnp.asarray(sd[f"{pre}.conv_offset.4.weight"]), (2, 3, 1, 0))}
    return p, bn


# --------------------------------------------------------------------------
# Full signal_tpu param tree → reference Signal .pth (torch interop export)
# --------------------------------------------------------------------------


def export_reference_signal_state_dict(params: Dict[str, Any],
                                       bn_state: Dict[str, Any],
                                       spec) -> Dict[str, np.ndarray]:
    """Inverse of :func:`load_reference_signal_checkpoint`: a TPU-trained
    param tree → a state dict keyed per the reference's ``Signal`` module
    (`modeling/make_model.py` in maxingan2412/Signal), so the checkpoint
    drops into the reference's `load_param` / torch-ecosystem tooling.

    The positional embedding exports at the trained ReID grid — exactly
    what a torch ``Signal`` built for the same config stores. Only the
    CLIP-tower Signal path has a reference naming; LoRA factor weights
    and the other backbone families have none and are rejected rather
    than silently dropped. MODEL.ADAPTER / MODEL.PROMPT DO have one —
    the per-block ``adapter_ffn`` / ``adapter_prompt_*`` /
    ``adapter_transfer`` / ``adapter_{r,n,t}`` parameters the reference
    creates when its pattern list carries 'adapter'/'prompt'
    (`modeling/clip/model.py:183-209`)."""
    if getattr(spec, "backbone", "clip") != "clip":
        raise NotImplementedError(
            f"torch export is defined for the CLIP-tower Signal model; "
            f"backbone {spec.backbone!r} has no reference state-dict naming")
    base_blocks = params.get("base", {}).get("blocks", {})
    if spec.frozen:
        raise NotImplementedError(
            "torch export with LoRA (MODEL.FROZEN) has no reference "
            "state-dict naming — export the base model")
    if "moe" in base_blocks or getattr(spec, "moe_experts", 0) > 1:
        raise NotImplementedError(
            "torch export with MODEL.MOE_EXPERTS > 1 has no reference "
            "state-dict naming (the reference's MLP is dense)")

    out: Dict[str, np.ndarray] = {}
    a = lambda x: np.asarray(x, dtype=np.float32)  # noqa: E731

    base = params["base"]
    pre = "clip_vision_encoder.base."
    out[pre + "conv1.weight"] = a(base["conv1"]["kernel"]).transpose(3, 2, 0, 1)
    out[pre + "class_embedding"] = a(base["class_embedding"])
    out[pre + "positional_embedding"] = a(base["positional_embedding"])
    for ln in ("ln_pre", "ln_post"):
        out[pre + f"{ln}.weight"] = a(base[ln]["scale"])
        out[pre + f"{ln}.bias"] = a(base[ln]["bias"])
    out[pre + "proj"] = a(base["proj"])
    blocks = base["blocks"]
    n_layers = int(np.asarray(blocks["ln_1"]["scale"]).shape[0])
    for i in range(n_layers):
        b = pre + f"transformer.resblocks.{i}."
        out[b + "ln_1.weight"] = a(blocks["ln_1"]["scale"][i])
        out[b + "ln_1.bias"] = a(blocks["ln_1"]["bias"][i])
        out[b + "attn.in_proj_weight"] = a(blocks["attn"]["qkv_kernel"][i]).T
        out[b + "attn.in_proj_bias"] = a(blocks["attn"]["qkv_bias"][i])
        out[b + "attn.out_proj.weight"] = a(blocks["attn"]["out_kernel"][i]).T
        out[b + "attn.out_proj.bias"] = a(blocks["attn"]["out_bias"][i])
        out[b + "ln_2.weight"] = a(blocks["ln_2"]["scale"][i])
        out[b + "ln_2.bias"] = a(blocks["ln_2"]["bias"][i])
        out[b + "mlp.c_fc.weight"] = a(blocks["mlp"]["fc_kernel"][i]).T
        out[b + "mlp.c_fc.bias"] = a(blocks["mlp"]["fc_bias"][i])
        out[b + "mlp.c_proj.weight"] = a(blocks["mlp"]["proj_kernel"][i]).T
        out[b + "mlp.c_proj.bias"] = a(blocks["mlp"]["proj_bias"][i])
        if "adapter" in blocks:
            # MODEL.ADAPTER: Sequential(Linear, QuickGELU, Linear) → .0/.2
            ad = blocks["adapter"]
            out[b + "adapter_ffn.0.weight"] = a(ad["down_kernel"][i]).T
            out[b + "adapter_ffn.0.bias"] = a(ad["down_bias"][i])
            out[b + "adapter_ffn.2.weight"] = a(ad["up_kernel"][i]).T
            out[b + "adapter_ffn.2.bias"] = a(ad["up_bias"][i])
        if "prompt" in params:
            # MODEL.PROMPT: per-block k×d prompt tokens + the transfer /
            # cross-modality MLPs, Sequential(Linear, QuickGELU, Dropout,
            # Linear) → .0/.3 (`clip/model.py:185-205`)
            pp = params["prompt"]
            for mod, ours in (("rgb", "prompt_rgb"), ("nir", "prompt_nir"),
                              ("tir", "prompt_tir")):
                out[b + f"adapter_prompt_{mod}"] = a(pp[ours][i])
            for tname, ours in (("adapter_transfer", "transfer"),
                                ("adapter_r", "adp_r"),
                                ("adapter_n", "adp_n"),
                                ("adapter_t", "adp_t")):
                m = pp[ours]
                out[b + f"{tname}.0.weight"] = a(m["fc1_kernel"][i]).T
                out[b + f"{tname}.0.bias"] = a(m["fc1_bias"][i])
                out[b + f"{tname}.3.weight"] = a(m["fc2_kernel"][i]).T
                out[b + f"{tname}.3.bias"] = a(m["fc2_bias"][i])

    if "cv_embed" in params:
        out["clip_vision_encoder.cv_embed"] = a(params["cv_embed"])[:, None, :]

    for name in ("bottleneck", "bottleneck_r", "bottleneck_n",
                 "bottleneck_t", "bottleneck_var"):
        if name in params:
            out[f"{name}.weight"] = a(params[name]["scale"])
            out[f"{name}.bias"] = a(params[name]["bias"])
            out[f"{name}.running_mean"] = a(bn_state[name]["mean"])
            out[f"{name}.running_var"] = a(bn_state[name]["var"])
    for name in ("classifier", "classifier_r", "classifier_n",
                 "classifier_t", "classifier_var"):
        if name in params:
            out[f"{name}.weight"] = a(params[name]["kernel"]).T

    if "SIM" in params:
        sel = params["SIM"]["select"]
        for w in ("W_q", "W_k", "W_v"):
            out[f"SIM.token_selection.{w}.weight"] = a(sel[w]["kernel"]).T
            out[f"SIM.token_selection.{w}.bias"] = a(sel[w]["bias"])
        inter = params["SIM"]["interact"]
        mi = "SIM.modal_interactive"
        ca = inter["cross_attn"]
        out[f"{mi}.cross_attn.in_proj_weight"] = a(ca["qkv_kernel"]).T
        out[f"{mi}.cross_attn.in_proj_bias"] = a(ca["qkv_bias"])
        out[f"{mi}.cross_attn.out_proj.weight"] = a(ca["out_kernel"]).T
        out[f"{mi}.cross_attn.out_proj.bias"] = a(ca["out_bias"])
        out[f"{mi}.ffn.0.weight"] = a(inter["ffn"]["fc1"]["kernel"]).T
        out[f"{mi}.ffn.0.bias"] = a(inter["ffn"]["fc1"]["bias"])
        out[f"{mi}.ffn.2.weight"] = a(inter["ffn"]["fc2"]["kernel"]).T
        out[f"{mi}.ffn.2.bias"] = a(inter["ffn"]["fc2"]["bias"])
        for i in (1, 2):
            out[f"{mi}.norm{i}.weight"] = a(inter[f"norm{i}"]["scale"])
            out[f"{mi}.norm{i}.bias"] = a(inter[f"norm{i}"]["bias"])

    if "AlignM" in params:
        al = params["AlignM"]
        out["AlignM.contra_temp"] = a(al["contra_temp"])
        for mod in ("DAS_r", "DAS_n", "DAS_t"):
            d = al[mod]
            pfx = f"AlignM.{mod}"
            out[f"{pfx}.proj_q.weight"] = a(d["proj_q"]["kernel"]).transpose(3, 2, 0, 1)
            out[f"{pfx}.proj_q.bias"] = a(d["proj_q"]["bias"])
            out[f"{pfx}.conv_offset.0.weight"] = a(d["off_conv1"]["kernel"]).transpose(3, 2, 0, 1)
            out[f"{pfx}.conv_offset.0.bias"] = a(d["off_conv1"]["bias"])
            out[f"{pfx}.conv_offset.2.weight"] = a(d["off_dw"]["kernel"]).transpose(3, 2, 0, 1)
            out[f"{pfx}.conv_offset.2.bias"] = a(d["off_dw"]["bias"])
            out[f"{pfx}.conv_offset.4.weight"] = a(d["off_out"]["kernel"]).transpose(3, 2, 0, 1)
    return out


def save_reference_signal_checkpoint(params: Dict[str, Any],
                                     bn_state: Dict[str, Any],
                                     spec, path: str) -> None:
    """torch.save the exported state dict (keys per the reference model)."""
    import torch

    sd = export_reference_signal_state_dict(params, bn_state, spec)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
