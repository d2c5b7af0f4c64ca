"""FLOPs / cost accounting via XLA's own cost analysis.

The reference counts FLOPs with fvcore and a hand-maintained op table
(`modeling/backbones/basic_cnn_params/flops.py`, `Signal.flops()` in
maxingan2412/Signal). On TPU the compiler already knows: jit-compile the
forward and read ``cost_analysis()`` — exact for the fused executable,
no op table to maintain.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """Compile ``fn(*args)`` and return XLA's cost analysis dict
    (keys incl. 'flops', 'bytes accessed', ...)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):
        costs = costs[0]
    return dict(costs or {})


def flash_attention_flops(spec, batch_size: int, *, train: bool = False,
                          hardware: bool = False) -> float:
    """Analytic MXU-matmul FLOPs of the Pallas fused-attention calls in one
    Signal forward (and backward when ``train``) — XLA's cost model is
    blind through custom calls, so these must be added by hand.

    Per ViT layer over R = 3·B token rows of length L = h·w+1, width D:
      forward kernel  = 2 matmuls (QKᵀ, PV)              = 4·R·L²·D
      backward kernel = 4 gradient matmuls (dV, dP, dQ, dK) = 8·R·L²·D,
      plus an in-kernel S recompute (2·R·L²·D) that is hardware work,
      not model work
    (`signal_tpu/ops/flash_attention.py:50-71,123-164`).

    ``train`` counts model FLOPs (MFU numerator: fwd + useful bwd = 3×fwd).
    ``hardware`` additionally counts recomputation — the in-kernel S
    replay and, when ``spec.remat``, the per-block forward replay — i.e.
    the HFU numerator.
    """
    if not spec.use_flash:
        return 0.0
    R = 3 * batch_size
    L = spec.h * spec.w + 1
    D = spec.width
    fwd = 4.0 * R * L * L * D * spec.layers
    if not train:
        return fwd
    total = 3.0 * fwd                       # fwd + 4 useful bwd matmuls
    if hardware:
        total += 0.5 * fwd                  # in-kernel S recompute
        if spec.remat:
            # per-block remat replay (same policy factors as
            # ``signal_analytic_flops``; partial-save policies → 0)
            total += {"full": 1.0, "half": 0.5}.get(spec.remat_policy,
                                                    0.0) * fwd
    return total


def _resnet_analytic_flops(spec, batch_size: int) -> float:
    """Conv matmul FLOPs (2·MACs) of one 3-modal bottleneck-ResNet eval
    forward (last-stride-1). Cross-check: resnet50 at 224×224 with
    standard strides ≈ 4.09 GMACs."""
    from signal_tpu.models.resnet import EXPANSION, RESNET_BLOCK_COUNTS

    counts = RESNET_BLOCK_COUNTS[spec.layers]
    R = 3 * batch_size
    H, W = spec.img_h, spec.img_w
    fl = 2.0 * (7 * 7 * 3) * 64 * (H // 2) * (W // 2)    # stem
    h, w = H // 4, W // 4                                 # after maxpool
    cin = 64
    widths = (64, 128, 256, 512)
    for si, (wd, n) in enumerate(zip(widths, counts)):
        stride = 1 if si == 0 else (1 if si == 3 else 2)  # last_stride=1
        for bi in range(n):
            s = stride if bi == 0 else 1
            ho, wo = h // s, w // s
            fl += 2.0 * cin * wd * h * w                  # conv1 1x1 (pre-stride)
            fl += 2.0 * 9 * wd * wd * ho * wo             # conv2 3x3
            fl += 2.0 * wd * (wd * EXPANSION) * ho * wo   # conv3 1x1
            if bi == 0:
                fl += 2.0 * cin * (wd * EXPANSION) * ho * wo  # downsample
            cin = wd * EXPANSION
            h, w = ho, wo
    return R * fl


def _osnet_analytic_flops(spec, batch_size: int) -> float:
    """Conv matmul FLOPs (2·MACs) of one 3-modal OSNet eval forward.
    Cross-check: osnet_x1_0 at 256×128 ≈ 0.98 GMACs/image."""
    from signal_tpu.models.osnet import OSNET_BY_FEAT_DIM, OSNET_LAYERS

    channels = OSNET_BY_FEAT_DIM[spec.feat_dim]
    R = 3 * batch_size
    H, W = spec.image_size
    fl = 2.0 * (7 * 7 * 3) * channels[0] * (H // 2) * (W // 2)   # stem
    h, w = H // 4, W // 4                                        # after maxpool
    cin = channels[0]
    for si, cout in enumerate(channels[1:]):
        mid = cout // 4
        for bi in range(OSNET_LAYERS[si]):
            hw = h * w
            fl += 2.0 * cin * mid * hw                   # conv1 1×1
            # 10 LightConv3x3 across the 4 branches (1+2+3+4):
            fl += 10.0 * (2.0 * mid * mid + 2.0 * 9 * mid) * hw  # pw + dw
            fl += 4.0 * 2.0 * 2 * mid * (mid // 16)      # shared gate ×4
            fl += 2.0 * mid * cout * hw                  # conv3 1×1
            if cin != cout:
                fl += 2.0 * cin * cout * hw              # downsample 1×1
            cin = cout
        if si < 2:                                        # transition
            fl += 2.0 * cout * cout * h * w
            h, w = h // 2, w // 2
    fl += 2.0 * channels[3] * channels[3] * h * w         # conv5 1×1
    return R * fl


def _t2t_stage_flops(spec) -> float:
    """Matmul FLOPs of the T2T soft-split stages + projection for ONE
    image (`signal_tpu/models/t2t.py:125-146`; reference
    `modeling/backbones/t2t.py` soft_split0/1/2 + attention1/2 + project).

    Stage tokens: L0 = (H/4)(W/4) at dim 147, L1 = (H/8)(W/8) at dim 576,
    L2 = (H/16)(W/16) projected 576→embed. token_transformer(dim, in=64,
    mlp_ratio=1): qkv (dim→3·64), single-head attention, 64×64 proj,
    64→64→64 MLP."""
    H, Wd = spec.image_size
    td = 64                                   # token_dim

    def token_tf(L, dim):
        return (2.0 * L * dim * 3 * td        # qkv
                + 4.0 * L * L * td            # QKᵀ + PV (single head)
                + 2.0 * L * td * td           # proj
                + 4.0 * L * td * td)          # MLP fc1+fc2 (hidden=64)

    L0, L1, L2 = (H // 4) * (Wd // 4), (H // 8) * (Wd // 8), (H // 16) * (Wd // 16)
    fl = token_tf(L0, 3 * 49) + token_tf(L1, td * 9)
    fl += 2.0 * L2 * (td * 9) * spec.width    # project 576 → embed
    return fl


def signal_analytic_flops(spec, batch_size: int, *, train: bool = False,
                          hardware: bool = False) -> float:
    """Analytic matmul/conv FLOPs (2·MACs) of one Signal forward — and of
    one full train step when ``train``.

    ``train`` counts MODEL FLOPs: forward + backward = 3× forward (the
    standard MFU numerator — remat recomputation is deliberately NOT
    counted; it is hardware work, not model work). Pass ``hardware=True``
    for the HFU numerator, which adds the per-block remat forward replay.

    Covers all five backbone families: CLIP ViT (output projection,
    mlp_ratio 4), imagenet/deit ViT (no output projection, per-variant
    mlp_ratio, overlap-stride token counts via spec.h/w), T2T
    (soft-split stages counted in ``_t2t_stage_flops``), the
    bottleneck-ResNet family, and OSNet.

    Needed because XLA's ``cost_analysis`` counts a ``lax.scan`` body ONCE
    (the While loop's trip count is invisible to it) and sees nothing
    inside Pallas custom calls — it under-reports the 12-layer ViT by ~8×.
    Cross-check: ViT-B/16 ≈ 17.6 GMACs at 197 tokens ⇒ 24·W²·T·12 here.
    """
    # backward replay fraction of one forward, by remat policy. Exact for
    # 'full' (every block recomputed) and 'half' (6 of 12 blocks); the
    # save-something policies ('dots'/'attn'/'attn_mlp') replay only part
    # of each block — not modeled, so their HFU is reported equal to MFU
    # (a lower bound). The flagship default is 'full'.
    _replay_by_policy = {"full": 1.0, "half": 0.5}
    replay = (_replay_by_policy.get(spec.remat_policy, 0.0)
              if (train and hardware and spec.remat) else 0.0)
    if spec.backbone in ("resnet", "osnet"):
        fwd = (_resnet_analytic_flops(spec, batch_size)
               if spec.backbone == "resnet"
               else _osnet_analytic_flops(spec, batch_size))
        # CNN paths have no per-block remat either way: fwd + bwd(2x)
        return fwd if not train else fwd * 3.0
    W, D, depth = spec.width, spec.feat_dim, spec.layers
    L = spec.h * spec.w
    T = L + 1
    R = 3 * batch_size                                  # encoder rows
    if spec.backbone == "t2t":
        conv = _t2t_stage_flops(spec)                    # soft-split stages
    else:
        conv = 2.0 * (spec.patch_size ** 2 * 3) * W * L  # patch embed conv
    # qkv+out (8·W²·T) + MLP fc+proj (4·mlp_ratio·W²·T); = 24·W²·T at r=4
    per_layer = (8.0 + 4.0 * spec.mlp_ratio) * W * W * T
    attn = 4.0 * T * T * W                               # QKᵀ + PV
    # only the CLIP tower has an output projection (ln_post @ proj);
    # imagenet/t2t feat dim == width (`vit_pytorch.py` Trans has no proj)
    proj = 2.0 * W * D * T if spec.backbone == "clip" else 0.0
    fwd = R * (conv + depth * (per_layer + attn) + proj)
    if spec.use_a:
        # SIM: W_q/W_k projections, selection scores, MHCA (3 q × 3L kv), FFN
        fwd += batch_size * (
            2.0 * D * D * (3 + 3 * L)                    # W_q + W_k
            + 2.0 * 3 * (3 * L) * D                      # selection scores
            + 2.0 * D * 3 * D * (3 + 3 * L)              # MHCA qkv proj
            + 4.0 * 3 * (3 * L) * D                      # MHCA attn matmuls
            + 2.0 * D * D * 3                            # MHCA out proj
            + 2.0 * 3 * (2 * D * 2 * D))                 # FFN 2 linears
    if not train:
        return fwd
    # model FLOPs: fwd + backward (2×); + remat replay only under hardware
    return fwd * (3.0 + replay)


def model_flops(spec, params, bn_state, batch_size: int = 1) -> float:
    """FLOPs (raw, not giga) of one Signal eval forward: XLA's own cost
    accounting (mirrors `Signal.flops()`) plus the analytic count for the
    Pallas attention custom calls XLA cannot see into.

    NOTE: under-counts scanned layers (see ``signal_analytic_flops``,
    which is the number MFU reporting should use)."""
    import jax.numpy as jnp

    from signal_tpu.models.signal_model import forward_eval

    ih, iw = spec.image_size
    imgs = {m: jnp.zeros((batch_size, 3, ih, iw), jnp.float32)
            for m in ("RGB", "NI", "TI")}
    cam = jnp.zeros((batch_size,), jnp.int32)
    costs = cost_analysis(
        lambda p, s, x, c: forward_eval(p, s, x, c, spec),
        params, bn_state, imgs, cam)
    return float(costs.get("flops", 0.0)) + flash_attention_flops(
        spec, batch_size, train=False)


# peak dense-bf16 FLOP/s per chip by device kind (public TPU specs)
_PEAK_FLOPS = (
    ("v6", 918e12),       # Trillium / v6e
    ("v5p", 459e12),
    ("v5", 197e12),       # v5e ("TPU v5 lite")
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def peak_flops_per_chip(default: float = 197e12) -> float:
    """Best-effort peak bf16 FLOP/s of the attached chip (for MFU)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return default
    for tag, peak in _PEAK_FLOPS:
        if tag in kind:
            return peak
    return default


def param_count(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
