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


def flash_attention_flops(spec, batch_size: int, *, train: bool = False) -> float:
    """Analytic MXU-matmul FLOPs of the Pallas fused-attention calls in one
    Signal forward (and backward when ``train``) — XLA's cost model is
    blind through custom calls, so these must be added by hand.

    Per ViT layer over R = 3·B token rows of length L = h·w+1, width D:
      forward kernel  = 2 matmuls (QKᵀ, PV)              = 4·R·L²·D
      backward kernel = 5 matmuls (S, dV, dP, dQ, dK)    = 10·R·L²·D
    (`signal_tpu/ops/flash_attention.py:43-61,100-138`). With per-block
    rematerialization the forward kernel runs again inside the backward.
    """
    if not spec.use_flash:
        return 0.0
    R = 3 * batch_size
    L = spec.h * spec.w + 1
    D = spec.width
    fwd = 4.0 * R * L * L * D * spec.layers
    if not train:
        return fwd
    bwd = 2.5 * fwd
    remat = fwd if spec.remat else 0.0
    return fwd + bwd + remat


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


def signal_analytic_flops(spec, batch_size: int, *, train: bool = False) -> float:
    """Analytic matmul/conv FLOPs (2·MACs) of one Signal forward — and of
    one full train step when ``train`` (backward = 2× the forward matmul
    FLOPs; per-block remat replays the forward once more).

    Needed because XLA's ``cost_analysis`` counts a ``lax.scan`` body ONCE
    (the While loop's trip count is invisible to it) and sees nothing
    inside Pallas custom calls — it under-reports the 12-layer ViT by ~8×.
    Cross-check: ViT-B/16 ≈ 17.6 GMACs at 197 tokens ⇒ 24·W²·T·12 here.
    """
    if spec.backbone == "resnet":
        fwd = _resnet_analytic_flops(spec, batch_size)
        # resnet path has no per-block remat: fwd + bwd(2x)
        return fwd if not train else fwd * 3.0
    W, D, depth = spec.width, spec.feat_dim, spec.layers
    L = spec.h * spec.w
    T = L + 1
    R = 3 * batch_size                                  # encoder rows
    conv = 2.0 * (spec.patch_size ** 2 * 3) * W * L      # patch embed
    per_layer = 24.0 * W * W * T                         # qkv+out+fc+proj
    attn = 4.0 * T * T * W                               # QKᵀ + PV
    proj = 2.0 * W * D * T                               # ln_post proj
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
    # fwd + backward (2×) + remat replay (1×)
    return fwd * (4.0 if spec.remat else 3.0)


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
