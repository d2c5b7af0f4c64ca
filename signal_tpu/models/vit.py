"""CLIP ViT-B/16 vision tower, TPU-first.

Behavioral mirror of the reference's CLIP ``VisionTransformer``
(`modeling/clip/model.py:419-488` in maxingan2412/Signal) with the
camera SIE embedding applied to the CLS token
(`meta_arch.py:96-112`, `clip/model.py:454-456`):

  conv 16×16/16 patch embed (no bias) → [CLS] + pos-embed → ln_pre →
  12 × pre-LN (MHA → +res → MLP(QuickGELU) → +res) → ln_post → proj 768→512

TPU-first choices:
* the 12 blocks run as one ``lax.scan`` over stacked parameters (compact
  HLO, fast compiles, weight layout friendly to tensor-parallel sharding);
* all three modalities are batched into one encoder call upstream
  ([3B, …] instead of 3 sequential calls, `make_model.py:181-183`) —
  numerically identical because weights are shared and LN/attention are
  per-sample;
* matmuls in bf16 with fp32 accumulation; LN/softmax fp32 (the reference's
  fp16-safe LayerNorm, `clip/model.py:154-160`).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from signal_tpu.ops.attention import (
    init_layer_norm,
    init_mha,
    layer_norm,
    linear,
    mha,
    quick_gelu,
    trunc_normal,
)


def init_vit_params(
    key,
    *,
    h_resolution: int,
    w_resolution: int,
    patch_size: int = 16,
    width: int = 768,
    layers: int = 12,
    output_dim: int = 512,
    adapter: bool = False,
    moe_experts: int = 0,
    dtype=jnp.float32,
):
    """Random init (CLIP checkpoints overwrite these in practice).

    ``moe_experts > 1``: every block's dense MLP becomes a routed
    expert MLP (`ops/moe.py`) — the blocks stack carries 'moe' instead
    of 'mlp' (router + [E, ...] expert weights per layer)."""
    keys = jax.random.split(key, 8)
    scale = width ** -0.5
    n_tokens = h_resolution * w_resolution + 1

    block_keys = jax.random.split(keys[6], layers)
    attn = [init_mha(k, width, dtype) for k in block_keys]
    mlp_keys = jax.random.split(keys[7], layers)

    def init_mlp(k):
        k1, k2 = jax.random.split(k)
        return {
            "fc_kernel": trunc_normal(k1, (width, 4 * width), 0.02, dtype),
            "fc_bias": jnp.zeros((4 * width,), dtype),
            "proj_kernel": trunc_normal(k2, (4 * width, width), 0.02, dtype),
            "proj_bias": jnp.zeros((width,), dtype),
        }

    def stack(trees):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    ln_unit = lambda: init_layer_norm(width, dtype)  # noqa: E731
    blocks = {
        "ln_1": stack([ln_unit() for _ in range(layers)]),
        "attn": stack(attn),
        "ln_2": stack([ln_unit() for _ in range(layers)]),
    }
    if moe_experts and moe_experts > 1:
        from signal_tpu.ops.moe import init_moe_params

        blocks["moe"] = stack([
            init_moe_params(k, width, 4 * width, moe_experts, dtype)
            for k in mlp_keys])
    else:
        blocks["mlp"] = stack([init_mlp(k) for k in mlp_keys])
    if adapter:
        blocks["adapter"] = stack([
            init_adapter_params(k, width, dtype)
            for k in jax.random.split(keys[4], layers)])
    return {
        "conv1": {"kernel": trunc_normal(keys[0], (patch_size, patch_size, 3, width), scale, dtype)},
        "class_embedding": scale * jax.random.normal(keys[1], (width,), dtype),
        "positional_embedding": scale * jax.random.normal(keys[2], (n_tokens, width), dtype),
        "ln_pre": ln_unit(),
        "blocks": blocks,
        "ln_post": ln_unit(),
        "proj": scale * jax.random.normal(keys[3], (width, output_dim), dtype),
    }


def _block(params, x, *, num_heads: int, compute_dtype, use_flash: bool,
           moe_topk: int = 1, moe_capacity: float = 1.25):
    from jax.ad_checkpoint import checkpoint_name

    dt = x.dtype  # residual stream dtype (bf16 ≙ the reference's fp16 autocast)
    attn_out = mha(
        params["attn"],
        layer_norm(params["ln_1"], x),
        num_heads=num_heads,
        compute_dtype=compute_dtype,
        use_flash=use_flash,
    ).astype(dt)
    # named for selective remat policies ('attn' / 'attn_mlp'): saving
    # these [3B, L, D]-bf16 tensors is cheap and skips recomputing the
    # attention (and optionally the MLP fc) during the backward replay
    x = x + checkpoint_name(attn_out, "attn_out")
    if "moe" in params:
        # MODEL.MOE_EXPERTS: routed expert MLP instead of the dense one;
        # returns (tokens, load-balance aux) — the scan in vit_forward
        # accumulates the aux across layers
        from signal_tpu.ops.moe import moe_mlp

        h, aux = moe_mlp(params["moe"], layer_norm(params["ln_2"], x),
                         top_k=moe_topk, capacity_factor=moe_capacity,
                         compute_dtype=compute_dtype)
        return x + h.astype(dt), aux
    h = layer_norm(params["ln_2"], x)
    # bf16 hidden: the [.., L, 4W] tensor crosses HBM at half the bytes
    # (f32 accumulation + f32 bias happen before the cast; the next
    # matmul consumes bf16 regardless)
    h = quick_gelu(linear(params["mlp"]["fc_kernel"], params["mlp"]["fc_bias"],
                          h, compute_dtype, out_dtype=compute_dtype))
    h = checkpoint_name(h, "mlp_hidden")
    h = linear(params["mlp"]["proj_kernel"], params["mlp"]["proj_bias"], h, compute_dtype)
    if "adapter" in params:
        # MambaPro parallel adapter (`clip/model.py:206-209,233-237`):
        # x = x + mlp(ln2 x) + adapter(x), adapter = d→d/2→QuickGELU→d
        a = quick_gelu(linear(params["adapter"]["down_kernel"],
                              params["adapter"]["down_bias"], x, compute_dtype))
        a = linear(params["adapter"]["up_kernel"], params["adapter"]["up_bias"],
                   a, compute_dtype)
        h = h + a
    return x + h.astype(dt)


def init_adapter_params(key, width: int, dtype=jnp.float32):
    """MODEL.ADAPTER branch params for one block (stack per layer)."""
    k1, k2 = jax.random.split(key)
    half = width // 2
    return {
        "down_kernel": trunc_normal(k1, (width, half), 0.02, dtype),
        "down_bias": jnp.zeros((half,), dtype),
        "up_kernel": trunc_normal(k2, (half, width), 0.02, dtype),
        "up_bias": jnp.zeros((width,), dtype),
    }


def embed_patches(params, images: jnp.ndarray, cv_emb=None, *,
                  stride: int | None = None,
                  compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """CLIP-tower preamble: conv patch embed → CLS (+SIE) → pos embed →
    ln_pre. Returns [B, 1+L, width] fp32. Shared by the plain and the
    MambaPro-prompted forwards."""
    B = images.shape[0]
    kernel = params["conv1"]["kernel"]
    patch = kernel.shape[0]
    stride = stride or patch
    compute_dtype = jnp.dtype(compute_dtype)
    # bf16 in/out (fp32 accumulation happens inside the MXU); avoid
    # preferred_element_type here — its conv-transpose grad rule rejects
    # mixed bf16/fp32 operands.
    x = jax.lax.conv_general_dilated(
        images.astype(compute_dtype),
        kernel.astype(compute_dtype),
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    ).astype(jnp.float32)  # [B, width, h, w]
    width = x.shape[1]
    x = x.reshape(B, width, -1).transpose(0, 2, 1)  # [B, L, width]

    cls_tok = jnp.broadcast_to(params["class_embedding"].astype(jnp.float32), (B, 1, width))
    if cv_emb is not None:
        cls_tok = cls_tok + cv_emb[:, None, :].astype(jnp.float32)
    x = jnp.concatenate([cls_tok, x], axis=1)
    x = x + params["positional_embedding"].astype(jnp.float32)[None]
    return layer_norm(params["ln_pre"], x)


def vit_forward(
    params,
    images: jnp.ndarray,
    cv_emb: jnp.ndarray | None = None,
    *,
    num_heads: int = 12,
    compute_dtype=jnp.bfloat16,
    use_flash: bool = False,
    return_intermediate: bool = False,
    remat: bool = True,
    remat_policy: str = "full",
    stride: int | None = None,
    unroll: int = 1,
    pipe_stages: int = 1,
    pipe_microbatches: int = 0,
    sequence_parallel: bool = False,
    moe_topk: int = 1,
    moe_capacity: float = 1.25,
) -> Tuple[jnp.ndarray, ...]:
    """images [B, 3, H, W] → (patch_tokens [B, L, out], cls [B, out]).

    When the blocks carry an MoE MLP ('moe' in params['blocks'],
    MODEL.MOE_EXPERTS > 1) the return gains a trailing load-balance aux
    scalar (mean over layers): (..., moe_aux).

    ``stride``: patch-embed conv stride (MODEL.STRIDE_SIZE; the reference
    supports overlapping patches, `clip/model.py:433`). Defaults to the
    patch size (non-overlapping).

    ``cv_emb`` [B, width]: SIE camera embedding added to the CLS token only
    (reference `clip/model.py:454-456`).

    ``return_intermediate``: return CLIP-ReID's triple instead —
    (x after layer 11 [B, L+1, width], ln_post output [B, L+1, width],
    projected [B, L+1, out]).
    """
    compute_dtype = jnp.dtype(compute_dtype)
    x = embed_patches(params, images, cv_emb, stride=stride,
                      compute_dtype=compute_dtype)
    # the residual stream rides in the compute dtype between blocks (the
    # reference's autocast keeps it fp16); LN still normalizes in fp32
    x = x.astype(compute_dtype)

    moe = "moe" in params["blocks"]
    raw_fn = lambda lp, h: _block(lp, h, num_heads=num_heads,  # noqa: E731
                                  compute_dtype=compute_dtype,
                                  use_flash=use_flash,
                                  moe_topk=moe_topk,
                                  moe_capacity=moe_capacity)
    if moe:
        block_fn = raw_fn  # returns (tokens, aux)
    else:
        # normalize to the (tokens, aux) contract so every scan/remat/SP
        # branch below is uniform; the constant 0 aux compiles away
        block_fn = lambda lp, h: (raw_fn(lp, h), jnp.float32(0.0))  # noqa: E731
    if remat:
        # scan-over-remat: backward recomputes each block's activations —
        # 12 ViT-B blocks at [3B, 129, 768] fp32 otherwise blow out HBM
        # (measured: 22.7G > 15.75G on v5e at the reference's B=64).
        # full remat beats dots_saveable here (fp32 stream: 208.8 vs 183.8
        # samples/s on v5e: at 129 tokens the recompute is cheaper than the
        # HBM traffic of saving per-dot activations). Re-measured at the
        # bf16 stream with an interleaved single-process A/B
        # (scripts/bench_remat_ab.py): full 471.2 vs attn 469.1 — tie,
        # 'full' stays default; see DESIGN.md remat table.
        if remat_policy == "dots":
            block_fn = jax.checkpoint(
                block_fn,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        elif remat_policy == "attn":
            # save each block's attention output ([3B, L, D] bf16 — cheap):
            # the backward replay recomputes only LN + MLP. On MoE towers
            # also save the dispatched expert inputs, so the replay skips
            # the dispatch all-to-all GSPMD derives from moe_constrain
            block_fn = jax.checkpoint(
                block_fn,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "moe_dispatch"))
        elif remat_policy == "attn_mlp":
            # additionally save the GELU'd MLP hidden ([3B, L, 4D] fp32)
            # (MoE: the post-GELU expert hidden, same role)
            block_fn = jax.checkpoint(
                block_fn,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "mlp_hidden", "moe_dispatch", "moe_hidden"))
        elif remat_policy == "half":
            # remat only the FIRST half of the blocks (backward replays
            # 6 of 12 instead of all 12 → half the recompute FLOPs); the
            # un-remat'd tail stores its internals — fits when full
            # activations almost fit (the no-remat step needs ~22.7 GB
            # vs 15.75 GB on v5e; half is ~love-seat sized)
            pass  # handled below — needs two scan segments
        else:
            block_fn = jax.checkpoint(block_fn)

    unwrapped_fn = block_fn  # pre-SP (used by the 'half' branch below)
    sequence_constrain = None
    if sequence_parallel:
        # PARALLEL.SEQUENCE (Megatron-SP): re-assert the token-sharded
        # layout on every block's output. Outside jax.checkpoint so the
        # constraint (and the collectives GSPMD derives from it) is not
        # replayed in the remat backward.
        from signal_tpu.parallel.mesh import sequence_constrain

        inner_fn = block_fn
        block_fn = lambda lp, h: (  # noqa: E731
            lambda o: (sequence_constrain(o[0]), o[1]))(inner_fn(lp, h))
        x = sequence_constrain(x)

    def body(carry, layer_params):
        nh, aux = block_fn(layer_params, carry)
        return nh, aux

    # MODEL.SCAN_UNROLL: unrolling removes the scan's dynamic-slice/DUS
    # machinery at the cost of an `unroll`× bigger HLO. Measured neutral
    # at ViT-B/129-token shapes (train 468 vs 471 samples/s fully
    # unrolled, 429 at unroll=4 — XLA already overlaps the remat-save
    # copies with compute); kept as a tuning lever for other shapes
    unroll = max(1, int(unroll))
    n_layers = jax.tree.leaves(params["blocks"])[0].shape[0]

    pipe_mesh = None
    if pipe_stages > 1:
        from signal_tpu.parallel.mesh import active_mesh, in_local_shard

        m = active_mesh()
        if (m is not None and not in_local_shard()
                and "pipe" in m.axis_names and m.shape["pipe"] > 1):
            pipe_mesh = m
        # no pipe mesh active (e.g. a single-device parity check of a
        # pipeline config) → the plain scan below is numerically identical

    moe_aux = jnp.float32(0.0)
    if return_intermediate:
        # split the scan so the penultimate layer's output is observable
        # (CLIP-ReID consumes it as `image_features_last`)
        head = jax.tree.map(lambda a: a[: n_layers - 1], params["blocks"])
        tail = jax.tree.map(lambda a: a[n_layers - 1], params["blocks"])
        x_last, auxs = jax.lax.scan(body, x, head,
                                    unroll=min(unroll, n_layers - 1))
        x, aux_tail = block_fn(tail, x_last)
        moe_aux = (jnp.sum(auxs) + aux_tail) / n_layers
    elif pipe_mesh is not None:
        if remat and remat_policy == "half":
            raise ValueError("REMAT_POLICY 'half' does not compose with "
                             "PIPE_AXIS > 1 (stage-local remat is uniform)")
        if moe:
            raise ValueError("MODEL.MOE_EXPERTS > 1 does not compose with "
                             "PIPE_AXIS > 1 (the aux loss and the expert "
                             "all-to-all are not threaded through the "
                             "pipeline ppermute schedule)")
        from signal_tpu.parallel.pipeline import pipeline_blocks

        x = pipeline_blocks(params["blocks"], x,
                            lambda lp, h: block_fn(lp, h)[0], mesh=pipe_mesh,
                            microbatches=pipe_microbatches)
    elif remat and remat_policy == "half":
        # checkpoint the UN-SP-wrapped block and re-apply the sequence
        # constraint outside, so the SP collectives are not replayed in
        # the remat backward (same rule as the policy branches above)
        ckpt_inner = jax.checkpoint(unwrapped_fn)
        if sequence_constrain is not None:
            ckpt_fn = lambda lp, h: (  # noqa: E731
                lambda o: (sequence_constrain(o[0]), o[1]))(ckpt_inner(lp, h))
        else:
            ckpt_fn = ckpt_inner

        def body_ckpt(carry, layer_params):
            nh, aux = ckpt_fn(layer_params, carry)
            return nh, aux

        k = n_layers // 2
        head = jax.tree.map(lambda a: a[:k], params["blocks"])
        tail = jax.tree.map(lambda a: a[k:], params["blocks"])
        x, aux_h = jax.lax.scan(body_ckpt, x, head, unroll=min(unroll, k))  # remat'd half
        x, aux_t = jax.lax.scan(body, x, tail, unroll=min(unroll, n_layers - k))  # stored half
        moe_aux = (jnp.sum(aux_h) + jnp.sum(aux_t)) / n_layers
    else:
        x, auxs = jax.lax.scan(body, x, params["blocks"],
                               unroll=min(unroll, n_layers))
        moe_aux = jnp.sum(auxs) / n_layers

    x_post = layer_norm(params["ln_post"], x)
    x_proj = jnp.dot(
        x_post.astype(compute_dtype),
        params["proj"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if return_intermediate:
        return (x_last, x_post, x_proj, moe_aux) if moe else \
            (x_last, x_post, x_proj)
    if moe:
        return x_proj[:, 1:], x_proj[:, 0], moe_aux
    return x_proj[:, 1:], x_proj[:, 0]


def _bilinear_resize_no_aa(grid: jnp.ndarray, h_new: int, w_new: int) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) semantics:
    half-pixel centers, NO antialiasing on downsample, edge clamping.
    (jax.image.resize antialiases when downsampling — different output.)
    grid: [H, W, C]."""
    H, W, C = grid.shape

    def axis_weights(n_old, n_new):
        out = (jnp.arange(n_new, dtype=jnp.float32) + 0.5) * (n_old / n_new) - 0.5
        i0 = jnp.clip(jnp.floor(out), 0, n_old - 1).astype(jnp.int32)
        i1 = jnp.clip(i0 + 1, 0, n_old - 1)
        frac = jnp.clip(out - jnp.floor(out), 0.0, 1.0)
        frac = jnp.where(out < 0, 0.0, frac)  # edge clamp below 0
        return i0, i1, frac

    y0, y1, fy = axis_weights(H, h_new)
    x0, x1, fx = axis_weights(W, w_new)
    top = grid[y0][:, x0] * (1 - fx)[None, :, None] + grid[y0][:, x1] * fx[None, :, None]
    bot = grid[y1][:, x0] * (1 - fx)[None, :, None] + grid[y1][:, x1] * fx[None, :, None]
    return top * (1 - fy)[:, None, None] + bot * fy[:, None, None]


def resize_pos_embed(posemb: jnp.ndarray, h_new: int, w_new: int) -> jnp.ndarray:
    """Bilinear-resize a square [L+1, width] pos-embed grid to (h_new, w_new).

    Matches the reference's checkpoint-load resize (`clip/model.py:712-729`):
    token 0 kept, grid reshaped to gs×gs, torch-style bilinear
    (align_corners=False, no antialias — width DOWNSAMPLES 14→8 for ReID
    aspect ratios, where antialiased resizers diverge).

    SQUARE SOURCES ONLY (pretrained CLIP/timm grids are 14×14): a flat
    [L, width] tensor carries no layout, so a non-square source cannot be
    resized safely — and a token COUNT match would be ambiguous (196 is
    both 14×14 and 28×7). A TRAINED checkpoint's (possibly non-square)
    grid must be imported verbatim by the caller that knows its layout
    (`clip_loader.clip_visual_to_vit_params(pos_verbatim=True)`).
    """
    tok, grid = posemb[:1], posemb[1:]
    gs_old = int(math.sqrt(grid.shape[0]))
    if gs_old * gs_old != grid.shape[0]:
        raise ValueError(
            f"pos embed has {grid.shape[0]} grid tokens — not a square "
            f"pretrained grid; a trained checkpoint's grid must be imported "
            f"verbatim at its own layout, not resized (checkpoint/config "
            f"image-size mismatch?)")
    width = grid.shape[-1]
    grid = grid.reshape(gs_old, gs_old, width).astype(jnp.float32)
    grid = _bilinear_resize_no_aa(grid, h_new, w_new)
    return jnp.concatenate([tok, grid.reshape(h_new * w_new, width).astype(posemb.dtype)], axis=0)
