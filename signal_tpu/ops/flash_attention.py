"""Fused attention Pallas kernel for short sequences (ViT's 129 tokens).

The reference's attention is stock ``nn.MultiheadAttention`` over ≤131
tokens (`modeling/clip/model.py:223-231` in maxingan2412/Signal). On TPU
the win is fusing QKᵀ → softmax → PV into one VMEM-resident kernel: at
L≈129/384 the [L, L] probability tile (≤66 KB fp32) never touches HBM.

Kernel shape notes (v5e, measured):

* matmuls run on **bf16 inputs with fp32 accumulation** — an fp32-input
  dot runs at ~1/8 the MXU rate and made the first version of this
  kernel lose to XLA's fused attention;
* TPU grid programs execute **sequentially** on the core, so one program
  per (batch, head) = 4608 tiny pipelines at the bench shape; instead
  each program processes a tile of T batch rows × a 128-lane group of
  heads as batched dot_generals;
* **no head transpose**: operands stay in the [B, L, D] layout the
  projections produce; heads are addressed by blocking the feature dim
  (grid axis picks a 128-wide column group = 2 heads at hd=64, looped
  inside the kernel with static lane slices). The round-1 layout
  ([B·H, L, hd] via reshape+transpose) cost ~2.8 ms of pure layout-copy
  per operand per step AND forced 64-lane VMEM tiling; removing it took
  the eval forward 1312 → 1950 samples/s (46% → 68% MFU);
* softmax stays fp32 on the VPU (parity with the fp32-LayerNorm AMP
  regime); sequences this short need no online-softmax streaming — the
  whole [T, L, L] tile fits VMEM.

Backward: a second fused kernel per tile — recompute P in VMEM, then the
five-matmul gradient algebra (dV = Pᵀg, dS = P∘(dP − rowsum(dP∘P)),
dQ/dK) without materializing [L, L] in HBM either direction.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, hd: int):
    # block [T, L, CB] covers CB//hd heads; loop them with static lane
    # slices (Mosaic requires the block's lane dim to be 128-divisible,
    # so a per-head 64-lane block is not expressible directly)
    for s in range(q_ref.shape[-1] // hd):
        q = q_ref[:, :, s * hd:(s + 1) * hd]   # [T, L, hd] compute dtype
        k = k_ref[:, :, s * hd:(s + 1) * hd]
        v = v_ref[:, :, s * hd:(s + 1) * hd]
        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                              # [T, L, Lk] fp32
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            probs.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, s * hd:(s + 1) * hd] = o.astype(o_ref.dtype)


def _pick_tile(n: int, preferred: int = 16) -> int:
    for t in (preferred, 8, 4, 2, 1):
        if n % t == 0:
            return t
    return 1


def _pick_col_block(D: int, hd: int) -> int:
    """Lane-dim block: smallest multiple of hd that is 128-divisible and
    divides D (Mosaic's lane constraint); falls back to the full D."""
    cb = hd
    while cb % 128 != 0:
        cb += hd
    return cb if D % cb == 0 else D


def _fused_attention_fwd_impl(q, k, v, num_heads):
    """q [B, Lq, D], k/v [B, Lk, D] → [B, Lq, D] (q's dtype).

    Heads are addressed by BLOCKING the feature dim (grid axis h picks
    columns [h·hd, (h+1)·hd)) instead of reshape+transpose to
    [B, H, L, hd] — the profile showed those transposes as pure
    [B, H, L, hd]-layout copies at ~2.8 ms each on the train step."""
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    scale = 1.0 / math.sqrt(hd)
    CB = _pick_col_block(D, hd)
    T = _pick_tile(B, preferred=16 if CB <= 256 else 4)

    grid = (B // T, D // CB)
    kern = functools.partial(_attn_kernel, scale=scale, hd=hd)
    # interpret mode lets the CPU test suite validate kernel numerics
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Lq, D), q.dtype),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((T, Lq, CB), lambda i, h: (i, 0, h)),
            pl.BlockSpec((T, Lk, CB), lambda i, h: (i, 0, h)),
            pl.BlockSpec((T, Lk, CB), lambda i, h: (i, 0, h)),
        ],
        out_specs=pl.BlockSpec((T, Lq, CB), lambda i, h: (i, 0, h)),
    )(q, k, v)
    return out


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                     *, scale: float, hd: int):
    """Fused attention backward for one (batch-tile, head-group) block.

    Per head: recompute P = softmax(scale·QKᵀ) in VMEM, then
      dV = Pᵀ·g,  dP = g·Vᵀ,  dS = P∘(dP − rowsum(dP∘P)),
      dQ = scale·dS·K,  dK = scale·dSᵀ·Q
    — five MXU matmuls, softmax algebra fp32 on the VPU, nothing in HBM
    but the inputs and the three gradients."""
    bt = (((2,), (2,)), ((0,), (0,)))          # contract last dims, batch 0
    for s in range(q_ref.shape[-1] // hd):
        sl = slice(s * hd, (s + 1) * hd)
        q = q_ref[:, :, sl]                    # [T, L, hd]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        g = g_ref[:, :, sl]
        logits = jax.lax.dot_general(
            q, k, bt, preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)      # [T, L, Lk] fp32
        pc = p.astype(v.dtype)
        # dV = Pᵀ g : contract the q-length dim of both
        dv = jax.lax.dot_general(
            pc, g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # dP = g Vᵀ
        dp = jax.lax.dot_general(
            g, v, bt, preferred_element_type=jnp.float32)   # [T, L, Lk]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsc = ds.astype(q.dtype)
        # dQ = scale · dS K : contract Lk
        dq = jax.lax.dot_general(
            dsc, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        # dK = scale · dSᵀ Q : contract Lq
        dk = jax.lax.dot_general(
            dsc, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _fused_attention_bwd_impl(q, k, v, g, num_heads):
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    scale = 1.0 / math.sqrt(hd)
    CB = _pick_col_block(D, hd)
    T = _pick_tile(B, preferred=16 if CB <= 256 else 4)
    grid = (B // T, D // CB)

    kern = functools.partial(_attn_bwd_kernel, scale=scale, hd=hd)
    interpret = jax.default_backend() not in ("tpu", "axon")
    spec_q = pl.BlockSpec((T, Lq, CB), lambda i, h: (i, 0, h))
    spec_k = pl.BlockSpec((T, Lk, CB), lambda i, h: (i, 0, h))
    dq, dk, dv = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((B, Lq, D), q.dtype),
            jax.ShapeDtypeStruct((B, Lk, D), k.dtype),
            jax.ShapeDtypeStruct((B, Lk, D), v.dtype),
        ),
        grid=grid,
        in_specs=[spec_q, spec_k, spec_k, spec_q],
        out_specs=(spec_q, spec_k, spec_k),
        interpret=interpret,
    )(q, k, v, g)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention(q, k, v, num_heads):
    return _fused_attention_fwd_impl(q, k, v, num_heads)


def _fwd(q, k, v, num_heads):
    return _fused_attention_fwd_impl(q, k, v, num_heads), (q, k, v)


def _bwd(num_heads, res, g):
    q, k, v = res
    return _fused_attention_bwd_impl(q, k, v, g.astype(q.dtype), num_heads)


_fused_attention.defvjp(_fwd, _bwd)


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _lane_compatible(D: int, hd: int) -> bool:
    """Mosaic requires the block's lane (last) dim to be 128-divisible;
    `_pick_col_block` can fall back to a full-D block that violates it
    (e.g. D=360). Interpret mode (CPU tests) accepts any width."""
    return _pick_col_block(D, hd) % 128 == 0


def _mesh_sharded_attention(q, k, v, num_heads: int, mesh) -> jnp.ndarray:
    """Run the fused kernel sharded over the device mesh via shard_map.

    GSPMD cannot see into a Pallas custom call, so under ANY multi-device
    mesh the unwrapped kernel would be computed replicated (all-gathered
    operands) — wasting the mesh. shard_map splits the batch over 'data'
    and, because heads are independent, the feature dim over 'model'
    into per-shard head groups (each 128-divisible at 2-way TP on the
    768-wide ViT: 384 columns = 6 heads); every shard runs the kernel —
    forward AND custom-vjp backward — on its local [B/dp, L, D/tp]
    block with zero collectives. This replaces the round-2 behavior of
    force-disabling the kernel whenever PARALLEL.MODEL_AXIS > 1 (which
    cost ~40% eval throughput in the repo's own flagship TP mode)."""
    tp = mesh.shape["model"]
    spec = jax.sharding.PartitionSpec("data", None, "model")
    local = functools.partial(_fused_attention, num_heads=num_heads // tp)
    fn = jax.shard_map(lambda a, b, c: local(a, b, c), mesh=mesh,
                       in_specs=(spec, spec, spec), out_specs=spec,
                       check_vma=False)
    return fn(q, k, v)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    num_heads: int, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Post-projection fused attention. q [B, Lq, D], k/v [B, Lk, D].
    Inputs arrive fp32 from the projections; matmuls run in
    ``compute_dtype`` (softmax always fp32 inside the kernel). No head
    reshape/transpose happens outside the kernel — heads are a grid
    axis over the feature columns.

    Routing: under an active ('data','model') mesh with MODEL_AXIS > 1
    the kernel runs per-shard via shard_map (head groups over 'model');
    shapes the Mosaic lane constraint cannot express (per-shard width
    not 128-divisible, e.g. 4-way TP on a 768-wide ViT) fall back to
    the XLA attention core, which GSPMD partitions natively."""
    cd = jnp.dtype(compute_dtype)
    q, k, v = q.astype(cd), k.astype(cd), v.astype(cd)
    D = q.shape[-1]
    hd = D // num_heads

    from signal_tpu.parallel.mesh import active_mesh, in_local_shard

    # inside a manual shard_map body (the pipeline stage program) the
    # operands are already per-shard — run the local kernel directly
    mesh = active_mesh()
    multi = mesh is not None and mesh.size > 1 and not in_local_shard()
    if multi:
        tp = int(mesh.shape.get("model", 1))
        if ({"data", "model"} <= set(mesh.axis_names)
                and num_heads % tp == 0 and D % tp == 0
                and q.shape[0] % mesh.shape["data"] == 0
                and _lane_compatible(D // tp, hd)):
            return _mesh_sharded_attention(q, k, v, num_heads, mesh)
        # mesh/shape the kernel can't shard (missing axes, indivisible
        # batch, or a per-shard width Mosaic's lane rule can't express)
        # → XLA fused attention, which GSPMD partitions natively
        from signal_tpu.ops.attention import _attention_core

        return _attention_core(q, k, v, num_heads, compute_dtype=cd)
    if _on_tpu() and not _lane_compatible(D, hd):
        # latent Mosaic compile failure (full-D fallback block with a
        # non-128-divisible lane dim) → use the XLA core instead
        from signal_tpu.ops.attention import _attention_core

        return _attention_core(q, k, v, num_heads, compute_dtype=cd)
    return _fused_attention(q, k, v, num_heads)
