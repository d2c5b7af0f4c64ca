"""Mixture-of-Experts MLP (Switch/GShard style) for the ViT blocks.

The reference ships a ``MoE_Loss_weight`` knob with no consumer
(`config/defaults.py:28` in maxingan2412/Signal — declared, never read).
This module gives it an object: ``MODEL.MOE_EXPERTS > 1`` swaps each CLIP
block's dense MLP for a top-k routed expert MLP, and the aux
load-balance loss it emits is weighted by that knob.

TPU-first formulation (the GShard/Mesh-TF einsum dispatch — not a
gather/scatter port):

* **static shapes everywhere** — fixed expert capacity ``C`` per token
  group; routing builds one-hot dispatch/combine tensors and the whole
  layer is five einsums the MXU eats directly. No sorting, no ragged
  buffers, no data-dependent control flow under ``jit``.
* **grouped dispatch** — tokens are routed within their own image row
  ([G, L, d] with L = 129), so the dispatch einsum is linear in batch
  and only quadratic in the small per-image token count (same scaling
  as attention). Capacity is per group: ``C = ceil(cf · k · L / E)``.
* **expert parallelism** — the expert axis of both the stacked weights
  ([E, ...], `parallel/mesh.py::_spec_for`) and the dispatched
  activations ([G, E, C, d], ``moe_constrain``) shards over the mesh's
  'model' axis; GSPMD derives the all-to-all from the annotations.
* dropped tokens (over capacity) contribute zero — the block's residual
  stream carries them unchanged, the standard Switch behavior.

Router runs in fp32 (softmax numerics); expert matmuls in the compute
dtype with fp32 accumulation like every other matmul in the tower.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from signal_tpu.ops.attention import quick_gelu, trunc_normal


def init_moe_params(key, width: int, hidden: int, num_experts: int,
                    dtype=jnp.float32):
    """One block's MoE MLP: router [d, E] + expert-stacked dense weights.

    Experts use the same trunc-normal init as the dense MLP they replace
    (`models/vit.py::init_mlp`), drawn independently per expert."""
    kr, kf, kp = jax.random.split(key, 3)
    return {
        "router": trunc_normal(kr, (width, num_experts), 0.02, jnp.float32),
        "fc_kernel": trunc_normal(kf, (num_experts, width, hidden), 0.02, dtype),
        "fc_bias": jnp.zeros((num_experts, hidden), dtype),
        "proj_kernel": trunc_normal(kp, (num_experts, hidden, width), 0.02, dtype),
        "proj_bias": jnp.zeros((num_experts, width), dtype),
    }


def upcycle_dense_mlp(mlp_params, num_experts: int):
    """Sparse-upcycling init (Komatsuzaki et al.): tile a trained dense
    MLP into every expert. Used when loading a dense CLIP checkpoint
    into an MoE tower — the router stays at its fresh init, so step 0
    computes the dense model (normalized gates make identical experts
    sum to the dense MLP; only over-capacity drops deviate)."""
    tile = lambda a: jnp.broadcast_to(a[None], (num_experts,) + a.shape)  # noqa: E731
    return {
        "fc_kernel": tile(mlp_params["fc_kernel"]),
        "fc_bias": tile(mlp_params["fc_bias"]),
        "proj_kernel": tile(mlp_params["proj_kernel"]),
        "proj_bias": tile(mlp_params["proj_bias"]),
    }


def moe_capacity(group_len: int, num_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Per-group expert capacity C (static)."""
    return max(1, int(math.ceil(capacity_factor * top_k * group_len
                                / num_experts)))


def _route(probs: jnp.ndarray, top_k: int, capacity: int
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """probs [G, S, E] → (combine [G, S, E, C], top1_mask [G, S, E]).

    Iterative top-k (argmax, mask, repeat) with per-group capacity:
    earlier-k choices get slot priority, and within one k tokens take
    slots in row order (cumsum — deterministic, no RNG). Gates are
    normalized over the selected experts (Mixtral-style), so with k=1
    the kept tokens pass at weight exactly 1.0."""
    G, S, E = probs.shape
    remaining = probs
    onehots, gates = [], []
    for _ in range(top_k):
        idx = jnp.argmax(remaining, axis=-1)                      # [G, S]
        oh = jax.nn.one_hot(idx, E, dtype=probs.dtype)            # [G, S, E]
        gates.append(jnp.sum(remaining * oh, axis=-1))            # [G, S]
        remaining = remaining * (1.0 - oh)
        onehots.append(oh)
    denom = sum(gates) + 1e-9
    if top_k == 1:
        # k=1 normalization is p/(p+eps): forward exactly 1.0 (an
        # upcycled tower reproduces the dense model at step 0) but with
        # ~zero derivative w.r.t. the router prob — routing would learn
        # only from the aux load-balance loss, never from the task loss.
        # Straight-through normalization keeps the 1.0 forward and
        # restores d(gate)/dp = 1/sg(p) so the task loss trains the
        # router (Switch's raw gate=p gradient direction, unit-scaled).
        denom = jax.lax.stop_gradient(denom)
    gates = [g / denom for g in gates]

    combine = jnp.zeros((G, S, E, capacity), probs.dtype)
    offset = jnp.zeros((G, 1, E), probs.dtype)                    # slots used
    for oh, gate in zip(onehots, gates):
        pos_in_e = jnp.cumsum(oh, axis=1) - oh + offset           # [G, S, E]
        pos = jnp.sum(pos_in_e * oh, axis=-1)                     # [G, S]
        # one_hot is all-zero for pos >= capacity → over-capacity tokens
        # drop out of combine (and of the gate) automatically
        poh = jax.nn.one_hot(pos.astype(jnp.int32), capacity,
                             dtype=probs.dtype)                   # [G, S, C]
        combine = combine + jnp.einsum("gse,gsc->gsec", oh * gate[..., None], poh)
        offset = offset + jnp.sum(oh, axis=1, keepdims=True)
    return combine, onehots[0]


def moe_mlp(params, x: jnp.ndarray, *, top_k: int = 1,
            capacity_factor: float = 1.25,
            compute_dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x [G, S, d] (post-ln_2 tokens, grouped by image row) →
    (y [G, S, d] fp32-accumulated then cast back, aux scalar fp32).

    aux is the Switch load-balance loss E·Σ_e f_e·P_e over ALL tokens
    (f_e: fraction top-1-routed to e; P_e: mean router prob) — 1.0 at
    perfect balance, larger when skewed. Weighted upstream by
    MODEL.MoE_Loss_weight."""
    from jax.ad_checkpoint import checkpoint_name

    from signal_tpu.parallel.mesh import moe_constrain

    G, S, d = x.shape
    E = params["router"].shape[-1]
    C = moe_capacity(S, E, top_k, capacity_factor)
    compute_dtype = jnp.dtype(compute_dtype)
    if (compute_dtype == jnp.bfloat16
            and jax.default_backend() not in ("tpu", "axon")):
        # XLA:CPU's DotThunk has no BF16×BF16→F32 kernel for these rank-4
        # batched dots (the dense tower's rank-3 dots lower differently);
        # upcast the whole layer there. TPU keeps bf16 operands with f32
        # MXU accumulation — the fast path this branch exists to protect.
        compute_dtype = jnp.dtype(jnp.float32)

    logits = jnp.einsum("gsd,de->gse", x.astype(jnp.float32),
                        params["router"])                          # fp32
    probs = jax.nn.softmax(logits, axis=-1)
    combine, top1 = _route(probs, top_k, C)                       # [G,S,E,C]
    dispatch = (combine > 0).astype(compute_dtype)

    # NOTE remat: under the default full-remat policy the backward replays
    # this whole layer, including the dispatch/combine all-to-alls GSPMD
    # derives from moe_constrain — accepted (standard full-remat
    # semantics: nothing is saved, everything replays). The named saves
    # below let the selective 'attn'/'attn_mlp' policies (`models/vit.py`)
    # keep the dispatched tensors instead, skipping the replayed
    # collectives at the cost of [G,E,C,·] bf16 residents.
    xc = x.astype(compute_dtype)
    expert_in = jnp.einsum("gsec,gsd->gecd", dispatch, xc,
                           preferred_element_type=jnp.float32)
    expert_in = checkpoint_name(
        moe_constrain(expert_in.astype(compute_dtype)), "moe_dispatch")
    h = jnp.einsum("gecd,edh->gech", expert_in,
                   params["fc_kernel"].astype(compute_dtype),
                   preferred_element_type=jnp.float32)
    h = quick_gelu(h + params["fc_bias"].astype(jnp.float32)[None, :, None, :])
    h = checkpoint_name(
        moe_constrain(h.astype(compute_dtype)), "moe_hidden")
    out_e = jnp.einsum("gech,ehd->gecd", h,
                       params["proj_kernel"].astype(compute_dtype),
                       preferred_element_type=jnp.float32)
    out_e = out_e + params["proj_bias"].astype(jnp.float32)[None, :, None, :]
    out_e = moe_constrain(out_e.astype(compute_dtype))
    y = jnp.einsum("gsec,gecd->gsd", combine.astype(compute_dtype), out_e,
                   preferred_element_type=jnp.float32)

    f = jnp.mean(top1.astype(jnp.float32), axis=(0, 1))           # [E]
    p = jnp.mean(probs, axis=(0, 1))                              # [E]
    aux = E * jnp.sum(f * p)
    return y, aux
