"""LoRA — low-rank adaptation factors for the ViT towers.

The reference ships a LoRA library (`modeling/clip/LoRA.py` in
maxingan2412/Signal: LoRA Linear/Embedding/MergedLinear and
``mark_only_lora_as_trainable``) used when MODEL.FROZEN=True. The
TPU-native equivalent is functional: a parallel pytree of (A, B) factors
per adapted kernel; the effective weight is W + (A @ B) · (alpha / r).
Freezing happens in the optimizer mask (`signal_tpu.solver`), not by
mutating modules.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def init_lora_factors(key, params: Dict[str, Any], *, rank: int = 8,
                      alpha: float = 16.0,
                      target_suffixes=("qkv_kernel", "fc_kernel", "proj_kernel",
                                       "out_kernel")) -> Dict[str, Any]:
    """Build a LoRA tree mirroring ``params`` with {'A','B'} at each
    adapted 2-D (or stacked 3-D) kernel leaf. Non-adapted subtrees are
    PRUNED (not None-padded) so the result is a clean pytree of only the
    adapter factors — it plugs into the optimizer/sharding machinery as
    ``params['lora']`` without structure-mismatch special cases.

    A: kaiming-uniform init; B: zeros (adapter starts as identity),
    matching the reference's LoRA_Linear.reset_parameters (`LoRA.py`).
    """

    def rec(node, path, k):
        if isinstance(node, dict):
            out = {}
            for i, (name, child) in enumerate(node.items()):
                sub = rec(child, f"{path}.{name}", jax.random.fold_in(k, i))
                if sub is not None:
                    out[name] = sub
            return out or None
        if any(path.endswith(suf) for suf in target_suffixes) and node.ndim >= 2:
            *lead, din, dout = node.shape
            bound = 1.0 / max(din, 1) ** 0.5
            a = jax.random.uniform(k, (*lead, din, rank), jnp.float32, -bound, bound)
            b = jnp.zeros((*lead, rank, dout), jnp.float32)
            return {"lora_A": a, "lora_B": b, "lora_scale": jnp.asarray(alpha / rank)}
        return None

    return rec(params, "", key) or {}


def apply_lora(params: Dict[str, Any], lora: Dict[str, Any]) -> Dict[str, Any]:
    """Return params with LoRA deltas merged: W' = W + A @ B · scale."""

    def rec(p, l):
        if isinstance(p, dict):
            return {k: rec(p[k], l.get(k) if isinstance(l, dict) else None)
                    for k in p}
        if isinstance(l, dict) and "lora_A" in l:
            delta = jnp.matmul(l["lora_A"], l["lora_B"],
                               precision=jax.lax.Precision.HIGHEST)
            return p + l["lora_scale"] * delta.astype(p.dtype)
        return p

    return rec(params, lora or {})
