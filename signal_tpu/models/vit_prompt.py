"""MambaPro prompt branch for the CLIP tower (MODEL.PROMPT).

Behavioral mirror of `modeling/clip/model.py:298-340` (forward_with_prompt,
maxingan2412/Signal; `forward_with_prompt_adapter` l.342-386 when ADAPTER
is also on): each block appends 3 groups of k=4 prompt tokens —

* the modality's own prompt: layer 0 uses the learned prompt; layer i>0
  uses last_prompt + transfer(last_prompt) + learned prompt, where
  last_prompt is the mean of the three prompt groups of the previous
  block's output;
* two cross-modality prompts: prompt_a + adapter_a(prompt_a), rebuilt
  fresh every layer.

Concat order is modality-specific (rgb: [x, r, n2r, t2r]; nir: [x, r2n,
n, t2n]; tir: [x, r2t, n2t, t]); prompts are stripped after each block.
Because the branch wiring differs per modality, the three streams run as
separate encoder calls (as the reference does) instead of the 3×-batched
fast path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from signal_tpu.models.vit import _block
from signal_tpu.ops.attention import layer_norm, linear, quick_gelu, trunc_normal

K_PROMPT = 4
MODALITY_ORDER = {"rgb": ("own", "n", "t"), "nir": ("r", "own", "t"),
                  "tir": ("r", "n", "own")}


def init_prompt_params(key, width: int, layers: int, dtype=jnp.float32):
    """Per-block prompt tokens + transfer/adapter MLPs (d→d/2→d)."""
    def mlp(k):
        k1, k2 = jax.random.split(k)
        half = width // 2
        return {
            "fc1_kernel": trunc_normal(k1, (layers, width, half), 0.02, dtype),
            "fc1_bias": jnp.zeros((layers, half), dtype),
            "fc2_kernel": trunc_normal(k2, (layers, half, width), 0.02, dtype),
            "fc2_bias": jnp.zeros((layers, width), dtype),
        }

    ks = jax.random.split(key, 8)
    return {
        # reference inits prompts to zeros (`clip/model.py:187-189`)
        "prompt_rgb": jnp.zeros((layers, K_PROMPT, width), dtype),
        "prompt_nir": jnp.zeros((layers, K_PROMPT, width), dtype),
        "prompt_tir": jnp.zeros((layers, K_PROMPT, width), dtype),
        "transfer": mlp(ks[0]),
        "adp_r": mlp(ks[1]),
        "adp_n": mlp(ks[2]),
        "adp_t": mlp(ks[3]),
    }


def _mlp_apply(p, i, x, compute_dtype):
    h = quick_gelu(linear(p["fc1_kernel"][i], p["fc1_bias"][i], x, compute_dtype))
    return linear(p["fc2_kernel"][i], p["fc2_bias"][i], h, compute_dtype)


def prompt_block(params, prompt_params, i: int, x: jnp.ndarray,
                 last_prompt, modality: str, *, num_heads: int,
                 compute_dtype, use_flash: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One prompted block. x [B, L, D]; last_prompt [B, k, D] or None.
    Returns (x without prompts, prompt_current [B, k, D])."""
    B = x.shape[0]
    pp = prompt_params
    k = K_PROMPT

    def expand(tokens_kd):
        return jnp.broadcast_to(tokens_kd[None], (B, k, tokens_kd.shape[-1]))

    own_name = {"rgb": "prompt_rgb", "nir": "prompt_nir", "tir": "prompt_tir"}[modality]
    own = expand(pp[own_name][i])
    if last_prompt is not None:
        own = last_prompt + _mlp_apply(pp["transfer"], i, last_prompt, compute_dtype) + own

    def cross(name, adp):
        p = expand(pp[name][i])
        return p + _mlp_apply(pp[adp], i, p, compute_dtype)

    if modality == "rgb":
        groups = [own, cross("prompt_nir", "adp_n"), cross("prompt_tir", "adp_t")]
    elif modality == "nir":
        groups = [cross("prompt_rgb", "adp_r"), own, cross("prompt_tir", "adp_t")]
    else:
        groups = [cross("prompt_rgb", "adp_r"), cross("prompt_nir", "adp_n"), own]

    # keep the residual stream's dtype (bf16 in production) — the fp32
    # prompt tokens would otherwise promote the whole sequence
    seq = jnp.concatenate([x] + [g.astype(x.dtype) for g in groups], axis=1)
    layer_params = jax.tree.map(lambda a: a[i], params["blocks"])
    seq = _block(layer_params, seq, num_heads=num_heads,
                 compute_dtype=compute_dtype, use_flash=use_flash)
    body, tail = seq[:, : x.shape[1]], seq[:, x.shape[1]:]
    prompt_current = (tail[:, :k] + tail[:, k:2 * k] + tail[:, 2 * k:]) / 3.0
    return body, prompt_current


def vit_forward_prompt(params, prompt_params, images: jnp.ndarray,
                       cv_emb, modality: str, *, num_heads: int = 12,
                       compute_dtype=jnp.bfloat16, use_flash: bool = False,
                       stride: int | None = None,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prompted single-modality forward → (patches, cls) like vit_forward."""
    from signal_tpu.models.vit import embed_patches

    cdt = jnp.dtype(compute_dtype)
    x = embed_patches(params, images, cv_emb, stride=stride, compute_dtype=cdt)
    # bf16 residual stream + per-block remat, same regime as vit_forward
    # (three per-modality prompted streams would otherwise OOM in training)
    x = x.astype(cdt)

    n_layers = jax.tree.leaves(params["blocks"])[0].shape[0]
    last = None
    step = jax.checkpoint(
        lambda x, last, i: prompt_block(params, prompt_params, i, x, last,
                                        modality, num_heads=num_heads,
                                        compute_dtype=cdt,
                                        use_flash=use_flash),
        static_argnums=(2,))
    for i in range(n_layers):
        x, last = step(x, last, i)

    x = layer_norm(params["ln_post"], x)
    x = jnp.dot(x.astype(cdt), params["proj"].astype(cdt),
                preferred_element_type=jnp.float32)
    return x[:, 1:], x[:, 0]
