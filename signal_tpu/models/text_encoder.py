"""CLIP text tower + CLIP-ReID prompt learner.

Behavioral mirror of `modeling/make_model_clipreid.py:34-246` and the text
half of `modeling/clip/model.py` (maxingan2412/Signal):

* text transformer: token embedding → +positional embedding → 12 causal
  pre-LN blocks (QuickGELU MLP) → ln_final → take the EOT token's state →
  @ text_projection;
* PromptLearner: "A photo of a X X X X person/vehicle." with the four X
  slots replaced by per-class learned context vectors; prefix/suffix come
  from the frozen token embedding of the template.
"""

from __future__ import annotations

from typing import Dict, Tuple

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


def causal_mask(n: int) -> jnp.ndarray:
    """CLIP's additive causal mask (upper triangle −inf)."""
    m = jnp.full((n, n), -jnp.inf, jnp.float32)
    return jnp.triu(m, k=1)


def init_text_params(key, *, width: int = 512, layers: int = 12,
                     vocab_size: int = 49408, context_length: int = 77,
                     embed_dim: int = 512, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    blocks = []
    for bk in jax.random.split(ks[2], layers):
        k1, k2, k3 = jax.random.split(bk, 3)
        blocks.append({
            "ln_1": init_layer_norm(width, dtype),
            "attn": init_mha(k1, width, dtype),
            "ln_2": init_layer_norm(width, dtype),
            "mlp": {
                "fc_kernel": trunc_normal(k2, (width, 4 * width), 0.02, dtype),
                "fc_bias": jnp.zeros((4 * width,), dtype),
                "proj_kernel": trunc_normal(k3, (4 * width, width), 0.02, dtype),
                "proj_bias": jnp.zeros((width,), dtype),
            },
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "token_embedding": 0.02 * jax.random.normal(ks[0], (vocab_size, width), dtype),
        "positional_embedding": 0.01 * jax.random.normal(ks[1], (context_length, width), dtype),
        "blocks": stacked,
        "ln_final": init_layer_norm(width, dtype),
        "text_projection": width ** -0.5 * jax.random.normal(ks[3], (width, embed_dim), dtype),
    }


def text_forward(params, prompts: jnp.ndarray, tokenized: jnp.ndarray,
                 *, num_heads: int = 8, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """prompts [B, 77, width] (already-embedded), tokenized [B, 77] int ids
    → text features [B, embed_dim]. EOT position = argmax of ids
    (`make_model_clipreid.py:52`)."""
    x = prompts.astype(jnp.float32) + params["positional_embedding"].astype(jnp.float32)[None]
    mask = causal_mask(x.shape[1])

    def body(carry, layer_params):
        h = carry + mha(layer_params["attn"], layer_norm(layer_params["ln_1"], carry),
                        num_heads=num_heads, compute_dtype=compute_dtype, mask=mask)
        m = layer_norm(layer_params["ln_2"], h)
        m = quick_gelu(linear(layer_params["mlp"]["fc_kernel"],
                              layer_params["mlp"]["fc_bias"], m, compute_dtype))
        m = linear(layer_params["mlp"]["proj_kernel"],
                   layer_params["mlp"]["proj_bias"], m, compute_dtype)
        return h + m, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(params["ln_final"], x)
    eot = jnp.argmax(tokenized, axis=-1)
    pooled = x[jnp.arange(x.shape[0]), eot]
    return jnp.dot(pooled.astype(compute_dtype),
                   params["text_projection"].astype(compute_dtype),
                   preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------
# PromptLearner
# --------------------------------------------------------------------------

N_CTX = 4       # template context "A photo of a"
N_CLS_CTX = 4   # learned per-class slots (the X X X X)


def init_prompt_learner(key, num_classes: int, dataset_name: str,
                        token_embedding: jnp.ndarray, tokenizer) -> Dict:
    """Build frozen prefix/suffix embeddings + learned per-class ctx."""
    noun = "vehicle" if dataset_name in ("VehicleID", "veri", "RGBNT100",
                                         "MSVR310") else "person"
    template = f"A photo of a X X X X {noun}."
    tokenized = jnp.asarray(tokenizer.tokenize(template))     # [1, 77]
    embedded = token_embedding[tokenized[0]]                   # [77, width]
    ctx_dim = token_embedding.shape[-1]
    cls_ctx = 0.02 * jax.random.normal(key, (num_classes, N_CLS_CTX, ctx_dim),
                                       jnp.float32)
    return {
        "cls_ctx": cls_ctx,                                     # learned
        "token_prefix": embedded[: N_CTX + 1],                  # frozen buffer
        "token_suffix": embedded[N_CTX + 1 + N_CLS_CTX:],       # frozen buffer
        "tokenized": tokenized[0],
    }


def prompt_forward(prompt_params, labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """labels [B] → (prompts [B, 77, width], tokenized [B, 77])."""
    B = labels.shape[0]
    cls_ctx = prompt_params["cls_ctx"][labels]                  # [B, 4, D]
    prefix = jnp.broadcast_to(prompt_params["token_prefix"][None],
                              (B,) + prompt_params["token_prefix"].shape)
    suffix = jnp.broadcast_to(prompt_params["token_suffix"][None],
                              (B,) + prompt_params["token_suffix"].shape)
    prompts = jnp.concatenate([prefix, cls_ctx, suffix], axis=1)
    tokenized = jnp.broadcast_to(prompt_params["tokenized"][None], (B, prompt_params["tokenized"].shape[0]))
    return prompts, tokenized


def load_clip_text_params(sd: Dict, layers: int = 12, tokenizer=None) -> Dict:
    """CLIP state_dict text half → pytree (same layout as init_text_params).

    Pretrained text weights are only meaningful against OpenAI token ids:
    raises if the tokenizer in play (the given one, or the default
    resolution when None) is the byte-fallback vocabulary — silent id
    mismatch would make every prompt embed garbage rows."""
    from signal_tpu.models.tokenizer import resolve_bpe_path

    fallback = (not tokenizer.has_merges if tokenizer is not None
                else resolve_bpe_path() is None)
    if fallback:
        raise ValueError(
            "Loading pretrained CLIP text weights with a byte-fallback "
            "tokenizer vocabulary: token ids will not match the tower's "
            "embedding rows. Provide bpe_simple_vocab_16e6.txt.gz via "
            "ClipTokenizer(bpe_path=...) or SIGNAL_TPU_BPE_PATH (the "
            "vendored signal_tpu/models/data/ copy is missing).")
    g = lambda k: jnp.asarray(sd[k])  # noqa: E731

    def stack(fmt, transpose=False):
        arrs = []
        for i in range(layers):
            a = jnp.asarray(sd[f"transformer.resblocks.{i}.{fmt}"])
            arrs.append(a.T if transpose else a)
        return jnp.stack(arrs)

    return {
        "token_embedding": g("token_embedding.weight"),
        "positional_embedding": g("positional_embedding"),
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
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
        "text_projection": g("text_projection"),
    }
