"""Pallas fused-attention kernel numerics (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from signal_tpu.ops.attention import _attention_core
from signal_tpu.ops.flash_attention import flash_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape),
                       jnp.float32)


def test_kernel_matches_xla_core_fp32():
    B, L, D, H = 3, 9, 32, 4
    q, k, v = _rand((B, L, D), 0), _rand((B, L, D), 1), _rand((B, L, D), 2)
    want = _attention_core(q, k, v, H, compute_dtype=jnp.float32)
    got = flash_attention(q, k, v, num_heads=H, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_kernel_matches_xla_core_bf16():
    B, L, D, H = 2, 16, 64, 8
    q, k, v = _rand((B, L, D), 3), _rand((B, L, D), 4), _rand((B, L, D), 5)
    want = _attention_core(q, k, v, H, compute_dtype=jnp.bfloat16)
    got = flash_attention(q, k, v, num_heads=H, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_kernel_cross_attention_shapes():
    # SIM's MHCA shape: 3 queries attending over 3L keys
    B, Lq, Lk, D, H = 4, 3, 24, 64, 8
    q = _rand((B, Lq, D), 6)
    k, v = _rand((B, Lk, D), 7), _rand((B, Lk, D), 8)
    want = _attention_core(q, k, v, H, compute_dtype=jnp.float32)
    got = flash_attention(q, k, v, num_heads=H, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_kernel_gradients_match_xla():
    B, L, D, H = 2, 8, 32, 4
    q, k, v = _rand((B, L, D), 9), _rand((B, L, D), 10), _rand((B, L, D), 11)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, num_heads=H,
                                       compute_dtype=jnp.float32) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_attention_core(q, k, v, H,
                                       compute_dtype=jnp.float32) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_kernel_gradients_bf16_track_fp32():
    """bf16 training path: kernel grads stay close to the fp32 truth."""
    B, L, D, H = 2, 8, 32, 4
    q, k, v = _rand((B, L, D), 12), _rand((B, L, D), 13), _rand((B, L, D), 14)

    def loss(fn, dt):
        return lambda q, k, v: jnp.sum(
            fn(q, k, v, num_heads=H, compute_dtype=dt).astype(jnp.float32) ** 2)

    g16 = jax.grad(loss(flash_attention, jnp.bfloat16), argnums=(0, 1, 2))(q, k, v)
    g32 = jax.grad(loss(_attention_core_wrap, jnp.float32), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g16, g32):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.15, rtol=0.1)


def _attention_core_wrap(q, k, v, *, num_heads, compute_dtype):
    return _attention_core(q, k, v, num_heads, compute_dtype=compute_dtype)


def test_column_block_shapes():
    """_pick_col_block: 128-divisible head groups, full-D fallback."""
    from signal_tpu.ops.flash_attention import _pick_col_block

    assert _pick_col_block(768, 64) == 128    # ViT-B: 2 heads per block
    assert _pick_col_block(384, 64) == 128    # small ViT: 2 heads
    assert _pick_col_block(768, 128) == 128   # hd already lane-sized
    assert _pick_col_block(384, 96) == 384    # 96*k hits 384 before 128|cb
    assert _pick_col_block(360, 60) == 360    # no 128-divisible group


def test_flash_attention_odd_head_dims():
    """Head dims that don't pack into 128 lanes fall back to full-D
    blocks and still match the XLA core."""
    for (D, H) in ((360, 6), (384, 4), (256, 4)):
        B, L = 2, 9
        q, k, v = (_rand((B, L, D), 20 + i) for i in range(3))
        out = flash_attention(q, k, v, num_heads=H,
                              compute_dtype=jnp.float32)
        ref = _attention_core(q, k, v, H, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)
