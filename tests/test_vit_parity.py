"""Whole-tower golden test: our CLIP ViT vs an inline torch transcription
(conv patch embed → CLS+pos → ln_pre → pre-LN blocks with QuickGELU MLP →
ln_post → proj; SIE on CLS), weights copied from our init.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from signal_tpu.models.vit import init_vit_params, resize_pos_embed, vit_forward  # noqa: E402


def _torch_clip_vit(params, images, cv_emb, num_heads):
    g = lambda *path: torch.tensor(  # noqa: E731
        np.asarray(_get(params, path)))

    def _get(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    x = torch.tensor(images)
    kernel = g("conv1", "kernel").permute(3, 2, 0, 1)  # HWIO → OIHW
    x = F.conv2d(x, kernel, stride=kernel.shape[-1])
    B, width = x.shape[0], x.shape[1]
    x = x.reshape(B, width, -1).permute(0, 2, 1)
    cls = g("class_embedding").expand(B, 1, width).clone()
    if cv_emb is not None:
        cls = cls + torch.tensor(np.asarray(cv_emb))[:, None, :]
    x = torch.cat([cls, x], dim=1)
    x = x + g("positional_embedding")[None]

    def ln(p_scale, p_bias, t):
        return F.layer_norm(t, (t.shape[-1],), p_scale, p_bias)

    x = ln(g("ln_pre", "scale"), g("ln_pre", "bias"), x)

    blocks = params["blocks"]
    n_layers = np.asarray(blocks["ln_1"]["scale"]).shape[0]
    for i in range(n_layers):
        bi = lambda *path: torch.tensor(np.asarray(_get(blocks, path))[i])  # noqa: E731
        h = ln(bi("ln_1", "scale"), bi("ln_1", "bias"), x)
        qkv = h @ bi("attn", "qkv_kernel") + bi("attn", "qkv_bias")
        q, k, v = qkv.chunk(3, dim=-1)
        hd = width // num_heads

        def split(t):
            return t.reshape(B, -1, num_heads, hd).transpose(1, 2)

        attn = torch.softmax(split(q) @ split(k).transpose(-2, -1) / hd ** 0.5, dim=-1)
        o = (attn @ split(v)).transpose(1, 2).reshape(B, -1, width)
        x = x + o @ bi("attn", "out_kernel") + bi("attn", "out_bias")
        h = ln(bi("ln_2", "scale"), bi("ln_2", "bias"), x)
        h = h @ bi("mlp", "fc_kernel") + bi("mlp", "fc_bias")
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        x = x + h @ bi("mlp", "proj_kernel") + bi("mlp", "proj_bias")

    x = ln(g("ln_post", "scale"), g("ln_post", "bias"), x)
    x = x @ g("proj")
    return x[:, 1:], x[:, 0]


def test_clip_vit_tower_matches_torch():
    h, w, width, heads = 4, 2, 32, 4
    params = init_vit_params(jax.random.PRNGKey(0), h_resolution=h,
                             w_resolution=w, width=width, layers=3,
                             output_dim=16)
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 3, h * 16, w * 16)).astype(np.float32)
    cv = rng.standard_normal((2, width)).astype(np.float32)

    ref_p, ref_c = _torch_clip_vit(params, imgs, cv, heads)
    ours_p, ours_c = vit_forward(params, jnp.asarray(imgs), jnp.asarray(cv),
                                 num_heads=heads, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours_c), ref_c.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours_p), ref_p.numpy(), rtol=2e-4, atol=2e-4)


def test_resize_pos_embed_matches_torch_interpolate():
    rng = np.random.default_rng(1)
    pos = rng.standard_normal((14 * 14 + 1, 8)).astype(np.float32)
    tpos = torch.tensor(pos)
    grid = tpos[1:].reshape(1, 14, 14, 8).permute(0, 3, 1, 2)
    grid = F.interpolate(grid, size=(16, 8), mode="bilinear")
    ref = torch.cat([tpos[:1], grid.permute(0, 2, 3, 1).reshape(1, 128, 8)[0]], dim=0)
    ours = resize_pos_embed(jnp.asarray(pos), 16, 8)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_return_intermediate_consistency():
    params = init_vit_params(jax.random.PRNGKey(2), h_resolution=4,
                             w_resolution=2, width=32, layers=3, output_dim=16)
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.standard_normal((2, 3, 64, 32)), jnp.float32)
    p, c = vit_forward(params, imgs, num_heads=4, compute_dtype=jnp.float32)
    x_last, x_post, x_proj = vit_forward(params, imgs, num_heads=4,
                                         compute_dtype=jnp.float32,
                                         return_intermediate=True)
    np.testing.assert_allclose(np.asarray(x_proj[:, 1:]), np.asarray(p), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x_proj[:, 0]), np.asarray(c), rtol=1e-5)
    assert x_last.shape == (2, 9, 32) and x_post.shape == (2, 9, 32)


def test_bf16_stream_close_to_fp32():
    """bf16 residual stream (production dtype) tracks the fp32 tower."""
    params = init_vit_params(jax.random.PRNGKey(3), h_resolution=4,
                             w_resolution=2, width=64, layers=3, output_dim=32)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.standard_normal((2, 3, 64, 32)), jnp.float32)
    p32, c32 = vit_forward(params, imgs, num_heads=4, compute_dtype=jnp.float32)
    p16, c16 = vit_forward(params, imgs, num_heads=4, compute_dtype=jnp.bfloat16)
    # bf16 has ~2-3 decimal digits; activations are O(1)
    np.testing.assert_allclose(np.asarray(c16), np.asarray(c32), atol=0.15, rtol=0.1)
    assert np.isfinite(np.asarray(p16)).all()


def test_adapter_branch_changes_output():
    import dataclasses

    from signal_tpu.models.signal_model import ModelSpec, init_signal_params, forward_eval
    from signal_tpu.config import Config

    cfg = Config()
    cfg.MODEL.ADAPTER = True
    cfg.MODEL.USE_A = False
    cfg.MODEL.USE_B = False
    spec = ModelSpec.from_config(cfg, num_classes=4, camera_num=2)
    assert spec.adapter
    spec = dataclasses.replace(spec, layers=2, width=32, feat_dim=16,
                               num_heads=4, h=4, w=2, use_flash=False,
                               compute_dtype="float32")
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    assert "adapter" in params["base"]["blocks"]
    rng = np.random.default_rng(0)
    imgs = {m: jnp.asarray(rng.standard_normal((2, 3, 64, 32)), jnp.float32)
            for m in ("RGB", "NI", "TI")}
    cams = jnp.zeros((2,), jnp.int32)
    out = forward_eval(params, bn, imgs, cams, spec)
    assert out.shape == (2, 48)
    # zeroing the adapter up-projection recovers... a different output
    z = jax.tree.map(lambda x: x, params)
    z["base"]["blocks"]["adapter"]["up_kernel"] = jnp.zeros_like(
        z["base"]["blocks"]["adapter"]["up_kernel"])
    out2 = forward_eval(z, bn, imgs, cams, spec)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_remat_policies_same_values_and_grads():
    """'full' / 'dots' / 'attn' / 'attn_mlp' / 'half' only trade memory
    for recompute — values and gradients must be identical."""
    params = init_vit_params(jax.random.PRNGKey(5), h_resolution=4,
                             w_resolution=2, width=64, layers=2, output_dim=32)
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.standard_normal((2, 3, 64, 32)), jnp.float32)

    def loss(p, policy):
        patches, cls = vit_forward(p, imgs, num_heads=4,
                                   compute_dtype=jnp.float32,
                                   remat=True, remat_policy=policy)
        return jnp.sum(cls ** 2) + jnp.sum(patches ** 2)

    ref_v, ref_g = jax.value_and_grad(lambda p: loss(p, "full"))(params)
    for policy in ("dots", "attn", "attn_mlp", "half"):
        v, g = jax.value_and_grad(lambda p: loss(p, policy))(params)
        np.testing.assert_allclose(float(v), float(ref_v), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


def test_scan_unroll_same_values_and_grads():
    """MODEL.SCAN_UNROLL only changes how the 12-block loop is laid out
    in HLO (rolled while-loop vs unrolled slices) — values and gradients
    must match. fp32 compute so reduction reorder stays under 1e-5."""
    params = init_vit_params(jax.random.PRNGKey(7), h_resolution=4,
                             w_resolution=2, width=64, layers=4, output_dim=32)
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.standard_normal((2, 3, 64, 32)), jnp.float32)

    def loss(p, unroll, policy="full"):
        patches, cls = vit_forward(p, imgs, num_heads=4,
                                   compute_dtype=jnp.float32,
                                   remat=True, remat_policy=policy,
                                   unroll=unroll)
        return jnp.sum(cls ** 2) + jnp.sum(patches ** 2)

    ref_v, ref_g = jax.value_and_grad(lambda p: loss(p, 1))(params)
    for unroll, policy in ((2, "full"), (4, "full"), (4, "half")):
        v, g = jax.value_and_grad(lambda p: loss(p, unroll, policy))(params)
        np.testing.assert_allclose(float(v), float(ref_v), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
