"""SIM parity: our vectorized token selection vs a direct torch
transcription of the published algorithm (paper eqs. (5)-(18)), written
here with explicit per-sample loops.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from signal_tpu.models.sim import init_sim_params, sim_forward, token_selection  # noqa: E402


def _torch_reference_masks(patches, cls, wq, bq, wk, bk, k):
    """Per-sample-loop reimplementation of the selection algorithm.

    patches: [B, 3, L, D] torch; cls: [B, 3, D]. Returns union mask [B, 3, L].
    """
    B, M, L, D = patches.shape
    k1, k2 = k, 2 * k
    scale = float(np.sqrt(D))

    # intra-modal: softmax(CLS·patchᵀ/√D) → top-k1
    intra = torch.zeros(B, M, L)
    for m in range(M):
        s = torch.softmax((cls[:, m : m + 1] @ patches[:, m].transpose(1, 2)).squeeze(1) / scale, dim=1)
        _, idx = torch.topk(s, min(k1, L), dim=1)
        for i in range(B):
            intra[i, m, idx[i]] = 1

    # inter-modal: project, softmax over concat 3L, exclude own modality
    q = cls @ wq.T + bq                       # [B, 3, D]
    keys = patches.reshape(B, M * L, D) @ wk.T + bk
    scores = torch.softmax((q @ keys.transpose(1, 2)) / scale, dim=2)  # [B, 3, 3L]

    inter = torch.zeros(B, M, L)
    others = [(1, 2), (0, 2), (0, 1)]
    for m in range(M):
        a, b = others[m]
        cross = torch.cat([scores[:, m, a * L : (a + 1) * L],
                           scores[:, m, b * L : (b + 1) * L]], dim=1)
        _, idx = torch.topk(cross, min(k2, 2 * L), dim=1)
        for i in range(B):
            for j in idx[i]:
                j = int(j)
                if j < L:
                    inter[i, a, j] = 1
                else:
                    inter[i, b, j - L] = 1

    return ((intra + inter) > 0).float()


def test_token_selection_masks_match_loop_reference():
    rng = np.random.default_rng(0)
    B, L, D, k = 3, 16, 8, 5
    patches = rng.standard_normal((B, 3, L, D)).astype(np.float32)
    cls = rng.standard_normal((B, 3, D)).astype(np.float32)

    params = init_sim_params(jax.random.PRNGKey(0), D)
    sel = params["select"]
    wq = torch.tensor(np.asarray(sel["W_q"]["kernel"]).T)
    bq = torch.tensor(np.asarray(sel["W_q"]["bias"]))
    wk = torch.tensor(np.asarray(sel["W_k"]["kernel"]).T)
    bk = torch.tensor(np.asarray(sel["W_k"]["bias"]))

    ref = _torch_reference_masks(torch.tensor(patches), torch.tensor(cls), wq, bq, wk, bk, k)

    selected, masks = token_selection(jnp.asarray(patches), jnp.asarray(cls), sel, k=k)
    np.testing.assert_array_equal(np.asarray(masks), ref.numpy())
    # selected patches = patches ⊙ mask (zeroed, not removed)
    np.testing.assert_allclose(
        np.asarray(selected), patches * ref.numpy()[..., None], rtol=1e-6)


def test_exact_keep_ratio_counts():
    rng = np.random.default_rng(1)
    B, L, D, k = 4, 16, 8, 6
    patches = rng.standard_normal((B, 3, L, D)).astype(np.float32)
    cls = rng.standard_normal((B, 3, D)).astype(np.float32)
    params = init_sim_params(jax.random.PRNGKey(1), D)

    for ratio in (0.25, 0.5, 0.75):
        _, masks = token_selection(jnp.asarray(patches), jnp.asarray(cls),
                                   params["select"], k=k, keep_ratio=ratio)
        counts = np.asarray(masks).sum(-1)
        assert (counts == int(L * ratio)).all()


def test_exact_keep_trim_keeps_highest_scored_selected():
    """When trimming, survivors must be the top-scored among the selected."""
    from signal_tpu.ops.topk_mask import exact_keep

    scores = jnp.asarray([[5.0, 4.0, 3.0, 2.0, 1.0, 0.0]])
    mask = jnp.asarray([[0.0, 1.0, 1.0, 1.0, 1.0, 0.0]])
    out = np.asarray(exact_keep(mask, scores, 2))[0]
    np.testing.assert_array_equal(out, [0, 1, 1, 0, 0, 0])


def test_exact_keep_fill_adds_highest_scored_unselected():
    from signal_tpu.ops.topk_mask import exact_keep

    scores = jnp.asarray([[5.0, 4.0, 3.0, 2.0, 1.0, 0.0]])
    mask = jnp.asarray([[0.0, 0.0, 0.0, 0.0, 1.0, 0.0]])
    out = np.asarray(exact_keep(mask, scores, 3))[0]
    # keeps the already-selected idx 4, fills with best unselected (0, 1)
    np.testing.assert_array_equal(out, [1, 1, 0, 0, 1, 0])


def test_sim_fused_output_matches_torch_mhca():
    """Full SIM vs torch: selection masks (checked above) + MHCA block."""
    rng = np.random.default_rng(2)
    B, L, D, k = 2, 12, 16, 4
    patches = rng.standard_normal((B, 3, L, D)).astype(np.float32)
    cls = rng.standard_normal((B, 3, D)).astype(np.float32)
    params = init_sim_params(jax.random.PRNGKey(2), D)

    fused, _ = sim_forward(params, jnp.asarray(patches), jnp.asarray(cls),
                           k=k, compute_dtype=jnp.float32)

    # torch side
    sel = params["select"]
    wq = torch.tensor(np.asarray(sel["W_q"]["kernel"]).T)
    bq = torch.tensor(np.asarray(sel["W_q"]["bias"]))
    wk = torch.tensor(np.asarray(sel["W_k"]["kernel"]).T)
    bk = torch.tensor(np.asarray(sel["W_k"]["bias"]))
    mask = _torch_reference_masks(torch.tensor(patches), torch.tensor(cls), wq, bq, wk, bk, k)
    tsel = torch.tensor(patches) * mask[..., None]

    inter = params["interact"]
    mhca = torch.nn.MultiheadAttention(D, 8, batch_first=True)
    with torch.no_grad():
        mhca.in_proj_weight.copy_(torch.tensor(np.asarray(inter["cross_attn"]["qkv_kernel"]).T))
        mhca.in_proj_bias.copy_(torch.tensor(np.asarray(inter["cross_attn"]["qkv_bias"])))
        mhca.out_proj.weight.copy_(torch.tensor(np.asarray(inter["cross_attn"]["out_kernel"]).T))
        mhca.out_proj.bias.copy_(torch.tensor(np.asarray(inter["cross_attn"]["out_bias"])))

        queries = torch.tensor(cls)
        kv = tsel.reshape(B, 3 * L, D)
        attn, _ = mhca(queries, kv, kv, need_weights=False)
        x = F.layer_norm(queries + attn, (D,),
                         torch.tensor(np.asarray(inter["norm1"]["scale"])),
                         torch.tensor(np.asarray(inter["norm1"]["bias"])))
        h = x @ torch.tensor(np.asarray(inter["ffn"]["fc1"]["kernel"])) + torch.tensor(np.asarray(inter["ffn"]["fc1"]["bias"]))
        h = F.gelu(h)
        h = h @ torch.tensor(np.asarray(inter["ffn"]["fc2"]["kernel"])) + torch.tensor(np.asarray(inter["ffn"]["fc2"]["bias"]))
        x = F.layer_norm(x + h, (D,),
                         torch.tensor(np.asarray(inter["norm2"]["scale"])),
                         torch.tensor(np.asarray(inter["norm2"]["bias"])))
        ref = torch.cat([x[:, 0], x[:, 1], x[:, 2]], dim=1).numpy()

    np.testing.assert_allclose(np.asarray(fused), ref, rtol=2e-4, atol=2e-5)
