"""Property tests for top-k tie behavior (SIM token-selection masks).

`lax.top_k` is STABLE: among equal scores it prefers the lowest index,
deterministically. `torch.topk` (the reference's selection primitive,
`useA.py:90,166`) leaves tie order implementation-defined — empirically
its CPU heap picks neither lowest- nor highest-index consistently. The
masks therefore agree EXACTLY whenever the selection boundary is
untied, and any divergence is confined to positions whose score equals
the k-th (boundary) value. These tests pin down both facts so SIM mask
parity claims are airtight: strictly-above-boundary tokens always match
the reference; boundary-tied tokens are an arbitrary choice in torch and
a deterministic one here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from signal_tpu.ops.topk_mask import exact_keep, topk_mask

torch = pytest.importorskip("torch")


def _torch_mask(vals: np.ndarray, k: int) -> np.ndarray:
    _, idx = torch.topk(torch.from_numpy(vals), k)
    m = np.zeros_like(vals)
    m[idx.numpy()] = 1.0
    return m


def test_untied_boundary_masks_match_torch_exactly():
    rng = np.random.default_rng(0)
    for _ in range(300):
        L = int(rng.choice([8, 16]))       # bounded shape set: top_k
        k = int(rng.integers(1, L))        # recompiles per (L, k) pair
        vals = rng.standard_normal(L).astype(np.float32)  # ties ~impossible
        ours = np.asarray(topk_mask(jnp.asarray(vals)[None], k))[0]
        theirs = _torch_mask(vals, k)
        np.testing.assert_array_equal(ours, theirs)


def test_tied_boundary_divergence_is_confined_to_the_tie():
    """With heavy ties: both masks select k positions, agree on every
    strictly-above-boundary position, and differ only among positions
    whose score equals the boundary value."""
    rng = np.random.default_rng(1)
    diverged = 0
    for _ in range(300):
        L = int(rng.choice([8, 16]))
        k = int(rng.integers(1, L))
        vals = rng.integers(0, 4, L).astype(np.float32)
        ours = np.asarray(topk_mask(jnp.asarray(vals)[None], k))[0]
        theirs = _torch_mask(vals, k)
        assert ours.sum() == theirs.sum() == k
        boundary = np.sort(vals)[::-1][k - 1]
        above = vals > boundary
        np.testing.assert_array_equal(ours[above], theirs[above],
                                      err_msg="above-boundary tokens differ")
        # divergent positions all sit exactly at the boundary value
        diff = ours != theirs
        assert (vals[diff] == boundary).all()
        diverged += int(diff.any())
    assert diverged > 0, "fixture failed to produce boundary ties"


def test_lax_topk_is_stable_lowest_index_first():
    """Our masks are deterministic: equal scores resolve to the LOWEST
    indices — the numpy lexsort (score desc, index asc) reference."""
    rng = np.random.default_rng(2)
    for _ in range(300):
        L = int(rng.choice([8, 16]))
        k = int(rng.integers(1, L))
        vals = rng.integers(0, 3, L).astype(np.float32)
        ours = np.asarray(topk_mask(jnp.asarray(vals)[None], k))[0]
        order = np.lexsort((np.arange(L), -vals))  # score desc, index asc
        ref = np.zeros(L, np.float32)
        ref[order[:k]] = 1.0
        np.testing.assert_array_equal(ours, ref)


def test_exact_keep_respects_prior_mask_under_ties():
    """exact_keep's BIG·mask keying must never let an unselected token
    outrank a selected one, even with tied raw scores."""
    rng = np.random.default_rng(3)
    for _ in range(200):
        L = int(rng.choice([8, 16]))
        scores = rng.integers(0, 3, L).astype(np.float32)
        mask = (rng.random(L) < 0.5).astype(np.float32)
        max_keep = int(rng.integers(1, L))
        out = np.asarray(exact_keep(jnp.asarray(mask)[None],
                                    jnp.asarray(scores)[None], max_keep))[0]
        assert out.sum() == max_keep
        n_sel = int(mask.sum())
        if n_sel >= max_keep:
            # trim: everything kept was previously selected
            assert (mask[out == 1] == 1).all()
        else:
            # fill: every previously selected position survives
            assert (out[mask == 1] == 1).all()
