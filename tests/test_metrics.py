"""CMC/mAP and re-ranking: vectorized device impls vs brute-force python."""

import numpy as np
import jax.numpy as jnp

from signal_tpu.metrics import R1mAPEvaluator, eval_func, eval_func_msvr


def brute_force_eval(distmat, q_pids, g_pids, q_keys, g_keys, max_rank=50):
    """Straightforward per-query python implementation of the market1501
    protocol (same-pid & same-key gallery entries discarded)."""
    num_q = distmat.shape[0]
    all_cmc, all_ap = [], []
    for qi in range(num_q):
        order = np.argsort(distmat[qi])
        removed = (g_pids[order] == q_pids[qi]) & (g_keys[order] == q_keys[qi])
        kept = ~removed
        match = (g_pids[order] == q_pids[qi]).astype(np.int64)[kept]
        if not match.any():
            continue
        cmc = match.cumsum()
        cmc[cmc > 1] = 1
        all_cmc.append(cmc[:max_rank])
        num_rel = match.sum()
        prec = match.cumsum() / np.arange(1, len(match) + 1)
        all_ap.append((prec * match).sum() / num_rel)
    # pad short cmc rows (tiny galleries) to max_rank with their last value
    all_cmc = [np.pad(c, (0, max_rank - len(c)), mode="edge") for c in all_cmc]
    return np.mean(all_cmc, axis=0), float(np.mean(all_ap))


def _random_protocol_case(seed, nq=20, ng=60, npids=8, nkeys=4):
    rng = np.random.default_rng(seed)
    q_pids = rng.integers(0, npids, nq)
    g_pids = rng.integers(0, npids, ng)
    q_keys = rng.integers(0, nkeys, nq)
    g_keys = rng.integers(0, nkeys, ng)
    distmat = rng.random((nq, ng)).astype(np.float32)
    return distmat, q_pids, g_pids, q_keys, g_keys


def test_eval_func_matches_brute_force():
    for seed in range(5):
        distmat, q_pids, g_pids, q_cams, g_cams = _random_protocol_case(seed)
        ref_cmc, ref_map = brute_force_eval(distmat, q_pids, g_pids, q_cams, g_cams)
        cmc, mAP = eval_func(distmat, q_pids, g_pids, q_cams, g_cams)
        np.testing.assert_allclose(cmc, ref_cmc, atol=1e-6)
        assert abs(mAP - ref_map) < 1e-6


def test_eval_func_msvr_scene_removal():
    distmat, q_pids, g_pids, q_sc, g_sc = _random_protocol_case(7, nkeys=3)
    q_cams = np.zeros_like(q_pids)
    g_cams = np.zeros_like(g_pids)
    ref_cmc, ref_map = brute_force_eval(distmat, q_pids, g_pids, q_sc, g_sc)
    cmc, mAP = eval_func_msvr(distmat, q_pids, g_pids, q_cams, g_cams, q_sc, g_sc)
    np.testing.assert_allclose(cmc, ref_cmc, atol=1e-6)
    assert abs(mAP - ref_map) < 1e-6


def test_evaluator_end_to_end_perfect_features():
    """Queries identical to one gallery item of the same pid → mAP 1 when
    each pid has exactly one (cross-camera) gallery match."""
    rng = np.random.default_rng(0)
    npid = 10
    feats = rng.standard_normal((npid, 32)).astype(np.float32)
    q_feats = feats + 1e-4 * rng.standard_normal((npid, 32)).astype(np.float32)
    ev = R1mAPEvaluator(num_query=npid)
    ev.update(q_feats, np.arange(npid), np.zeros(npid))
    ev.update(feats, np.arange(npid), np.ones(npid))
    cmc, mAP, *_ = ev.compute()
    assert mAP > 0.999
    assert cmc[0] > 0.999


def brute_force_re_ranking(qf, gf, k1, k2, lam):
    """Set-based python implementation of CVPR'17 k-reciprocal re-ranking
    (independent of the reference's numpy formulation)."""
    feat = np.concatenate([qf, gf], 0)
    n = len(feat)
    nq = len(qf)
    sq = (feat ** 2).sum(1)
    dist = sq[:, None] + sq[None, :] - 2 * feat @ feat.T
    dist = (dist / dist.max(axis=0, keepdims=True)).T
    order = np.argsort(dist, axis=1)
    rank = np.empty_like(order)
    for i in range(n):
        rank[i, order[i]] = np.arange(n)

    def recip(i, k):
        fwd = set(order[i, : k + 1])
        return {j for j in fwd if rank[j, i] <= k}

    kh = int(np.around(k1 / 2))
    R = [recip(i, k1) for i in range(n)]
    Rh = [recip(i, kh) for i in range(n)]
    expanded = []
    for i in range(n):
        e = set(R[i])
        for j in R[i]:
            if len(Rh[j] & R[i]) > (2 / 3) * len(Rh[j]):
                e |= Rh[j]
        expanded.append(e)

    V = np.zeros((n, n), np.float32)
    for i in range(n):
        idx = sorted(expanded[i])
        w = np.exp(-dist[i, idx])
        V[i, idx] = w / w.sum()
    if k2 != 1:
        V = np.stack([V[order[i, :k2]].mean(0) for i in range(n)])

    jac = np.zeros((nq, n), np.float32)
    for i in range(nq):
        ms = np.minimum(V[i][None, :], V).sum(1)
        jac[i] = 1 - ms / (2 - ms)
    final = jac * (1 - lam) + dist[:nq] * lam
    return final[:, nq:]


def test_re_ranking_matches_brute_force():
    from signal_tpu.reranking import re_ranking

    rng = np.random.default_rng(1)
    qf = rng.standard_normal((8, 16)).astype(np.float32)
    gf = rng.standard_normal((24, 16)).astype(np.float32)
    ref = brute_force_re_ranking(qf, gf, k1=6, k2=3, lam=0.3)
    ours = re_ranking(jnp.asarray(qf), jnp.asarray(gf), k1=6, k2=3, lambda_value=0.3)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_re_ranking_multi_chunk_streaming():
    """N large enough that the Jaccard min-sum streams over >1 gallery
    chunk (chunk=128) and >1 query block (block=32): the streamed result
    must equal the brute-force one. Guards the memory-bounded rewrite
    ([block, chunk, N] intermediates, never [block, N, N])."""
    from signal_tpu.reranking import re_ranking

    rng = np.random.default_rng(7)
    # 40 query + 280 gallery → N=320 = 2.5 chunks, 2 query blocks
    qf = rng.standard_normal((40, 8)).astype(np.float32)
    gf = rng.standard_normal((280, 8)).astype(np.float32)
    ref = brute_force_re_ranking(qf, gf, k1=10, k2=4, lam=0.3)
    ours = re_ranking(jnp.asarray(qf), jnp.asarray(gf), k1=10, k2=4,
                      lambda_value=0.3)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
