"""k-reciprocal re-ranking (CVPR'17), re-expressed as dense device algebra.

Behavioral mirror of `utils/reranking.py:29-100` (maxingan2412/Signal),
which runs O(N²) python/numpy loops. On TPU the same semantics become
boolean matrix algebra over [N, N] masks (N = num_query + num_gallery ≈
5k fits HBM comfortably):

* rank positions via argsort → rank matrix;
* k-reciprocal sets R(i) = {j : rank_i(j) ≤ k1 ∧ rank_j(i) ≤ k1};
* candidate expansion: R(i) ∪= Rh(j) for j ∈ R(i) with
  |Rh(j) ∩ R(i)| > 2/3 |Rh(j)| — one boolean GEMM for the overlap counts;
* V rows: exp(−d) masked by the expanded set, L1-normalized;
* query expansion: V ← mean of V over each row's top-k2 neighbours (GEMM);
* Jaccard: min-sum between query rows and all rows, computed in blocks
  (min(a,b) = (a+b−|a−b|)/2 keeps it on the VPU with streaming blocks).

Note: the reference accumulates V/Jaccard in fp16 numpy; we keep fp32.
This is strictly more accurate but NOT bit-identical — near-tied
neighbours can order differently than the reference's fp16 output, so
re-ranked CMC/mAP may differ from the reference by small deltas (the
un-re-ranked protocol matches bit-for-bit).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _rank_matrix(dist: jnp.ndarray) -> jnp.ndarray:
    """rank[i, j] = position of j in row i's ascending ordering (0-based)."""
    order = jnp.argsort(dist, axis=1)
    n = dist.shape[0]
    ranks = jnp.zeros_like(order)
    rows = jnp.arange(n)[:, None]
    pos = jnp.broadcast_to(jnp.arange(n)[None, :], order.shape)
    return ranks.at[rows, order].set(pos)


@partial(jax.jit, static_argnames=("num_query", "k1", "k2", "block"))
def _re_ranking_core(original_dist: jnp.ndarray, num_query: int,
                     k1: int, k2: int, lambda_value: float,
                     block: int = 32) -> jnp.ndarray:
    n = original_dist.shape[0]
    # reference: transpose(dist / colmax) (`reranking.py:46`)
    d = (original_dist / jnp.max(original_dist, axis=0, keepdims=True)).T

    rank = _rank_matrix(d)

    # forward top-(k1+1) includes self (distance 0 ranks first)
    F1 = rank <= k1                      # [N, N] bool: j in forward k1-neigh of i
    R = F1 & F1.T                        # k-reciprocal
    k_half = int(np.around(k1 / 2))
    Fh = rank <= k_half
    Rh = Fh & Fh.T                       # half-k reciprocal sets

    # expansion: candidate j ∈ R(i) passes if |Rh(j) ∩ R(i)| > 2/3 |Rh(j)|
    Rf = R.astype(jnp.float32)
    Rhf = Rh.astype(jnp.float32)
    overlap = Rf @ Rhf.T                 # overlap[i, j] = |R(i) ∩ Rh(j)|
    sizes = jnp.sum(Rhf, axis=1)[None, :]
    passes = R & (overlap > (2.0 / 3.0) * sizes)
    expanded = R | ((passes.astype(jnp.float32) @ Rhf) > 0)

    w = jnp.exp(-d) * expanded.astype(jnp.float32)
    V = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)

    if k2 != 1:
        top_k2 = (rank < k2).astype(jnp.float32)   # k2 nearest incl. self
        V = (top_k2 @ V) / k2

    dq = d[:num_query]

    # Jaccard in query blocks: minsum(i, j) = Σ_k min(Vq[i,k], V[j,k]);
    # V rows are L1-normalized so jaccard = minsum / (2 − minsum).
    # BOTH axes stream: the elementwise min is [block, chunk, N] in VMEM
    # (block=32, chunk=128, N=5k → 82 MB fp32), never [block, N, N]
    # (~3 GB at N≈5k — the round-2 version materialized that and would
    # hit the HBM wall on the first larger gallery).
    chunk = 128
    pad_v = (-n) % chunk
    V_rows = jnp.pad(V, ((0, pad_v), (0, 0))).reshape(-1, chunk, n)

    def block_fn(vq_block):
        # vq_block [B, N]; min-sum against V streamed chunk-of-rows-wise
        def chunk_fn(v_chunk):                                 # [C, N]
            m = jnp.minimum(vq_block[:, None, :], v_chunk[None, :, :])
            return jnp.sum(m, axis=-1)                         # [B, C]

        out = jax.lax.map(chunk_fn, V_rows)                    # [n/C, B, C]
        return out.transpose(1, 0, 2).reshape(vq_block.shape[0], -1)[:, :n]

    nq = dq.shape[0]
    pad = (-nq) % block
    Vq = V[:num_query]
    Vq_pad = jnp.pad(Vq, ((0, pad), (0, 0)))
    blocks = Vq_pad.reshape(-1, block, n)
    minsum = jax.lax.map(block_fn, blocks).reshape(-1, n)[:nq]  # [Nq, N]

    jaccard = 1.0 - minsum / (2.0 - minsum)
    final = jaccard * (1 - lambda_value) + dq * lambda_value
    return final[:, num_query:]


def re_ranking(probFea, galFea, k1: int, k2: int, lambda_value: float,
               local_distmat=None, only_local: bool = False) -> np.ndarray:
    """API mirror of `utils/reranking.py:29`. Returns [Nq, Ng] numpy."""
    probFea = jnp.asarray(probFea, jnp.float32)
    galFea = jnp.asarray(galFea, jnp.float32)
    num_query = probFea.shape[0]
    if only_local:
        original_dist = jnp.asarray(local_distmat, jnp.float32)
    else:
        feat = jnp.concatenate([probFea, galFea], axis=0)
        sq = jnp.sum(feat * feat, axis=1)
        original_dist = sq[:, None] + sq[None, :] - 2.0 * feat @ feat.T
        if local_distmat is not None:
            original_dist = original_dist + jnp.asarray(local_distmat, jnp.float32)
    out = _re_ranking_core(original_dist, int(num_query), int(k1), int(k2),
                           float(lambda_value))
    return np.asarray(out)
