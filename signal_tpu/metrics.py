"""Retrieval metrics: CMC / mAP, market1501 + MSVR310 protocols, on device.

Behavioral mirror of `utils/metrics.py` (maxingan2412/Signal):

* `eval_func` (`metrics.py:111-170`): per query, gallery entries with the
  same pid AND same camid are removed; CMC is the cumulative first-match
  curve over the kept ranking; AP is mean precision at the kept match
  positions; queries with no kept match are dropped.
* `eval_func_msrv` (`metrics.py:13-108`): removal is same pid AND same
  *scene* id.

The reference argsorts on CPU numpy and loops over queries. Here the
ranking (argsort), the keep-mask, the CMC cumulative curve, and AP are all
vectorized [Nq, Ng] device ops: the per-query loop becomes cumsum algebra
over the sorted keep/match masks. The kept-position index of sorted entry
j is cumsum(keep)[j], which substitutes the reference's boolean
compression without data-dependent shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_rank",))
def _cmc_map_from_distmat(
    distmat: jnp.ndarray,
    q_pids: jnp.ndarray,
    g_pids: jnp.ndarray,
    q_remove_key: jnp.ndarray,
    g_remove_key: jnp.ndarray,
    max_rank: int = 50,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Core protocol. remove ⇔ same pid AND same remove_key (camid or sceneid).

    Returns (cmc [max_rank], mAP scalar, num_valid_q scalar).
    """
    order = jnp.argsort(distmat, axis=1)                      # [Nq, Ng]
    g_pids_sorted = g_pids[order]                             # [Nq, Ng]
    g_key_sorted = g_remove_key[order]

    matches = (g_pids_sorted == q_pids[:, None]).astype(jnp.float32)
    remove = (g_pids_sorted == q_pids[:, None]) & (g_key_sorted == q_remove_key[:, None])
    keep = (~remove).astype(jnp.float32)

    kept_matches = matches * keep                             # [Nq, Ng]
    # rank of sorted entry j among kept entries (1-based)
    kept_rank = jnp.cumsum(keep, axis=1)
    cum_match = jnp.cumsum(kept_matches, axis=1)

    num_rel = jnp.sum(kept_matches, axis=1)                   # [Nq]
    valid = num_rel > 0

    # AP: sum over kept-match positions of precision = cum_match / kept_rank
    prec = jnp.where(kept_rank > 0, cum_match / jnp.maximum(kept_rank, 1.0), 0.0)
    ap = jnp.sum(prec * kept_matches, axis=1) / jnp.maximum(num_rel, 1.0)
    mAP = jnp.sum(jnp.where(valid, ap, 0.0)) / jnp.maximum(jnp.sum(valid), 1.0)

    # CMC: hit at kept-rank r if any kept match has kept_rank <= r.
    # first kept match's kept rank:
    big = jnp.float32(1e9)
    first_rank = jnp.min(jnp.where(kept_matches > 0, kept_rank, big), axis=1)  # [Nq]
    ranks = jnp.arange(1, max_rank + 1, dtype=jnp.float32)[None, :]
    hits = (first_rank[:, None] <= ranks).astype(jnp.float32)                   # [Nq, R]
    cmc = jnp.sum(hits * valid[:, None].astype(jnp.float32), axis=0) / jnp.maximum(
        jnp.sum(valid), 1.0)
    return cmc, mAP, jnp.sum(valid)


def eval_func(distmat, q_pids, g_pids, q_camids, g_camids, max_rank: int = 50):
    """market1501 protocol (same-pid & same-cam gallery entries removed)."""
    cmc, mAP, nvalid = _cmc_map_from_distmat(
        jnp.asarray(distmat),
        jnp.asarray(q_pids), jnp.asarray(g_pids),
        jnp.asarray(q_camids), jnp.asarray(g_camids),
        max_rank=max_rank,
    )
    assert int(nvalid) > 0, "Error: all query identities do not appear in gallery"
    return np.asarray(cmc), float(mAP)


def eval_func_msvr(distmat, q_pids, g_pids, q_camids, g_camids,
                   q_sceneids, g_sceneids, max_rank: int = 50):
    """MSVR310 protocol: removal key is the scene id (`metrics.py:68`)."""
    del q_camids, g_camids  # ranking unaffected; kept for signature parity
    cmc, mAP, nvalid = _cmc_map_from_distmat(
        jnp.asarray(distmat),
        jnp.asarray(q_pids), jnp.asarray(g_pids),
        jnp.asarray(q_sceneids), jnp.asarray(g_sceneids),
        max_rank=max_rank,
    )
    assert int(nvalid) > 0, "Error: all query identities do not appear in gallery"
    return np.asarray(cmc), float(mAP)


def dump_msvr_rank_lists(path: str, distmat, q_pids, g_pids, q_camids,
                         g_camids, q_sceneids, g_sceneids, max_rank: int = 50):
    """MSVR310 rank-list dump, reproducing the reference's `re.txt` format
    (`utils/metrics.py:38,71-78`: one `{pid}_s{scene}_v{cam}:` header per
    query followed by its kept top-`max_rank` gallery line) — but at a
    caller-chosen path behind TEST.RANK_DUMP instead of a hardcoded cwd
    file written unconditionally."""
    distmat = np.asarray(distmat)
    q_pids, g_pids = np.asarray(q_pids), np.asarray(g_pids)
    q_camids, g_camids = np.asarray(q_camids), np.asarray(g_camids)
    q_sceneids, g_sceneids = np.asarray(q_sceneids), np.asarray(g_sceneids)
    order = np.argsort(distmat, axis=1)
    with open(path, "w") as f:
        f.write("rank list file\n")
        for qi in range(distmat.shape[0]):
            o = order[qi]
            keep = ~((g_pids[o] == q_pids[qi]) & (g_sceneids[o] == q_sceneids[qi]))
            f.write(f"{q_pids[qi]}_s{q_sceneids[qi]}_v{q_camids[qi]}:\n")
            for vid, vsc, vcam in zip(g_pids[o][keep][:max_rank],
                                      g_sceneids[o][keep][:max_rank],
                                      g_camids[o][keep][:max_rank]):
                f.write(f"{vid}_s{vsc}_v{vcam}  ")
            f.write("\n")
    return path


class R1mAPEvaluator:
    """Feature accumulator + metric computation (reference `R1_mAP_eval` /
    `R1_mAP`, `metrics.py:173-300`) with everything after accumulation on
    device: normalize → distmat GEMM → vectorized CMC/mAP.

    ``scene_aware=True`` selects the MSVR310 protocol;
    ``rank_dump_path`` additionally writes its `re.txt`-style rank lists.
    """

    def __init__(self, num_query: int, max_rank: int = 50, feat_norm: bool = True,
                 reranking: bool = False, scene_aware: bool = False,
                 rank_dump_path: Optional[str] = None):
        self.num_query = num_query
        self.max_rank = max_rank
        self.feat_norm = feat_norm
        self.reranking = reranking
        self.scene_aware = scene_aware
        self.rank_dump_path = rank_dump_path
        self.reset()

    def reset(self):
        self.feats = []
        self.pids = []
        self.camids = []
        self.sceneids = []
        self.img_paths = []

    def update(self, feat, pid, camid, sceneid=None, img_path=None):
        # device arrays stay on device (async — nothing blocks until
        # compute()); numpy inputs are kept as-is
        self.feats.append(feat)
        self.pids.extend(np.asarray(pid).tolist())
        self.camids.extend(np.asarray(camid).tolist())
        if sceneid is not None:
            self.sceneids.extend(np.asarray(sceneid).tolist())
        if img_path is not None:
            self.img_paths.extend(list(img_path))

    def compute(self):
        feats = jnp.concatenate(
            [jnp.asarray(f) for f in self.feats], axis=0).astype(jnp.float32)
        if self.feat_norm:
            feats = feats / (jnp.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
        qf, gf = feats[: self.num_query], feats[self.num_query:]
        q_pids = np.asarray(self.pids[: self.num_query])
        g_pids = np.asarray(self.pids[self.num_query:])
        q_camids = np.asarray(self.camids[: self.num_query])
        g_camids = np.asarray(self.camids[self.num_query:])

        if self.reranking:
            from signal_tpu.reranking import re_ranking

            distmat = re_ranking(qf, gf, k1=50, k2=15, lambda_value=0.3)
        else:
            from signal_tpu.ops.distmat import euclidean_sqdist

            # reference leaves the squared form (‖q‖²+‖g‖²−2qgᵀ) unrooted —
            # monotone, so ranking-identical (`metrics.py:494-500`)
            distmat = euclidean_sqdist(qf, gf)

        if self.scene_aware:
            q_sc = np.asarray(self.sceneids[: self.num_query])
            g_sc = np.asarray(self.sceneids[self.num_query:])
            cmc, mAP = eval_func_msvr(distmat, q_pids, g_pids, q_camids,
                                      g_camids, q_sc, g_sc, self.max_rank)
            if self.rank_dump_path and jax.process_index() == 0:
                # single writer: under multi-host every process computes
                # identical metrics from the all-gathered features
                dump_msvr_rank_lists(self.rank_dump_path, distmat, q_pids,
                                     g_pids, q_camids, g_camids, q_sc, g_sc,
                                     self.max_rank)
        else:
            cmc, mAP = eval_func(distmat, q_pids, g_pids, q_camids, g_camids,
                                 self.max_rank)
        return cmc, mAP, distmat, self.pids, self.camids, qf, gf
