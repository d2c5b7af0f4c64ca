"""Inference engine: feature extraction + retrieval evaluation.

Behavioral mirror of `engine/processor.py:353-451` (maxingan2412/Signal),
with the whole ranking pipeline on device (the reference copied features
to CPU per batch, `metrics.py:245`).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from signal_tpu.metrics import R1mAPEvaluator
from signal_tpu.models.signal_model import ModelSpec, forward_eval

logger = logging.getLogger("signal_tpu.eval")


def make_eval_step(spec: ModelSpec, normalize=None, mesh=None):
    """``normalize``: optional (mean, std) tuple — lets the loader ship
    uint8 pixels and run torchvision-``Normalize`` on device (fused into
    the patch conv; 4× less host→device transfer). Required when batches
    arrive as uint8; float batches pass through either way.

    ``mesh``: device mesh; activates the trace-time mesh context so the
    Pallas attention kernel runs sharded under TP."""

    @jax.jit
    def eval_step(params, bn_state, imgs, camids):
        vals = imgs.values() if isinstance(imgs, dict) else (imgs,)
        if any(v.dtype == jnp.uint8 for v in vals):
            assert normalize is not None, (
                "uint8 eval batch but make_eval_step(normalize=) not given")
            from signal_tpu.data.augment import normalize_images

            imgs = normalize_images(imgs, *normalize)
        return forward_eval(params, bn_state, imgs, camids, spec)

    if mesh is None:
        return eval_step

    from signal_tpu.parallel.mesh import use_mesh

    def eval_step_with_mesh(*args, **kwargs):
        with use_mesh(mesh):  # trace happens inside the first call
            return eval_step(*args, **kwargs)

    return eval_step_with_mesh


def extract_features(spec, params, bn_state, loader, evaluator: R1mAPEvaluator,
                     mesh=None, eval_step=None, normalize=None):
    """Stream batches through forward_eval, feeding the evaluator.

    Multi-host: each host's loader shard carries the GLOBAL batch metadata
    in ``batch['global']`` (see ``data.loader._ShardedValLoader``); the
    global feature rows are all-gathered to every host so the evaluator
    runs identically everywhere (deterministic — no broadcast needed)."""
    if (eval_step is None and normalize is None
            and getattr(loader, "emit_u8", False)):
        # fail before the first batch is decoded, not at trace time —
        # the uint8-vs-float contract is a loader property known up front
        raise ValueError(
            "loader ships raw uint8 pixels (DATALOADER.DEVICE_NORMALIZE) "
            "but extract_features got neither normalize=(PIXEL_MEAN, "
            "PIXEL_STD) nor a pre-built eval_step — on-device Normalize "
            "needs the stats")
    eval_step = eval_step or make_eval_step(spec, normalize=normalize,
                                            mesh=mesh)

    def put(batch):
        # one packed [B,3,3,H,W] H2D buffer when the loader provides it
        # (one tunnel round trip; the modality split happens on device)
        imgs = batch.get("packed")
        if imgs is None:
            imgs = {k: jnp.asarray(v) for k, v in batch["imgs"].items()}
        camids = jnp.asarray(batch["camids"])
        if mesh is not None:
            from signal_tpu.parallel.mesh import shard_batch

            sharded = shard_batch({"imgs": imgs, "camids": camids}, mesh)
            imgs, camids = sharded["imgs"], sharded["camids"]
        elif not isinstance(imgs, dict):
            imgs = jnp.asarray(imgs)
        return imgs, camids, batch

    from signal_tpu.data.prefetch import prefetch

    for imgs, camids, batch in prefetch(loader, put):
        feats = eval_step(params, bn_state, imgs, camids)
        meta = batch.get("global")
        if meta is not None:  # multi-host: gather the global feature rows
            from jax.experimental import multihost_utils

            feats_np = np.asarray(
                multihost_utils.process_allgather(feats, tiled=True))
        else:
            meta = batch
            # keep on device: the slice below dispatches async, so the
            # next batch's forward is enqueued without waiting for this
            # one's result (the evaluator fetches everything at compute())
            feats_np = feats
        valid = meta.get("valid", feats_np.shape[0])
        evaluator.update(
            feats_np[:valid],
            meta["pids"][:valid],
            meta["camids"][:valid],
            sceneid=meta["trackids"][:valid] if evaluator.scene_aware else None,
            img_path=meta.get("names", [])[:valid] or None,
        )


def do_inference(cfg, spec: ModelSpec, params, bn_state, val_loader,
                 num_query: int, mesh=None):
    """Full test pass → (cmc, mAP)."""
    scene_aware = cfg.DATASETS.NAMES == "MSVR310"
    evaluator = R1mAPEvaluator(
        num_query,
        feat_norm=cfg.TEST.FEAT_NORM == "yes",
        reranking=cfg.TEST.RE_RANKING == "yes",
        scene_aware=scene_aware,
        rank_dump_path=cfg.TEST.RANK_DUMP or None,
    )
    extract_features(spec, params, bn_state, val_loader, evaluator, mesh=mesh,
                     normalize=(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD))
    cmc, mAP, *_ = evaluator.compute()
    logger.info("Validation Results ")
    logger.info("mAP: %.1f%%", 100 * mAP)
    for r in (1, 5, 10):
        logger.info("CMC curve, Rank-%-3d:%.1f%%", r, 100 * cmc[r - 1])
    return cmc, mAP
