"""Console entry points (`signal-tpu-train` / `signal-tpu-test`).

Same surface as the repo-root `train.py` / `test.py` shims, which mirror
the reference CLIs (`train.py:24-109`, `test.py:10-52` in
maxingan2412/Signal).
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np


def train_main(argv=None):
    parser = argparse.ArgumentParser(description="Signal-TPU Training")
    parser.add_argument("--config_file", default="configs/RGBNT201/Signal.yml",
                        help="path to config file", type=str)
    parser.add_argument("--fea_cft", default=0, type=int,
                        help="Feature choose to be tested")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="Modify config options from the command line")
    parser.add_argument("--local_rank", default=0, type=int)
    parser.add_argument("--resume", default="", type=str,
                        help="orbax checkpoint dir to resume from")
    args = parser.parse_args(argv)

    from signal_tpu.config import load_config

    cfg = load_config(args.config_file if args.config_file else None, args.opts)
    cfg.TEST.FEAT = args.fea_cft

    random.seed(cfg.SOLVER.SEED)
    np.random.seed(cfg.SOLVER.SEED)

    import jax

    if cfg.MODEL.DIST_TRAIN:
        # multi-host: the reference's `dist.init_process_group('nccl',
        # init_method='env://')` (`train.py:46-48`) becomes single-controller
        # JAX over ICI/DCN — coordinator/rank/size read from the standard env
        jax.distributed.initialize()

    from signal_tpu.data import make_dataloader
    from signal_tpu.engine.train import do_train
    from signal_tpu.models.signal_model import ModelSpec
    from signal_tpu.utils.logger import setup_logger

    out_dir = os.path.join(cfg.OUTPUT_DIR, cfg.ckpt_save_path)
    os.makedirs(out_dir, exist_ok=True)
    logger = setup_logger("signal_tpu", out_dir, if_train=True)
    logger.info("JAX devices: %s", jax.devices())
    logger.info("Running with config:\n%s", cfg.dump())

    # per-host slice of the global PK order (replaces the reference's
    # gloo-synced DDP sampler — every host derives the same order from the
    # shared seed and takes its block deterministically)
    (train_loader, train_loader_normal, val_loader,
     num_query, num_classes, camera_num, view_num) = make_dataloader(
        cfg, num_shards=jax.process_count(), shard_index=jax.process_index())
    logger.info("dataset: %s classes=%d cams=%d views=%d query=%d",
                cfg.DATASETS.NAMES, num_classes, camera_num, view_num, num_query)

    # (under PARALLEL.MODEL_AXIS > 1 the Pallas attention kernel runs
    # per-shard via shard_map — see ops/flash_attention.py)
    spec = ModelSpec.from_config(cfg, num_classes, camera_num, view_num)

    mesh = None
    if len(jax.devices()) > 1:
        from signal_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(num_data=cfg.PARALLEL.DATA_AXIS,
                           num_model=cfg.PARALLEL.MODEL_AXIS,
                           num_pipe=getattr(cfg.PARALLEL, "PIPE_AXIS", 1))
        logger.info("mesh: %s", mesh)

    do_train(cfg, spec, train_loader, val_loader, num_query, num_classes,
             mesh=mesh, resume_from=args.resume or None)


def parse_spec_overrides(s: str) -> dict:
    """'k=v,...' → ModelSpec override dict (ints/floats/bools coerced) —
    the CLI-facing form of dataclasses.replace, used by the export
    scripts' --shrink flag (CI smoke tests run tiny specs)."""
    def coerce(v: str):
        if v in ("True", "False"):
            return v == "True"
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                pass
        return v

    out = {}
    for kv in filter(None, s.split(",")):
        k, _, v = kv.partition("=")
        out[k.strip()] = coerce(v.strip())
    return out


def build_model_for_test(cfg, num_classes: int | None = None,
                         camera_num: int | None = None, view_num: int = 1,
                         spec_overrides: dict | None = None):
    """(spec, params, bn_state) with TEST.WEIGHT loaded — the model-build
    half of ``test_main``, also used by scripts/export_serving.py. When
    ``num_classes`` is None the dataset is scanned for the counts (the
    classifier head shapes must match the checkpoint).
    ``spec_overrides``: ModelSpec field overrides applied before init
    (see ``parse_spec_overrides``)."""
    import jax

    if num_classes is None:
        from signal_tpu.data import make_dataloader

        (_, _, _, _, num_classes, camera_num,
         view_num) = make_dataloader(cfg, num_shards=jax.process_count(),
                                     shard_index=jax.process_index())
    elif cfg.MODEL.SIE_CAMERA and camera_num is None:
        # the SIE table shape is (camera_num[*view_num], width) — a
        # guessed count builds a table the checkpoint can't load into
        raise ValueError(
            "num_classes was given without camera_num but MODEL.SIE_CAMERA "
            "is on; pass camera_num (and view_num when MODEL.SIE_VIEW) "
            "matching the checkpoint's dataset")

    from signal_tpu.models.signal_model import ModelSpec, init_signal_params

    spec = ModelSpec.from_config(
        cfg, num_classes, camera_num if camera_num is not None else 1, view_num)
    if spec_overrides:
        import dataclasses

        spec = dataclasses.replace(spec, **spec_overrides)
    params, bn_state = init_signal_params(
        jax.random.PRNGKey(cfg.SOLVER.SEED), spec)

    weight = cfg.TEST.WEIGHT
    if weight:
        if weight.endswith((".pth", ".pt")):
            from signal_tpu.models.clip_loader import (
                load_reference_signal_checkpoint)

            params, bn_state = load_reference_signal_checkpoint(
                params, bn_state, weight, spec)
        else:
            # subset restore: periodic snapshots also hold opt_state/epoch
            from signal_tpu.utils.checkpoint import load_checkpoint_subset

            tree = load_checkpoint_subset(weight, ("params", "bn_state"))
            params, bn_state = tree["params"], tree["bn_state"]
    return spec, params, bn_state


def test_main(argv=None):
    parser = argparse.ArgumentParser(description="Signal-TPU Testing")
    parser.add_argument("--config_file", default="configs/RGBNT201/Signal.yml", type=str)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    from signal_tpu.config import load_config

    cfg = load_config(args.config_file if args.config_file else None, args.opts)

    import jax

    if cfg.MODEL.DIST_TRAIN:
        jax.distributed.initialize()

    from signal_tpu.data import make_dataloader
    from signal_tpu.engine.eval import do_inference
    from signal_tpu.utils.logger import setup_logger

    out_dir = os.path.join(cfg.OUTPUT_DIR, cfg.ckpt_test_path)
    os.makedirs(out_dir, exist_ok=True)
    logger = setup_logger("signal_tpu", out_dir, if_train=False)

    (_, _, val_loader, num_query, num_classes, camera_num,
     view_num) = make_dataloader(cfg, num_shards=jax.process_count(),
                                 shard_index=jax.process_index())
    spec, params, bn_state = build_model_for_test(
        cfg, num_classes, camera_num, view_num)
    if cfg.TEST.WEIGHT:
        logger.info("Loaded checkpoint %s", cfg.TEST.WEIGHT)

    mesh = None
    if len(jax.devices()) > 1:
        from signal_tpu.parallel.mesh import create_mesh, shard_params

        mesh = create_mesh(num_data=cfg.PARALLEL.DATA_AXIS,
                           num_model=cfg.PARALLEL.MODEL_AXIS,
                           num_pipe=getattr(cfg.PARALLEL, "PIPE_AXIS", 1))
        params = shard_params(params, mesh)
        logger.info("mesh: %s", mesh)

    do_inference(cfg, spec, params, bn_state, val_loader, num_query, mesh=mesh)
