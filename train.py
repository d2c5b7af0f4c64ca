"""Training CLI — mirrors the reference's `train.py` interface:

    python train.py --config_file configs/RGBNT201/Signal.yml [KEY VALUE ...]

(reference `train.py:24-109` in maxingan2412/Signal).
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np


def main():
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
    args = parser.parse_args()

    from signal_tpu.config import load_config

    cfg = load_config(args.config_file if args.config_file else None, args.opts)
    cfg.TEST.FEAT = args.fea_cft

    random.seed(cfg.SOLVER.SEED)
    np.random.seed(cfg.SOLVER.SEED)

    import jax

    from signal_tpu.data import make_dataloader
    from signal_tpu.engine.train import do_train
    from signal_tpu.models.signal_model import ModelSpec
    from signal_tpu.utils.logger import setup_logger

    out_dir = os.path.join(cfg.OUTPUT_DIR, cfg.ckpt_save_path)
    os.makedirs(out_dir, exist_ok=True)
    logger = setup_logger("signal_tpu", out_dir, if_train=True)
    logger.info("JAX devices: %s", jax.devices())
    logger.info("Running with config:\n%s", cfg.dump())

    (train_loader, train_loader_normal, val_loader,
     num_query, num_classes, camera_num, view_num) = make_dataloader(cfg)
    logger.info("dataset: %s classes=%d cams=%d views=%d query=%d",
                cfg.DATASETS.NAMES, num_classes, camera_num, view_num, num_query)

    spec = ModelSpec.from_config(cfg, num_classes, camera_num)

    mesh = None
    if len(jax.devices()) > 1:
        from signal_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(num_model=cfg.PARALLEL.MODEL_AXIS)
        logger.info("mesh: %s", mesh)

    do_train(cfg, spec, train_loader, val_loader, num_query, num_classes,
             mesh=mesh, resume_from=args.resume or None)


if __name__ == "__main__":
    main()
