"""Test CLI — mirrors the reference's `test.py` interface:

    python test.py --config_file configs/RGBNT201/Signal.yml TEST.WEIGHT <ckpt>

(reference `test.py:10-52` in maxingan2412/Signal; the hardcoded .pth path
is replaced by TEST.WEIGHT — an orbax dir or a torch .pth, auto-detected).
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="Signal-TPU Testing")
    parser.add_argument("--config_file", default="configs/RGBNT201/Signal.yml", type=str)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from signal_tpu.config import load_config

    cfg = load_config(args.config_file if args.config_file else None, args.opts)

    import jax

    from signal_tpu.data import make_dataloader
    from signal_tpu.engine.eval import do_inference
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.utils.logger import setup_logger

    out_dir = os.path.join(cfg.OUTPUT_DIR, cfg.ckpt_test_path)
    os.makedirs(out_dir, exist_ok=True)
    logger = setup_logger("signal_tpu", out_dir, if_train=False)

    (_, _, val_loader, num_query, num_classes, camera_num, _) = make_dataloader(cfg)
    spec = ModelSpec.from_config(cfg, num_classes, camera_num)
    params, bn_state = init_signal_params(jax.random.PRNGKey(cfg.SOLVER.SEED), spec)

    weight = cfg.TEST.WEIGHT
    if weight:
        if weight.endswith((".pth", ".pt")):
            from signal_tpu.models.clip_loader import load_reference_signal_checkpoint

            params, bn_state = load_reference_signal_checkpoint(params, bn_state, weight, spec)
            logger.info("Loaded torch reference checkpoint %s", weight)
        else:
            from signal_tpu.utils.checkpoint import load_checkpoint

            tree = load_checkpoint(weight, {"params": params, "bn_state": bn_state})
            params, bn_state = tree["params"], tree["bn_state"]
            logger.info("Loaded orbax checkpoint %s", weight)

    do_inference(cfg, spec, params, bn_state, val_loader, num_query)


if __name__ == "__main__":
    main()
