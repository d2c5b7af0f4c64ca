"""stdout + file logger (reference `utils/logger.py:7-28`)."""

import logging
import os
import sys


def setup_logger(name: str, save_dir: str, if_train: bool) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")

    sh = logging.StreamHandler(stream=sys.stdout)
    sh.setLevel(logging.DEBUG)
    sh.setFormatter(fmt)
    logger.addHandler(sh)

    if save_dir and _process_index() == 0:
        # single-writer under multi-host (the reference rank-gates its
        # DDP-side logging/saves, `engine/processor.py:311-327`)
        os.makedirs(save_dir, exist_ok=True)
        fname = "train_log.txt" if if_train else "test_log.txt"
        fh = logging.FileHandler(os.path.join(save_dir, fname), mode="w")
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0
