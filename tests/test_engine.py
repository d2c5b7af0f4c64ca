"""Engine integration tests on a tiny spec (fast CPU)."""

import dataclasses
import logging

import numpy as np
import jax

from signal_tpu.config import Config
from signal_tpu.data import make_dataloader
from signal_tpu.engine.eval import do_inference
from signal_tpu.engine.train import do_train
from signal_tpu.models.signal_model import ModelSpec, init_signal_params

logging.basicConfig(level=logging.INFO)


def _tiny_cfg(tmp_path, **model_over):
    cfg = Config()
    cfg.DATASETS.NAMES = "synthetic"
    cfg.INPUT.SIZE_TRAIN = (64, 64)
    cfg.INPUT.SIZE_TEST = (64, 64)
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.DATALOADER.NUM_INSTANCE = 2
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.TEST.IMS_PER_BATCH = 8
    cfg.SOLVER.MAX_EPOCHS = 1
    cfg.SOLVER.EVAL_PERIOD = 1
    cfg.SOLVER.LOG_PERIOD = 1
    cfg.SOLVER.CHECKPOINT_PERIOD = 1
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    cfg.MODEL.TOPK = 3
    cfg.MODEL.stageName = "together_CLS_Patch"
    cfg.OUTPUT_DIR = str(tmp_path)
    for k, v in model_over.items():
        setattr(cfg.MODEL, k, v)
    return cfg


def _tiny_spec(cfg, num_classes, cam_num):
    spec = ModelSpec.from_config(cfg, num_classes, cam_num)
    return dataclasses.replace(spec, layers=2, width=32, feat_dim=16,
                               num_heads=4, h=4, w=4, use_flash=False,
                               compute_dtype="float32")


def test_do_train_epoch_and_checkpoint(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    (train_loader, _, val_loader, num_query, num_classes, cam_num,
     _) = make_dataloader(cfg)
    spec = _tiny_spec(cfg, num_classes, cam_num)
    state = do_train(cfg, spec, train_loader, val_loader, num_query,
                     num_classes, max_steps_per_epoch=3)
    assert state.params is not None
    import os

    ckpt_dir = os.path.join(str(tmp_path), cfg.ckpt_save_path)
    entries = os.listdir(ckpt_dir)
    assert any("Signal" in e for e in entries)  # periodic + best ckpts


def test_do_train_vehicle_heads(tmp_path):
    """DIRECT=0 (RGBNT100/MSVR310 convention): per-modality BNNeck +
    classifier heads through a real train epoch + eval — the person-path
    tests all run DIRECT=1."""
    cfg = _tiny_cfg(tmp_path, DIRECT=0)
    cfg.SOLVER.ACCUM_ITER = 2  # and the microbatch scan over those heads
    (train_loader, _, val_loader, num_query, num_classes, cam_num,
     _) = make_dataloader(cfg)
    spec = _tiny_spec(cfg, num_classes, cam_num)
    assert not spec.direct
    state = do_train(cfg, spec, train_loader, val_loader, num_query,
                     num_classes, max_steps_per_epoch=2)
    leaves = jax.tree.leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_do_train_resume(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    cfg.SOLVER.EVAL_PERIOD = 5  # skip eval for speed
    (train_loader, _, val_loader, num_query, num_classes, cam_num,
     _) = make_dataloader(cfg)
    spec = _tiny_spec(cfg, num_classes, cam_num)
    do_train(cfg, spec, train_loader, None, num_query, num_classes,
             max_steps_per_epoch=2)
    import os

    ckpt = os.path.join(str(tmp_path), cfg.ckpt_save_path, "Signal_1")
    assert os.path.isdir(ckpt)
    cfg.SOLVER.MAX_EPOCHS = 2
    state = do_train(cfg, spec, train_loader, None, num_query, num_classes,
                     max_steps_per_epoch=2, resume_from=ckpt)
    assert state.params is not None


def test_do_inference_runs(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    (_, _, val_loader, num_query, num_classes, cam_num, _) = make_dataloader(cfg)
    spec = _tiny_spec(cfg, num_classes, cam_num)
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    cmc, mAP = do_inference(cfg, spec, params, bn, val_loader, num_query)
    assert 0.0 <= mAP <= 1.0 and len(cmc) == 50


def test_do_inference_with_reranking(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    cfg.TEST.RE_RANKING = "yes"
    (_, _, val_loader, num_query, num_classes, cam_num, _) = make_dataloader(cfg)
    spec = _tiny_spec(cfg, num_classes, cam_num)
    params, bn = init_signal_params(jax.random.PRNGKey(0), spec)
    cmc, mAP = do_inference(cfg, spec, params, bn, val_loader, num_query)
    assert 0.0 <= mAP <= 1.0


def test_checkpoint_subset_restore(tmp_path):
    """Evaluating a FULL training snapshot must not require opt_state."""
    from signal_tpu.utils.checkpoint import load_checkpoint_subset, save_checkpoint
    import jax.numpy as jnp

    tree = {"params": {"w": jnp.ones((2, 2))}, "bn_state": {"m": jnp.zeros(2)},
            "opt_state": {"mu": jnp.zeros((2, 2))}, "epoch": 7}
    path = str(tmp_path / "snap")
    save_checkpoint(path, tree)
    sub = load_checkpoint_subset(path, ("params", "bn_state"))
    assert set(sub) == {"params", "bn_state"}
    np.testing.assert_array_equal(np.asarray(sub["params"]["w"]), 1.0)


def test_preemption_at_epoch_boundary(tmp_path, monkeypatch):
    """SIGTERM landing during epoch-end eval is acted on at the epoch
    boundary (saved epoch = the completed one, so resume starts at the
    next) instead of waiting for a step of the next epoch."""
    import os

    from signal_tpu.engine import train as train_mod
    from signal_tpu.utils.checkpoint import load_checkpoint_subset

    cfg = _tiny_cfg(tmp_path)
    cfg.SOLVER.MAX_EPOCHS = 3
    cfg.SOLVER.EVAL_PERIOD = 1
    cfg.SOLVER.CHECKPOINT_PERIOD = 99
    (train_loader, _, val_loader, num_query, num_classes, cam_num,
     _) = make_dataloader(cfg)
    spec = _tiny_spec(cfg, num_classes, cam_num)

    import threading

    ev = threading.Event()
    real_eval = train_mod._neat_eval

    def eval_then_sigterm(*a, **kw):
        out = real_eval(*a, **kw)
        ev.set()  # "signal arrived while evaluating"
        return out

    monkeypatch.setattr(train_mod, "_neat_eval", eval_then_sigterm)
    state = do_train(cfg, spec, train_loader, val_loader, num_query,
                     num_classes, max_steps_per_epoch=1, preempt_event=ev)
    assert state.params is not None

    ckpt = os.path.join(str(tmp_path), cfg.ckpt_save_path, "Signal_preempt")
    assert os.path.isdir(ckpt)
    saved = load_checkpoint_subset(ckpt, ("epoch",))
    assert int(saved["epoch"]) == 1  # epoch 1 completed; resume runs 2..3


def test_preemption_checkpoint_and_resume(tmp_path):
    """A set preempt_event (the SIGTERM path) makes do_train write a full
    resumable checkpoint at the next step boundary and return; --resume
    from it restarts the interrupted epoch."""
    import os
    import threading

    cfg = _tiny_cfg(tmp_path)
    cfg.SOLVER.MAX_EPOCHS = 5
    cfg.SOLVER.EVAL_PERIOD = 99      # never reach in-loop eval
    cfg.SOLVER.CHECKPOINT_PERIOD = 99
    (train_loader, _, val_loader, num_query, num_classes, cam_num,
     _) = make_dataloader(cfg)
    spec = _tiny_spec(cfg, num_classes, cam_num)

    ev = threading.Event()
    ev.set()                          # "preempted" before the first boundary
    state = do_train(cfg, spec, train_loader, None, num_query, num_classes,
                     preempt_event=ev)
    assert state.params is not None

    ckpt = os.path.join(str(tmp_path), cfg.ckpt_save_path, "Signal_preempt")
    assert os.path.isdir(ckpt)

    # resume restarts epoch 1 (saved epoch is 0) and trains to completion
    cfg2 = _tiny_cfg(tmp_path)
    cfg2.SOLVER.MAX_EPOCHS = 1
    cfg2.SOLVER.EVAL_PERIOD = 99
    cfg2.SOLVER.CHECKPOINT_PERIOD = 99
    state2 = do_train(cfg2, spec, train_loader, None, num_query, num_classes,
                      max_steps_per_epoch=2, resume_from=ckpt)
    assert state2.params is not None
