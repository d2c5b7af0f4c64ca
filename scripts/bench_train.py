"""Train-step throughput benchmark (full SIM+GAM+LAM model, B=64,
matching the reference's A100 numbers in BASELINE.md: 202.2 samples/s).

Prints one JSON line. Not the driver bench (that's bench.py / eval).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from signal_tpu.config import Config
    from signal_tpu.engine.train import make_train_step
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs

    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    cfg.MODEL.TOPK = 80
    cfg.MODEL.SIE_COE = 1.0
    cfg.MODEL.stageName = "together_CLS_Patch"
    cfg.MODEL.ID_LOSS_WEIGHT = 0.25
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.BASE_LR = 3.5e-4
    cfg.SOLVER.IMS_PER_BATCH = 64
    if len(sys.argv) > 1:  # optional KEY VALUE overrides for A/B runs
        cfg.merge_from_list(sys.argv[1:])
    num_classes = 171

    spec = ModelSpec.from_config(cfg, num_classes=num_classes, camera_num=4)
    params, bn_state = init_signal_params(jax.random.PRNGKey(0), spec)
    group_trees = build_param_groups(params, cfg)
    opt_state = adam_init(params)
    train_step = make_train_step(spec, cfg, num_classes)

    B = cfg.SOLVER.IMS_PER_BATCH
    rng = jax.random.PRNGKey(1)
    batch = {
        "imgs": {m: jax.random.normal(jax.random.fold_in(rng, i),
                                      (B, 3, 256, 128), jnp.float32)
                 for i, m in enumerate(("RGB", "NI", "TI"))},
        "pids": jnp.asarray(jax.random.randint(jax.random.fold_in(rng, 9),
                                               (B,), 0, num_classes)),
        "camids": jnp.zeros((B,), jnp.int32),
    }
    if cfg.SOLVER.ACCUM_ITER > 1:  # step expects [A, B/A, ...] microbatches
        from signal_tpu.engine.train import _device_batch

        batch = _device_batch(batch, None, cfg.SOLVER.ACCUM_ITER)
    lr_a, lr_b = schedule_coeffs(cfg, 1)
    la, lb = jnp.float32(lr_a), jnp.float32(lr_b)

    # warm/compile
    params, bn_state, opt_state, loss, acc, _ = train_step(
        params, bn_state, opt_state, batch, la, lb, group_trees)
    float(loss)

    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        params, bn_state, opt_state, loss, acc, _ = train_step(
            params, bn_state, opt_state, batch, la, lb, group_trees)
    final = float(loss)  # host fetch = sync point
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "train_samples_per_s_per_chip",
        "value": round(B * n / dt, 2),
        "unit": "samples/s",
        "vs_baseline": round((B * n / dt) / 202.2, 3),
        "loss": round(final, 3),
    }))


if __name__ == "__main__":
    main()
