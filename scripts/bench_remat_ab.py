"""Clean A/B of remat policies in ONE process, with phase timing.

Motivation: separate bench_train.py invocations each pay param-init +
compile through the axon tunnel (~10 min), and day-to-day tunnel
variance (~4%) swamps the ~3% policy deltas. Running both policies in
one process on the same initialized params, alternating timed reps,
isolates the policy effect and also reports where the startup time
actually goes.

Usage: python scripts/bench_remat_ab.py [policyA policyB [reps]]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

T0 = time.perf_counter()


def lap(msg):
    print(f"[{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def main():
    pol_a = sys.argv[1] if len(sys.argv) > 1 else "full"
    pol_b = sys.argv[2] if len(sys.argv) > 2 else "attn"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

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
    num_classes = 171
    lap("config built")

    spec = ModelSpec.from_config(cfg, num_classes=num_classes, camera_num=4)
    params, bn_state = init_signal_params(jax.random.PRNGKey(0), spec)
    jax.block_until_ready(params)
    lap("init_signal_params done")
    group_trees = build_param_groups(params, cfg)
    opt_state = adam_init(params)
    jax.block_until_ready(opt_state)
    lap("param groups + adam_init done")

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
    jax.block_until_ready(batch)
    lap("batch materialized")
    lr_a, lr_b = schedule_coeffs(cfg, 1)
    la, lb = jnp.float32(lr_a), jnp.float32(lr_b)

    # the train step donates (params, bn_state, opt_state) — hand each
    # warm/timed sequence an on-device copy so the originals survive
    dup = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))

    steps = {}
    for pol in (pol_a, pol_b):
        cfg.MODEL.REMAT_POLICY = pol
        spec_p = ModelSpec.from_config(cfg, num_classes=num_classes, camera_num=4)
        steps[pol] = make_train_step(spec_p, cfg, num_classes)
        out = steps[pol](dup(params), dup(bn_state), dup(opt_state),
                         batch, la, lb, group_trees)
        lap(f"policy {pol}: compiled + warm (loss {float(out[3]):.3f})")

    n = 10
    results = {pol_a: [], pol_b: []}
    for rep in range(reps):
        for pol in (pol_a, pol_b):
            p, b_, o = dup(params), dup(bn_state), dup(opt_state)
            jax.block_until_ready(p)
            t0 = time.perf_counter()
            for _ in range(n):
                p, b_, o, loss, acc, _ = steps[pol](p, b_, o, batch, la, lb,
                                                    group_trees)
            float(loss)
            dt = time.perf_counter() - t0
            results[pol].append(round(B * n / dt, 2))
            lap(f"rep {rep} {pol}: {results[pol][-1]} samples/s")

    med = {p: sorted(v)[len(v) // 2] for p, v in results.items()}
    print(json.dumps({
        "metric": "remat_ab_train_samples_per_s",
        "policies": results,
        "median": med,
        "delta_pct": round(100 * (med[pol_b] - med[pol_a]) / med[pol_a], 2),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
