"""Benchmark: 3-modal inference throughput of the full Signal model.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's eval pass over RGBNT201 query+gallery (≈4787
3-modality samples in ~67 s end-to-end on its logged GPU run,
`test_RNT201/test_log.txt`) ≈ 71 imgs/s; its A100 *train* throughput on
the full model is 202 samples/s (BASELINE.md). We report eval-forward
throughput per chip (batched 3-modal samples/s) against the 71 imgs/s
eval baseline.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_EVAL_IMGS_PER_S = 4787 * 1.0 / 67.0  # ≈ 71.4 (3-modal samples/s)


def main():
    import sys

    from signal_tpu.config import Config
    from signal_tpu.models.signal_model import (
        ModelSpec, forward_eval, init_signal_params)

    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    cfg.MODEL.TOPK = 80
    cfg.MODEL.SIE_COE = 1.0
    if len(sys.argv) > 1:  # optional KEY VALUE overrides for A/B runs
        cfg.merge_from_list(sys.argv[1:])

    spec = ModelSpec.from_config(cfg, num_classes=171, camera_num=4)
    params, bn_state = init_signal_params(jax.random.PRNGKey(0), spec)

    B = 128  # reference TEST.IMS_PER_BATCH for RGBNT201
    imgs = {m: jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(i), (B, 3, 256, 128), jnp.float32))
        for i, m in enumerate(("RGB", "NI", "TI"))}
    cam = jnp.zeros((B,), jnp.int32)

    # N iterations chained on device inside one executable; the host fetch
    # of the scalar checksum is the sync point (block_until_ready is
    # unreliable through the remote-TPU tunnel, and per-iter fetches would
    # measure tunnel latency instead of throughput). A per-iteration input
    # perturbation stops XLA from hoisting the loop-invariant forward.
    n_iters = 20

    @jax.jit
    def run_n(p, s, x, c):
        def body(i, acc):
            xi = {k: v + 1e-6 * i.astype(jnp.float32) for k, v in x.items()}
            return acc + jnp.sum(forward_eval(p, s, xi, c, spec))
        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    # one retry: the remote-TPU tunnel occasionally drops a first request
    # with a transient FAILED_PRECONDITION
    for attempt in (0, 1):
        try:
            float(run_n(params, bn_state, imgs, cam))  # compile + warm
            break
        except Exception:
            if attempt:
                raise
            time.sleep(5)
    t0 = time.perf_counter()
    float(run_n(params, bn_state, imgs, cam))
    dt = time.perf_counter() - t0

    imgs_per_s = B * n_iters / dt
    print(json.dumps({
        "metric": "3modal_eval_imgs_per_s_per_chip",
        "value": round(imgs_per_s, 2),
        "unit": "samples/s",
        "vs_baseline": round(imgs_per_s / REFERENCE_EVAL_IMGS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
