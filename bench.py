"""Benchmark: 3-modal eval + train throughput of the full Signal model.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "train_samples_per_s": N, "train_vs_baseline": N, "train_mfu_pct": N,
   "eval_mfu_pct": N, "device_kind": "..."}

Baselines (BASELINE.md): the reference's eval pass over RGBNT201
query+gallery (≈4787 3-modality samples in ~67 s on its logged GPU run,
`test_RNT201/test_log.txt`) ≈ 71 imgs/s; its full-model A100 *train*
throughput is 202.2 samples/s at B=64. MFU uses XLA's own cost analysis
plus the analytic Pallas-attention FLOPs (`signal_tpu/utils/flops.py`).
"""

from __future__ import annotations

import json
import os
import threading
import time

import jax
import jax.numpy as jnp

REFERENCE_EVAL_IMGS_PER_S = 4787 * 1.0 / 67.0  # ≈ 71.4 (3-modal samples/s)
REFERENCE_TRAIN_SAMPLES_PER_S = 202.2          # A100-80GB, full model, B=64


def _arm_watchdog(deadline_s: float | None = None):
    """Guard against the remote-TPU tunnel hanging the bench forever.

    Device init / compile RPCs through the tunnel block with no timeout
    when the other end is down; a silent hang records nothing. If the
    result line has not printed within ``SIGNAL_TPU_BENCH_WATCHDOG_S``
    seconds (default 2700 — a normal run is ~10 min), print a diagnostic
    JSON line in the same schema and hard-exit 3 so the failure is
    attributable. Returns a disarm callback; 0 disables."""
    if deadline_s is None:
        deadline_s = float(os.environ.get("SIGNAL_TPU_BENCH_WATCHDOG_S",
                                          "2700"))
    if deadline_s <= 0:
        return lambda: None
    done = threading.Event()

    def _fire():
        if not done.wait(deadline_s):
            line = {
                "metric": "3modal_eval_imgs_per_s_per_chip",
                "value": 0.0,
                "unit": "samples/s",
                "vs_baseline": 0.0,
                "error": f"bench did not complete within {deadline_s:.0f}s"
                         " — TPU backend unreachable or a compile RPC hung"
                         " (tunnel down?)",
            }
            # point the reader at the last recorded healthy run so an
            # environment outage isn't misread as a perf regression
            for prev in ("BENCH_r02.json", "BENCH_r01.json"):
                p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 prev)
                if os.path.exists(p):
                    try:
                        with open(p) as f:
                            rec = json.load(f)
                        # driver wrapper files carry the result under
                        # 'parsed'; bare result lines pass through
                        line["last_recorded"] = {
                            "file": prev, **rec.get("parsed", rec)}
                    except Exception:
                        pass
                    break
            print(json.dumps(line), flush=True)
            os._exit(3)

    threading.Thread(target=_fire, daemon=True).start()
    return done.set


def _retry(fn):
    """One retry: the remote-TPU tunnel occasionally drops a first request
    with a transient FAILED_PRECONDITION."""
    for attempt in (0, 1):
        try:
            return fn()
        except Exception:
            if attempt:
                raise
            time.sleep(5)


def bench_eval(cfg, spec, params, bn_state, B: int = 128):
    from signal_tpu.models.signal_model import forward_eval

    # default B=128: reference TEST.IMS_PER_BATCH for RGBNT201
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

    _retry(lambda: float(run_n(params, bn_state, imgs, cam)))  # compile+warm
    t0 = time.perf_counter()
    float(run_n(params, bn_state, imgs, cam))
    dt = time.perf_counter() - t0
    return B * n_iters / dt, B


def bench_train(cfg, spec, params, bn_state, num_classes: int, B: int = 0):
    from signal_tpu.engine.train import make_train_step
    from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs

    group_trees = build_param_groups(params, cfg)
    opt_state = adam_init(params)
    train_step = make_train_step(spec, cfg, num_classes)

    B = B or cfg.SOLVER.IMS_PER_BATCH
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

    # N steps chained on device in one executable (same rationale as
    # bench_eval: the host fetch of the summed loss is the sync point, so
    # the remote-TPU tunnel's per-dispatch latency stays out of the
    # per-chip rate). The state threading through the fori_loop carry is
    # the real data dependence — nothing can be hoisted.
    n = 10

    @jax.jit
    def run_n(p, s, o):
        def body(i, carry):
            p, s, o, acc = carry
            b = {"imgs": {k: v + 1e-6 * i.astype(jnp.float32)
                          for k, v in batch["imgs"].items()},
                 "pids": batch["pids"], "camids": batch["camids"]}
            p, s, o, loss, _, _ = train_step(p, s, o, b, la, lb, group_trees)
            return (p, s, o, acc + loss)
        p, s, o, acc = jax.lax.fori_loop(
            0, n, body, (p, s, o, jnp.float32(0.0)))
        return acc

    _retry(lambda: float(run_n(params, bn_state, opt_state)))  # compile+warm
    t0 = time.perf_counter()
    float(run_n(params, bn_state, opt_state))
    dt = time.perf_counter() - t0
    return B * n / dt, B, dt / n


def bench_e2e_eval(cfg, spec, params, bn_state, n_samples: int = 1024):
    """Loader→device end-to-end eval with a per-stage breakdown:

      decode   — threaded native-C++ jpg decode + u8 collate only
      h2d      — decode + ONE packed [B,3,3,H,W] uint8 host→device
                 transfer per batch (blocked, so the stage is attributable)
      full     — decode + transfer + forward with a background prefetch
                 thread (`signal_tpu.data.prefetch`): batch n+1's decode
                 AND H2D overlap batch n's forward, so
                 full ≈ min over the stage rates, not their sum

    Returns (full_rate, ncpu, breakdown_dict). Measured here (1-core
    host, chip behind a network tunnel): decode 532/s, decode+H2D 104/s,
    full 107/s — the TUNNEL binds (~38 MB/s of packed uint8; the single
    packed transfer is what lifted H2D 32→104/s over three per-modality
    transfers). On a real TPU-VM host the chip is PCIe-local (>10 GB/s,
    H2D ≈ free) and per-core decode (~530/s on noise JPEGs) becomes the
    binding stage — size the host at ceil(chip_rate / per-core decode)
    cores. Requires the native decoder (auto-built on first use); the
    PIL fallback would measure a different pipeline (float32 wire)."""
    import os
    import shutil
    import tempfile

    import numpy as np
    from PIL import Image

    from signal_tpu.data.loader import _BatchLoader
    from signal_tpu.data.prefetch import prefetch
    from signal_tpu.data.transforms import ValTransform
    from signal_tpu.engine.eval import make_eval_step

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="signal_e2e_bench_")
    records = []
    for i in range(n_samples):
        paths = []
        for m in range(3):
            p = os.path.join(tmp, f"{i}_{m}.jpg")
            Image.fromarray(rng.integers(0, 255, (256, 128, 3), dtype=np.uint8)
                            ).save(p, quality=90)
            paths.append(p)
        records.append((tuple(paths), i, 0, -1))

    B = 128
    vt = ValTransform((256, 128), cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD)
    ncpu = os.cpu_count() or 1
    loader = _BatchLoader(records, vt, B, lambda: list(range(n_samples)),
                          drop_last=True, seed=0, num_threads=ncpu,
                          emit_u8=True)  # normalize on device (4x less wire)
    eval_step = make_eval_step(
        spec, normalize=(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD))

    def put(batch):
        # single packed uint8 buffer — one tunnel round trip per batch
        return (jnp.asarray(batch["packed"]), jnp.asarray(batch["camids"]))

    def run_decode():
        count = 0
        for batch in loader:
            count += batch["packed"].shape[0]
        return count

    def run_h2d():
        count = 0
        for batch in loader:
            imgs, _ = put(batch)
            jax.block_until_ready(imgs)
            count += imgs.shape[0]
        return count

    def run_full():
        acc = None
        count = 0
        for imgs, camids in prefetch(loader, put):
            feats = eval_step(params, bn_state, imgs, camids)
            acc = feats if acc is None else acc + feats
            count += feats.shape[0]
        float(jnp.sum(acc))  # sync
        return count

    def timed(fn):
        t0 = time.perf_counter()
        count = fn()
        return count / (time.perf_counter() - t0)

    try:
        from signal_tpu.data import native_decoder

        _retry(run_full)  # compile + warm page cache + tunnel stream init
        breakdown = {
            "native_decoder": native_decoder.available(),
            "decode_samples_per_s": round(timed(run_decode), 2),
            "decode_h2d_samples_per_s": round(timed(run_h2d), 2),
        }
        full_rate = timed(run_full)
        breakdown["full_samples_per_s"] = round(full_rate, 2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return full_rate, ncpu, breakdown


def flagship_cfg(overrides=None):
    """The canonical full-model benchmark config (RGBNT201 shape, B=64)
    — shared with scripts/profile_train.py so the profiler profiles the
    exact model bench.py benchmarks."""
    from signal_tpu.config import Config

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
    if overrides:  # optional KEY VALUE overrides for A/B runs
        cfg.merge_from_list(list(overrides))
    return cfg


def main():
    import sys

    disarm_watchdog = _arm_watchdog()

    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.utils.flops import (
        peak_flops_per_chip, signal_analytic_flops)

    cfg = flagship_cfg(sys.argv[1:])
    num_classes = 171

    spec = ModelSpec.from_config(cfg, num_classes=num_classes, camera_num=4)
    params, bn_state = init_signal_params(jax.random.PRNGKey(0), spec)

    eval_rate, eval_B = bench_eval(cfg, spec, params, bn_state)
    e2e_rate, host_cpus, e2e_breakdown = bench_e2e_eval(cfg, spec, params,
                                                        bn_state)
    train_rate, train_B, step_s = bench_train(cfg, spec, params, bn_state,
                                              num_classes)

    # MFU from the analytic matmul count (XLA's cost_analysis counts the
    # 12-layer scan body once and is blind through Pallas custom calls —
    # it under-reports by ~8×; see utils/flops.signal_analytic_flops).
    # MFU = model FLOPs (fwd + 2×fwd bwd, NO remat replay) / peak; HFU
    # additionally counts the remat recompute actually executed.
    peak = peak_flops_per_chip()
    eval_flops = signal_analytic_flops(spec, eval_B, train=False)
    eval_mfu = 100.0 * eval_flops * (eval_rate / eval_B) / peak
    train_flops = signal_analytic_flops(spec, train_B, train=True)
    train_mfu = 100.0 * train_flops / step_s / peak
    train_hw_flops = signal_analytic_flops(spec, train_B, train=True,
                                           hardware=True)
    train_hfu = 100.0 * train_hw_flops / step_s / peak

    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = "unknown"
    print(json.dumps({
        "metric": "3modal_eval_imgs_per_s_per_chip",
        "value": round(eval_rate, 2),
        "unit": "samples/s",
        "vs_baseline": round(eval_rate / REFERENCE_EVAL_IMGS_PER_S, 3),
        "train_samples_per_s": round(train_rate, 2),
        "train_vs_baseline": round(train_rate / REFERENCE_TRAIN_SAMPLES_PER_S, 3),
        "train_mfu_pct": round(train_mfu, 2),
        "train_hfu_pct": round(train_hfu, 2),
        "eval_mfu_pct": round(eval_mfu, 2),
        # loader→device pipeline (jpg decode in native C++, one packed
        # uint8 H2D per batch, prefetch overlap): on THIS box the remote
        # chip's tunnel binds `full` (breakdown: decode 532/s vs
        # decode+H2D 104/s); on a PCIe-local host H2D is ~free and
        # per-core decode binds, so matching the chip rate needs
        # ceil(chip_rate / per-core decode rate) cores
        "e2e_eval_samples_per_s": round(e2e_rate, 2),
        "e2e_breakdown": e2e_breakdown,
        "host_cpus": host_cpus,
        "decode_cores_needed_for_chip_rate": round(
            eval_rate / max(
                e2e_breakdown["decode_samples_per_s"] / host_cpus, 1e-9), 1),
        "device_kind": kind,
    }))
    disarm_watchdog()


if __name__ == "__main__":
    main()
