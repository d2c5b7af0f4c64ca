"""Pipeline-schedule benchmark: GPipe bubble/memory vs PIPE_MICROBATCH.

Measures, at the FLAGSHIP model shape (12-layer ViT-B/16, 129 tokens,
flash attention ON, remat ON, full SIM+GAM+LAM), one pipelined train
step per (stages P, microbatches M) point on a virtual CPU mesh:

* ``temp_bytes``  — the compiled executable's per-device temp-buffer
  allocation (``compiled.memory_analysis()``): the empirical stored-
  activation footprint of the schedule. This is THE GPipe-vs-1F1B
  quantity — 1F1B's only advantage over GPipe at equal M is bounding
  in-flight microbatch activations at P instead of M, so the measured
  growth of temp_bytes with M (at fixed P and fixed total batch) IS the
  memory 1F1B would reclaim.
* ``step_s``      — wall time per step. CAVEAT: on a 1-core host all
  virtual mesh devices serialize, so the pipeline BUBBLE cannot appear
  in wall time (idle stages cost nothing when everything shares one
  core); wall time here tracks total work + per-microbatch schedule
  overhead only. The bubble column is therefore the closed-form GPipe
  fraction (P−1)/(M+P−1) — exact for this schedule, the same for 1F1B.

The reference (maxingan2412/Signal) has no pipeline mode at all
(`train.py:46-48`: NCCL DDP only); this benchmark exists to size
``PARALLEL.PIPE_MICROBATCH`` and to settle GPipe-vs-1F1B with data
(see docs/PARALLELISM.md and DESIGN.md for the recorded table).

Usage:  python scripts/bench_pp.py [--batch 8] [--stages 2,4]
                                   [--micro-mults 1,2,4] [--steps 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="images per step (encoder rows = 3x this)")
    ap.add_argument("--stages", type=str, default="2,4")
    ap.add_argument("--micro-mults", type=str, default="1,2,4",
                    help="M = mult * P for each stage count")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="2-layer thin spec + 64x64 images: plumbing smoke "
                         "only, numbers not meaningful")
    args = ap.parse_args()

    # force a CPU mesh before first backend use (same recipe as conftest):
    # pipeline stages need >= 2 devices and the bench host has one chip,
    # so this benchmark always runs on the virtual CPU mesh
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", int(args.devices))

    import jax.numpy as jnp
    import numpy as np

    from signal_tpu.config import Config
    from signal_tpu.engine.train import make_train_step
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
    from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs

    B, num_classes, cam_num = args.batch, 8, 4
    img_hw = (64, 64) if args.tiny else (256, 128)
    r = np.random.default_rng(42)
    imgs_np = {m: r.standard_normal((B, 3) + img_hw).astype(np.float32)
               for m in ("RGB", "NI", "TI")}
    pids_np = r.integers(0, num_classes, B)
    camids_np = r.integers(0, cam_num, B)

    def run_point(P_stages: int, M: int):
        cfg = Config()
        cfg.MODEL.USE_A = True
        cfg.MODEL.USE_B = True
        cfg.MODEL.TOPK = 80
        cfg.MODEL.stageName = "together_CLS_Patch"
        cfg.MODEL.SIE_COE = 1.0
        cfg.DATALOADER.SAMPLER = "softmax_triplet"
        cfg.SOLVER.OPTIMIZER_NAME = "Adam"
        cfg.SOLVER.IMS_PER_BATCH = B
        cfg.PARALLEL.PIPE_AXIS = P_stages
        cfg.PARALLEL.PIPE_MICROBATCH = M
        if args.tiny:
            cfg.INPUT.SIZE_TRAIN = [64, 64]
        spec = ModelSpec.from_config(cfg, num_classes=num_classes,
                                     camera_num=cam_num)
        if args.tiny:
            import dataclasses
            spec = dataclasses.replace(spec, layers=2, width=256, feat_dim=64,
                                       num_heads=4, h=4, w=4, topk=4)
        else:
            assert spec.layers == 12 and spec.h * spec.w + 1 == 129

        mesh = create_mesh(num_data=1, num_model=1, num_pipe=P_stages,
                           devices=jax.devices()[:P_stages])
        params, bn = init_signal_params(jax.random.PRNGKey(3), spec)
        lr_a, lr_b = schedule_coeffs(cfg, 1)
        la, lb = jnp.float32(lr_a), jnp.float32(lr_b)
        with mesh:
            params = shard_params(params, mesh)
            gt = build_param_groups(params, cfg)
            step = make_train_step(spec, cfg, num_classes, mesh=mesh)
            batch = shard_batch(
                {"imgs": {m: jnp.asarray(v) for m, v in imgs_np.items()},
                 "pids": jnp.asarray(pids_np),
                 "camids": jnp.asarray(camids_np)}, mesh)
            opt = adam_init(params)

            # AOT compile once: gives memory_analysis AND a callable
            # executable (avoids a second trace through jit's cache)
            from signal_tpu.parallel.mesh import use_mesh

            t0 = time.perf_counter()
            with use_mesh(mesh):
                compiled = step.jitted.lower(
                    params, bn, opt, batch, la, lb, gt).compile()
            compile_s = time.perf_counter() - t0
            temp_bytes = argument_bytes = None
            try:
                ma = compiled.memory_analysis()
                temp_bytes = int(ma.temp_size_in_bytes)
                argument_bytes = int(ma.argument_size_in_bytes)
            except Exception:
                pass

            loss = None
            times = []
            for i in range(1 + args.steps):
                t0 = time.perf_counter()
                params, bn, opt, loss_dev, _, _ = compiled(
                    params, bn, opt, batch, la, lb, gt)
                jax.block_until_ready(loss_dev)
                dt = time.perf_counter() - t0
                if i:          # first call warms allocator/transfer paths
                    times.append(dt)
                loss = float(loss_dev)

        bubble = (P_stages - 1) / (M + P_stages - 1)
        rec = {"stages": P_stages, "microbatches": M, "batch": B,
               "encoder_rows": 3 * B, "mb_rows": 3 * B // M,
               "bubble_frac": round(bubble, 4),
               "step_s": round(float(np.median(times)), 3),
               "compile_s": round(compile_s, 1),
               "temp_bytes_per_device": temp_bytes,
               "argument_bytes": argument_bytes,
               "loss": round(loss, 5),
               "schedule_steps": M + P_stages - 1}
        print(json.dumps(rec), flush=True)
        return rec

    stages = [int(s) for s in args.stages.split(",")]
    mults = [int(s) for s in args.micro_mults.split(",")]
    results = []
    for P_stages in stages:
        for mult in mults:
            M = mult * P_stages
            if (3 * B) % M:
                print(json.dumps({"stages": P_stages, "microbatches": M,
                                  "skipped": f"M must divide 3B={3 * B}"}),
                      flush=True)
                continue
            results.append(run_point(P_stages, M))

    # closed-form memory comparison at the REAL flagship batch (B=64):
    # per-stage stored boundary activations, bf16 [rows,129,768]
    rows = 3 * 64
    act_mb = 129 * 768 * 2 / 2**20
    for P_stages in stages:
        layers_per_stage = 12 // P_stages
        gpipe = rows * layers_per_stage * act_mb          # all M in flight
        for mult in mults:
            M = mult * P_stages
            onef1b = min(P_stages, M) * (rows / M) * layers_per_stage * act_mb
            print(json.dumps({
                "closed_form_at_B64": True, "stages": P_stages,
                "microbatches": M,
                "gpipe_stage_act_MiB": round(gpipe, 1),
                "1f1b_stage_act_MiB": round(onef1b, 1),
                "reclaimable_MiB": round(gpipe - onef1b, 1),
                "hbm_frac_reclaimed_v5e": round(
                    (gpipe - onef1b) / (15.75 * 1024), 4)}), flush=True)


if __name__ == "__main__":
    main()
