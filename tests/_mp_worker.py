"""Worker for the 2-process `jax.distributed` test (spawned by
tests/test_multihost.py). Each process holds 2 virtual CPU devices →
a 4-device global ('data',) mesh across 2 hosts.

Covers: per-host PK train-loader sharding, one sharded train step,
the sharded val loader (global-metadata batches, tail padding), the
all-gathered eval, and the collective-gather + rank-0-write checkpoint.
"""

import json
import os
import sys


def main():
    pid, port, tmpdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    tp = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_enable_x64", False)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.device_count() == 4 and jax.local_device_count() == 2

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from signal_tpu.config import Config
    from signal_tpu.data import make_dataloader
    from signal_tpu.engine.eval import extract_features
    from signal_tpu.engine.train import _device_batch, make_train_step
    from signal_tpu.metrics import R1mAPEvaluator
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.parallel.mesh import create_mesh, shard_params
    from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs
    from signal_tpu.utils.checkpoint import save_checkpoint

    cfg = Config()
    cfg.DATASETS.NAMES = "synthetic"
    cfg.INPUT.SIZE_TRAIN = (64, 64)
    cfg.INPUT.SIZE_TEST = (64, 64)
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.DATALOADER.NUM_INSTANCE = 2
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.TEST.IMS_PER_BATCH = 12  # 16 val records → tail batch pads 8
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    cfg.MODEL.TOPK = 3

    (train_loader, _, val_loader, num_query, num_classes, cam_num,
     _) = make_dataloader(cfg, num_shards=jax.process_count(),
                          shard_index=jax.process_index())

    spec = ModelSpec.from_config(cfg, num_classes, cam_num)
    if tp > 1:
        # TP across hosts WITH the Pallas kernel: width 256 / 4 heads so
        # each 'model' shard is a 128-column Mosaic block
        spec = dataclasses.replace(spec, layers=2, width=256, feat_dim=64,
                                   num_heads=4, h=4, w=4, use_flash=True,
                                   compute_dtype="float32")
    else:
        spec = dataclasses.replace(spec, layers=2, width=32, feat_dim=16,
                                   num_heads=4, h=4, w=4, use_flash=False,
                                   compute_dtype="float32")
    params, bn_state = init_signal_params(jax.random.PRNGKey(cfg.SOLVER.SEED), spec)

    mesh = create_mesh(num_data=4 // tp, num_model=tp)
    with mesh:
        params = shard_params(params, mesh)
        group_trees = build_param_groups(params, cfg)
        opt_state = adam_init(params)
        train_step = make_train_step(spec, cfg, num_classes, mesh=mesh)
        lr_a, lr_b = schedule_coeffs(cfg, 1)

        batch = next(iter(train_loader))
        assert batch["imgs"]["RGB"].shape[0] == cfg.SOLVER.IMS_PER_BATCH // 2, \
            "train loader must yield the per-host micro-batch"
        db = _device_batch(batch, mesh)
        params, bn_state, opt_state, loss, acc, _ = train_step(
            params, bn_state, opt_state, db,
            jnp.float32(lr_a), jnp.float32(lr_b), group_trees)
        loss = float(loss)

        evaluator = R1mAPEvaluator(num_query, feat_norm=True)
        extract_features(spec, params, bn_state, val_loader, evaluator,
                         mesh=mesh,
                         normalize=(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD))
        cmc, mAP, *_ = evaluator.compute()

        save_checkpoint(os.path.join(tmpdir, f"mp_ckpt_tp{tp}"), {
            "params": params, "rank_probe": np.int32(jax.process_index())})

    print("RESULT " + json.dumps({
        "pid": pid, "loss": loss, "mAP": float(mAP), "cmc1": float(cmc[0]),
        "n_feats": int(sum(f.shape[0] for f in evaluator.feats)),
    }), flush=True)


if __name__ == "__main__":
    main()
