"""Round-2 parity-hole tests: sharded val loader, SIE cam×view slots,
MSVR310 rank dump, ranked-list image grids."""

import dataclasses

import jax
import numpy as np
import pytest

from signal_tpu.config import Config


def _val_cfg(**kw):
    cfg = Config()
    cfg.DATASETS.NAMES = "synthetic"
    cfg.INPUT.SIZE_TRAIN = (64, 64)
    cfg.INPUT.SIZE_TEST = (64, 64)
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.DATALOADER.NUM_INSTANCE = 2
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.TEST.IMS_PER_BATCH = 12
    for k, v in kw.items():
        setattr(cfg.TEST, k, v)
    return cfg


def test_sharded_val_loader_assembles_global_batches():
    """Two in-process shard iterations must tile every GLOBAL batch row
    exactly once and carry identical global metadata."""
    from signal_tpu.data import make_dataloader

    cfg = _val_cfg()
    loaders = [make_dataloader(cfg, num_shards=2, shard_index=i)[2]
               for i in (0, 1)]
    full = make_dataloader(cfg)[2]  # unsharded reference loader

    full_batches = list(full)
    shard_batches = [list(l) for l in loaders]
    assert len(shard_batches[0]) == len(shard_batches[1]) == len(full_batches)

    n_seen = 0
    for j, (b0, b1) in enumerate(zip(*shard_batches)):
        # local halves: rows [0,6) and [6,12) of global batch j
        g = np.concatenate([b0["imgs"]["RGB"], b1["imgs"]["RGB"]], axis=0)
        assert g.shape[0] == cfg.TEST.IMS_PER_BATCH
        # global metadata identical on both shards
        for key in ("pids", "camids", "trackids"):
            np.testing.assert_array_equal(b0["global"][key], b1["global"][key])
        assert b0["global"]["valid"] == b1["global"]["valid"]
        n_seen += b0["global"]["valid"]
        # vs the unsharded loader: same global image rows (val transform is
        # deterministic) and same metadata for the valid prefix
        v = full_batches[j]["valid"] if j == len(full_batches) - 1 \
            else full_batches[j]["imgs"]["RGB"].shape[0]
        assert b0["global"]["valid"] == v
        np.testing.assert_allclose(
            g[:v], full_batches[j]["imgs"]["RGB"][:v], rtol=1e-6)
        np.testing.assert_array_equal(
            b0["global"]["pids"][:v], full_batches[j]["pids"][:v])
    assert n_seen == 16  # 8 query + 8 gallery synthetic records


def test_sie_cam_view_slots_and_quirks():
    """`meta_arch.py:79-92` slot sizes; view-only table exists but is
    never applied (`cv_embed_sign = SIE_CAMERA`, meta_arch.py:41,101-103)."""
    from signal_tpu.models.signal_model import (
        ModelSpec, forward_eval, init_signal_params)

    def spec_for(cam, view, camera_num=3, view_num=2):
        cfg = Config()
        cfg.MODEL.SIE_CAMERA = cam
        cfg.MODEL.SIE_VIEW = view
        cfg.MODEL.USE_A = False
        cfg.MODEL.USE_B = False
        s = ModelSpec.from_config(cfg, num_classes=4, camera_num=camera_num,
                                  view_num=view_num)
        return dataclasses.replace(s, layers=1, width=32, feat_dim=16,
                                   num_heads=4, h=4, w=4, use_flash=False,
                                   compute_dtype="float32")

    s_both = spec_for(True, True)
    p_both, _ = init_signal_params(jax.random.PRNGKey(0), s_both)
    assert p_both["cv_embed"].shape == (3 * 2, s_both.width)

    s_cam = spec_for(True, False)
    p_cam, _ = init_signal_params(jax.random.PRNGKey(0), s_cam)
    assert p_cam["cv_embed"].shape == (3, s_cam.width)

    s_view = spec_for(False, True)
    p_view, bn_view = init_signal_params(jax.random.PRNGKey(0), s_view)
    assert p_view["cv_embed"].shape == (2, s_view.width)
    # quirk: view-only embedding is allocated but never applied — the
    # forward must not depend on it
    import jax.numpy as jnp

    imgs = {m: jnp.ones((2, 3, 64, 64), jnp.float32) for m in ("RGB", "NI", "TI")}
    cam = jnp.zeros((2,), jnp.int32)
    out1 = forward_eval(p_view, bn_view, imgs, cam, s_view)
    p_view2 = dict(p_view)
    p_view2["cv_embed"] = p_view["cv_embed"] + 123.0
    out2 = forward_eval(p_view2, bn_view, imgs, cam, s_view)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_msvr_rank_dump_format(tmp_path):
    from signal_tpu.metrics import dump_msvr_rank_lists

    rng = np.random.default_rng(0)
    distmat = rng.random((3, 6))
    path = dump_msvr_rank_lists(
        str(tmp_path / "re.txt"), distmat,
        q_pids=[1, 2, 3], g_pids=[1, 1, 2, 2, 3, 3],
        q_camids=[0, 1, 2], g_camids=[0, 1, 0, 1, 0, 1],
        q_sceneids=[5, 6, 7], g_sceneids=[5, 9, 6, 9, 7, 9])
    lines = open(path).read().splitlines()
    assert lines[0] == "rank list file"
    # per query: header + entries line
    assert lines[1].endswith(":") and lines[1] == "1_s5_v0:"
    # same-pid+same-scene gallery removed: query 0 must not list 1_s5
    assert "1_s5" not in lines[2]
    assert "1_s9" in lines[2]  # same pid, different scene is kept


def test_render_ranked_list_grids(tmp_path):
    from signal_tpu.data.datasets import synthetic_dataset
    from signal_tpu.vis import render_ranked_list_grids

    ds = synthetic_dataset()
    rng = np.random.default_rng(1)
    distmat = rng.random((len(ds.query), len(ds.gallery)))
    paths = render_ranked_list_grids(distmat, ds.query, ds.gallery,
                                     str(tmp_path), topk=4, num_queries=2)
    if not paths:  # returns [] (not None) without matplotlib
        pytest.skip("matplotlib unavailable")
    assert len(paths) == 2
    import os

    assert all(os.path.getsize(p) > 0 for p in paths)
