"""Tests for the observability / research-tooling periphery: vis.py,
utils/{flops,tracer,profiler,meter,logger}."""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signal_tpu.utils.flops import cost_analysis, param_count
from signal_tpu.utils.meter import AverageMeter
from signal_tpu.utils.tracer import trace_callable
from signal_tpu.vis import (
    das_offset_field, input_saliency, masks_to_grids, overlay_mask,
    save_ranked_list)


def test_masks_to_grids_and_overlay():
    masks = {"RGB": np.r_[np.ones(4), np.zeros(4)].reshape(1, 8)}
    grids = masks_to_grids(masks, h=4, w=2)
    assert grids["RGB"].shape == (1, 4, 2)
    img = np.random.default_rng(0).random((3, 64, 32)).astype(np.float32)
    out = overlay_mask(img, grids["RGB"][0])
    assert out.shape == (64, 32, 3) and out.dtype == np.uint8
    # masked-out rows are dimmed relative to full-overlay alpha=1
    bright = overlay_mask(img, np.ones((4, 2)))
    assert out[40:, :, :].mean() <= bright[40:, :, :].mean()


def test_input_saliency_shapes():
    def fwd(imgs):
        return jnp.stack([imgs[m].mean(axis=(1, 2, 3)) for m in imgs], -1)

    imgs = {m: jnp.ones((2, 3, 8, 8)) for m in ("RGB", "NI", "TI")}
    sal = input_saliency(fwd, imgs)
    assert set(sal) == {"RGB", "NI", "TI"}
    assert sal["RGB"].shape == (2, 8, 8)
    assert np.all(np.asarray(sal["RGB"]) >= 0)  # absolute-valued


def test_das_offset_field():
    from signal_tpu.models.align import init_das_params

    params = init_das_params(jax.random.PRNGKey(0), 8)
    grid = np.random.default_rng(0).standard_normal((1, 8, 8, 4)).astype(np.float32)
    pos = das_offset_field(params, grid)
    # downsampled sample positions: (8/4)x(4/4) = 2x1 points, (x, y) coords
    assert pos.shape == (1, 2, 1, 2)
    assert np.isfinite(pos).all() and np.abs(pos).max() <= 1.0


def test_save_ranked_list(tmp_path):
    dist = np.asarray([[0.3, 0.1, 0.2], [0.5, 0.9, 0.0]])
    rows = save_ranked_list(dist, ["q0", "q1"], ["g0", "g1", "g2"],
                            str(tmp_path), topk=2)
    assert rows[0] == ["g1", "g2"] and rows[1] == ["g2", "g0"]
    assert (tmp_path / "ranked_lists.txt").exists()


def test_fusion_similarity_kde(tmp_path):
    """The before/after-fusion cosine-KDE figure (the reference's
    `visualize_similarity` variant) writes a non-empty png."""
    import pytest

    pytest.importorskip("matplotlib")
    from signal_tpu.vis import render_fusion_similarity_kde

    rng = np.random.default_rng(0)
    pre_s, pre_t = rng.standard_normal((2, 8, 16)), rng.standard_normal((2, 8, 16))
    post_t = pre_s + 0.1 * rng.standard_normal((2, 8, 16))  # fused: closer
    path = render_fusion_similarity_kde(
        pre_s, pre_t, pre_s, post_t, "r2t", str(tmp_path / "kde.png"))
    assert path is not None
    import os

    assert os.path.getsize(path) > 0


def test_ranked_list_grid_scene_filter(tmp_path):
    """MSVR310 variant: ranking excludes same-SCENE gallery entries
    (trackid slot), not same-camera ones."""
    import pytest

    pytest.importorskip("matplotlib")
    from signal_tpu.data.datasets import synthetic_dataset
    from signal_tpu.vis import render_ranked_list_grids

    ds = synthetic_dataset()
    # give query 0 scene 7; mark the nearest gallery row as scene 7 too —
    # the scene filter must skip it, the camera filter would not
    query = [(ds.query[0][0], ds.query[0][1], ds.query[0][2], 7)]
    gallery = [(r[0], r[1], r[2], 7 if i == 0 else i) for i, r in
               enumerate(ds.gallery[:4])]
    dist = np.asarray([[0.0, 0.1, 0.2, 0.3]])
    paths = render_ranked_list_grids(dist, query, gallery, str(tmp_path),
                                     topk=2, num_queries=1,
                                     scene_filter=True)
    if not paths:
        pytest.skip("matplotlib unavailable")
    assert len(paths) == 1


def test_cost_analysis_flops_positive():
    def f(x):
        return x @ x
    costs = cost_analysis(f, jnp.ones((32, 32)))
    # 32x32x32 matmul ≈ 2*32^3 flops (backend-dependent accounting; > 0)
    assert costs.get("flops", 0) > 0


def test_signal_analytic_flops():
    """Analytic FLOPs cross-check: the 3-modal ViT-B/16 eval forward at
    129 tokens is ~3x the canonical 17.6 GMAC/197-token ViT-B scaled to
    129 tokens (~23 GFLOPs/image); train MFU numerator = fwd + bwd(2x),
    remat replay counted only under hardware=True (HFU)."""
    from signal_tpu.config import Config
    from signal_tpu.models.signal_model import ModelSpec
    from signal_tpu.utils.flops import signal_analytic_flops

    cfg = Config()
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = True
    spec = ModelSpec.from_config(cfg, num_classes=171, camera_num=4)
    f_eval = signal_analytic_flops(spec, 1, train=False)
    # 3 x ~23 GFLOPs (ViT-B at 129 tokens) + SIM head
    assert 60e9 < f_eval < 85e9
    f_train = signal_analytic_flops(spec, 1, train=True)
    assert f_train == f_eval * 3.0
    f_hw = signal_analytic_flops(spec, 1, train=True, hardware=True)
    assert f_hw == f_eval * (4.0 if spec.remat else 3.0)
    # scales linearly in batch
    assert abs(signal_analytic_flops(spec, 8) - 8 * f_eval) < 1e-3 * f_eval


def test_param_count():
    tree = {"a": jnp.ones((3, 4)), "b": {"c": jnp.ones((5,))}}
    assert param_count(tree) == 17


def test_tracer_writes_log(tmp_path):
    out = str(tmp_path / "trace_log.txt")

    def g(n):
        return sum(range(n))

    result = trace_callable(g, 5, mode="calls", out_path=out)
    assert result == 10
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, 1)
    m.update(3.0, 3)
    assert m.avg == (1.0 + 9.0) / 4
    m.reset()
    assert m.avg == 0


def test_step_timer():
    from signal_tpu.utils.profiler import StepTimer

    t = StepTimer()
    t.tick(4)
    per_batch, speed = t.summary(batch_size=64)
    assert per_batch >= 0.0 and speed > 0.0 and t.batches == 4


def test_setup_logger(tmp_path):
    from signal_tpu.utils.logger import setup_logger

    lg = setup_logger("signal_tpu_test_xyz", str(tmp_path), if_train=True)
    lg.info("hello")
    assert (tmp_path / "train_log.txt").exists()
    # avoid duplicate handlers leaking into other tests
    for h in list(lg.handlers):
        lg.removeHandler(h)
    logging.getLogger("signal_tpu_test_xyz").handlers.clear()


def test_resnet_analytic_flops():
    """resnet50 at 256x128 last-stride-1 ≈ 8.1 GFLOPs/image (canonical
    4.09 GMACs at 224² scaled + 4x stage-4); train = fwd + bwd, no remat."""
    from signal_tpu.config import Config
    from signal_tpu.models.signal_model import ModelSpec
    from signal_tpu.utils.flops import signal_analytic_flops

    cfg = Config()
    cfg.MODEL.TRANSFORMER_TYPE = "resnet50"
    spec = ModelSpec.from_config(cfg, num_classes=171, camera_num=4)
    f = signal_analytic_flops(spec, 1)
    assert 20e9 < f < 30e9            # 3 modalities x ~8.1 G
    assert signal_analytic_flops(spec, 1, train=True) == 3.0 * f


def test_clip_vit_analytic_flops_mfu_vs_hfu():
    """CLIP ViT-B/16 at 256x128: fwd ≈ 3 × 11.5 G (129 tokens); MFU
    numerator = 3×fwd (NO remat replay), HFU adds the replay."""
    from signal_tpu.config import Config
    from signal_tpu.models.signal_model import ModelSpec
    from signal_tpu.utils.flops import signal_analytic_flops

    cfg = Config()
    cfg.MODEL.USE_A = False
    cfg.MODEL.USE_B = False
    spec = ModelSpec.from_config(cfg, num_classes=171, camera_num=4)
    assert spec.backbone == "clip" and spec.remat
    f = signal_analytic_flops(spec, 1)
    # ViT-B/16: ~22.8 GFLOPs per 129-token image (17.6 GMACs at 197
    # tokens ≈ 35.2 G scaled by 129/197) × 3 modalities ≈ 68 G
    assert 60e9 < f < 80e9
    assert signal_analytic_flops(spec, 1, train=True) == 3.0 * f
    assert signal_analytic_flops(spec, 1, train=True, hardware=True) == 4.0 * f


def test_imagenet_vit_analytic_flops():
    """vit_small (768w, 8L, mlp×3, no output proj): the analytic count
    must use the variant's mlp_ratio and skip the CLIP projection."""
    from signal_tpu.config import Config
    from signal_tpu.models.signal_model import ModelSpec
    from signal_tpu.utils.flops import signal_analytic_flops

    cfg = Config()
    cfg.MODEL.USE_A = False
    cfg.MODEL.USE_B = False
    cfg.MODEL.TRANSFORMER_TYPE = "vit_small_patch16_224"
    spec = ModelSpec.from_config(cfg, num_classes=171, camera_num=4)
    assert spec.backbone == "imagenet" and spec.mlp_ratio == 3.0
    f = signal_analytic_flops(spec, 1)
    # per layer (8+12)·768²·129 ≈ 1.52G; 8 layers + patch conv ≈ 12.4G;
    # × 3 modalities ≈ 37G
    assert 30e9 < f < 45e9
    # mlp_ratio must matter: a (hypothetical) mlp×4 model is ~15% bigger
    import dataclasses as dc
    f4 = signal_analytic_flops(dc.replace(spec, mlp_ratio=4.0), 1)
    assert f4 > 1.08 * f


def test_t2t_analytic_flops():
    """t2t_vit_t_14: soft-split stages counted; mlp_ratio 3; the stage-1
    token transformer (L0=2048 tokens at 64x128 input) dominates."""
    from signal_tpu.config import Config
    from signal_tpu.models.signal_model import ModelSpec
    from signal_tpu.utils.flops import signal_analytic_flops, _t2t_stage_flops

    cfg = Config()
    cfg.MODEL.USE_A = False
    cfg.MODEL.USE_B = False
    cfg.MODEL.TRANSFORMER_TYPE = "t2t_vit_t_14"
    spec = ModelSpec.from_config(cfg, num_classes=171, camera_num=4)
    assert spec.backbone == "t2t" and spec.mlp_ratio == 3.0
    stage = _t2t_stage_flops(spec)
    assert stage > 0
    f = signal_analytic_flops(spec, 1)
    # body: 14 layers × (8+12)·384²·129 ≈ 5.3G + stages; × 3 modalities.
    # attention1 over L0=(256/4)(128/4)=2048 tokens: 4·L0²·64 ≈ 1.07G
    assert 15e9 < f < 40e9
    assert stage * 3 < f  # stages are counted but don't dominate the body
    assert signal_analytic_flops(spec, 1, train=True) == 3.0 * f


def test_plot_ablation_scrape_and_render(tmp_path):
    """scripts/plot_ablation.py: the data-driven stand-in for the
    reference's hardcoded figure scripts (`zablation/tiaoxing.py`,
    `zablation/zhexian.py`) — scrape Best-metric lines, render both
    figure forms."""
    import importlib.util

    pytest.importorskip("matplotlib")
    spec = importlib.util.spec_from_file_location(
        "plot_ablation",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "plot_ablation.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    run = tmp_path / "sign1"
    run.mkdir()
    # last occurrence wins — mimic per-epoch Best lines
    (run / "train_log.txt").write_text(
        "INFO Best mAP: 60.0%\nINFO Best mAP: 68.3%\nINFO Best Rank-1: 72.1%\n")
    (tmp_path / "full.log").write_text(
        "INFO Best mAP: 78.8%\nINFO Best Rank-1: 82.5%\n")
    runs = mod.scrape_logs([str(tmp_path)])
    assert runs == {"sign1": {"mAP": 68.3, "Rank-1": 72.1},
                    "full": {"mAP": 78.8, "Rank-1": 82.5}}

    series = {"mAP": [75.2, 79.0], "R-1": [78.5, 82.8]}
    bars = mod.plot_bars([0.1, 0.2], series, str(tmp_path / "b.png"),
                         xlabel="keep ratio")
    lines = mod.plot_lines([0.1, 0.2], series, str(tmp_path / "l.png"),
                           xlabel="keep ratio")
    assert os.path.getsize(bars) > 0 and os.path.getsize(lines) > 0

    # CLI end-to-end: from-logs mode
    mod.main(["from-logs", str(tmp_path), "-o", str(tmp_path / "r.png")])
    assert os.path.getsize(tmp_path / "r.png") > 0

    # a run missing a requested metric scrapes to NaN — the chart must
    # still render (NaN may not poison ylim or the value labels)
    mod.main(["from-logs", str(tmp_path), "-o", str(tmp_path / "n.png"),
              "--metrics", "mAP,Rank-5"])
    assert os.path.getsize(tmp_path / "n.png") > 0

    # two sweeps with the same run basename: both must survive scraping
    for sweep in ("sweepA", "sweepB"):
        d = tmp_path / sweep / "sign1"
        d.mkdir(parents=True)
        (d / "train_log.txt").write_text("INFO Best mAP: 50.0%\n")
    both = mod.scrape_logs([str(tmp_path / "sweepA"), str(tmp_path / "sweepB")])
    assert len(both) == 2 and all(v == {"mAP": 50.0} for v in both.values())


def test_token_grad_cam():
    """Grad-CAM over patch tokens: nonnegative, normalized to max 1,
    and sensitive to which tokens carry signal."""
    import jax.numpy as jnp

    from signal_tpu.vis import token_grad_cam

    B, L, D = 2, 8, 16
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)

    def patches_fn(imgs):
        # toy "layer": token 3 amplified by the input scalar
        scale = jnp.ones((L,)).at[3].set(10.0)
        return {"RGB": imgs["RGB"] * scale[None, :, None]}

    cams = token_grad_cam(patches_fn, {"RGB": base})
    cam = cams["RGB"]
    assert cam.shape == (B, L)
    assert (cam >= 0).all() and np.allclose(cam.max(axis=1), 1.0)
    assert (cam.argmax(axis=1) == 3).all()   # the amplified token dominates
