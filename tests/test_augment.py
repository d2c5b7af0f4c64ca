"""On-device train augmentation (`signal_tpu.data.augment`) + the native
bicubic train-decode path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from signal_tpu.data.augment import augment_batch


def _imgs(B=4, H=32, W=16, seed=0):
    rng = np.random.default_rng(seed)
    return {m: jnp.asarray(rng.standard_normal((B, 3, H, W)), jnp.float32)
            for m in ("RGB", "NI", "TI")}


def test_flip_prob_one_mirrors_and_zero_is_identity():
    imgs = _imgs()
    out0 = augment_batch(jax.random.PRNGKey(0), imgs, flip_prob=0.0,
                         re_prob=0.0, padding=0)
    for m in imgs:
        np.testing.assert_array_equal(np.asarray(out0[m]), np.asarray(imgs[m]))
    out1 = augment_batch(jax.random.PRNGKey(0), imgs, flip_prob=1.0,
                         re_prob=0.0, padding=0)
    for m in imgs:
        np.testing.assert_array_equal(np.asarray(out1[m]),
                                      np.asarray(imgs[m])[..., ::-1])


def test_pad_crop_preserves_shape_and_uses_fill():
    imgs = {m: jnp.ones((8, 3, 32, 16), jnp.float32) for m in ("RGB", "NI", "TI")}
    fill = (-1.0, -1.0, -1.0)
    out = augment_batch(jax.random.PRNGKey(1), imgs, flip_prob=0.0,
                        re_prob=0.0, padding=10, fill=fill)
    for m in imgs:
        o = np.asarray(out[m])
        assert o.shape == (8, 3, 32, 16)
        # every value is either original (1.0) or the pad fill (-1.0)
        assert set(np.round(np.unique(o), 5)) <= {-1.0, 1.0}
    # over many samples some crop offsets must shift → fill pixels visible
    assert any((np.asarray(out[m]) == -1.0).any() for m in imgs)


def test_erase_replaces_a_plausible_region():
    imgs = {m: jnp.zeros((16, 3, 64, 32), jnp.float32) for m in ("RGB", "NI", "TI")}
    out = augment_batch(jax.random.PRNGKey(2), imgs, flip_prob=0.0,
                        re_prob=1.0, padding=0)
    for m in imgs:
        o = np.asarray(out[m])
        changed = (o != 0).any(axis=1)            # [B, H, W]
        frac = changed.mean(axis=(1, 2))          # per-sample erased fraction
        # timm geometry: area ∈ [0.02, 1/3] of the image (rounding slack)
        assert (frac > 0.01).all() and (frac < 0.40).all()
        # erased pixels are ~N(0,1) noise
        vals = o[o != 0]
        assert 0.7 < vals.std() < 1.3
    out0 = augment_batch(jax.random.PRNGKey(2), imgs, flip_prob=0.0,
                         re_prob=0.0, padding=0)
    assert not np.asarray(out0["RGB"]).any()


def test_modalities_draw_independent_randomness():
    imgs = {m: jnp.zeros((8, 3, 64, 32), jnp.float32) for m in ("RGB", "NI", "TI")}
    out = augment_batch(jax.random.PRNGKey(3), imgs, flip_prob=0.0,
                        re_prob=1.0, padding=0)
    masks = {m: (np.asarray(out[m]) != 0).any(axis=1) for m in out}
    assert not np.array_equal(masks["RGB"], masks["NI"])


def test_native_train_decode_matches_pil_bicubic(tmp_path):
    from signal_tpu.data import native_decoder
    from signal_tpu.data.loader import _BatchLoader
    from signal_tpu.data.transforms import RawTrainDecode

    if not native_decoder.available():
        pytest.skip("native decoder not built")
    rng = np.random.default_rng(0)
    records = []
    for i in range(4):
        paths = []
        for m in range(3):
            p = str(tmp_path / f"img{i}_{m}.jpg")
            Image.fromarray(rng.integers(0, 255, (100, 50, 3)).astype(np.uint8)
                            ).save(p, quality=95)
            paths.append(p)
        records.append((tuple(paths), i % 2, 0, -1))

    tf = RawTrainDecode((64, 32), (0.5,) * 3, (0.5,) * 3)
    loader = _BatchLoader(records, tf, 4, lambda: [0, 1, 2, 3],
                          drop_last=True, seed=0, num_threads=2)
    batch = next(iter(loader))
    arr = batch["imgs"]["RGB"]
    assert arr.shape == (4, 3, 64, 32)
    # vs per-image PIL bicubic (the __call__ fallback)
    ref = np.stack([tf(Image.open(r[0][0]).convert("RGB")) for r in records])
    # PIL resamples uint8 in int16 fixed point; the native float path can
    # differ by a couple of 1/255 steps on a handful of pixels
    np.testing.assert_allclose(arr, ref, atol=0.05)
    assert float(np.abs(np.asarray(arr) - ref).mean()) < 0.005


def test_device_augment_train_step_end_to_end(tmp_path):
    """make_dataloader(DEVICE_AUGMENT) → engine step consumes the rng and
    runs augmentation inside the jitted step."""
    import dataclasses

    from signal_tpu.config import Config
    from signal_tpu.data import make_dataloader
    from signal_tpu.engine.train import do_train
    from signal_tpu.models.signal_model import ModelSpec

    cfg = Config()
    cfg.DATASETS.NAMES = "synthetic"
    cfg.INPUT.SIZE_TRAIN = (64, 64)
    cfg.INPUT.SIZE_TEST = (64, 64)
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.DATALOADER.NUM_INSTANCE = 2
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.DATALOADER.DEVICE_AUGMENT = True
    cfg.TEST.IMS_PER_BATCH = 8
    cfg.SOLVER.MAX_EPOCHS = 1
    cfg.SOLVER.EVAL_PERIOD = 5
    cfg.SOLVER.CHECKPOINT_PERIOD = 5
    cfg.MODEL.USE_A = True
    cfg.MODEL.USE_B = False
    cfg.MODEL.TOPK = 3
    cfg.OUTPUT_DIR = str(tmp_path)

    (train_loader, _, _, num_query, num_classes, cam_num,
     _) = make_dataloader(cfg)
    assert train_loader.device_augment
    spec = ModelSpec.from_config(cfg, num_classes, cam_num)
    spec = dataclasses.replace(spec, layers=2, width=32, feat_dim=16,
                               num_heads=4, h=4, w=4, use_flash=False,
                               compute_dtype="float32")
    state = do_train(cfg, spec, train_loader, None, num_query, num_classes,
                     max_steps_per_epoch=2)
    assert state.params is not None
