"""Data layer tests: scanners, PK sampler, transforms, loader, config."""

import os

import numpy as np
import pytest
from PIL import Image

from signal_tpu.config import Config, load_config
from signal_tpu.data.datasets import build_dataset, synthetic_dataset
from signal_tpu.data.loader import make_dataloader, read_modalities
from signal_tpu.data.sampler import RandomIdentitySampler, shard_indices
from signal_tpu.data.transforms import TrainTransform, ValTransform


# --------------------------------------------------------------------------
# Dataset scanners against tiny on-disk fixtures
# --------------------------------------------------------------------------

def _make_rgbnt201_fixture(root):
    base = os.path.join(root, "RGBNT201")
    for split in ("train_171", "test"):
        for mod in ("RGB", "NI", "TI"):
            os.makedirs(os.path.join(base, split, mod), exist_ok=True)
    img = Image.fromarray(np.zeros((128, 64, 3), np.uint8))
    # filename: <pid6>_cam<cam>_<idx>.jpg  (pid from [:6], cam from [3])
    names = ["000001_cam1_00.jpg", "000001_cam2_01.jpg", "000002_cam1_00.jpg"]
    for split in ("train_171", "test"):
        for mod in ("RGB", "NI", "TI"):
            for n in names:
                img.save(os.path.join(base, split, mod, n))
    return root


def test_rgbnt201_scanner(tmp_path):
    root = _make_rgbnt201_fixture(str(tmp_path))
    ds = build_dataset("RGBNT201", root)
    assert len(ds.train) == 3 and len(ds.query) == 3
    paths, pid, camid, trackid = ds.train[0]
    assert len(paths) == 3 and trackid == -1
    assert ds.num_train_pids == 2          # relabeled 0..1
    pids = sorted({r[1] for r in ds.train})
    assert pids == [0, 1]
    cams = sorted({r[2] for r in ds.train})
    assert cams == [0, 1]                  # camid-1


def test_rgbnt100_scanner_and_packed_crop(tmp_path):
    base = os.path.join(str(tmp_path), "RGBNT100", "rgbir")
    for split in ("bounding_box_train", "query", "bounding_box_test"):
        os.makedirs(os.path.join(base, split), exist_ok=True)
    # packed 768x128 jpg: RGB|NI|TI side by side
    arr = np.zeros((128, 768, 3), np.uint8)
    arr[:, :256] = 10
    arr[:, 256:512] = 120
    arr[:, 512:] = 240
    img = Image.fromarray(arr)
    for split in ("bounding_box_train", "query", "bounding_box_test"):
        img.save(os.path.join(base, split, "0001_c3_00.jpg"))
        img.save(os.path.join(base, split, "0002_c1_00.jpg"))
    ds = build_dataset("RGBNT100", str(tmp_path))
    assert ds.packed_modalities
    path, pid, camid, _ = ds.train[0]
    assert isinstance(path, str) and camid in (0, 2)
    mods = read_modalities(path)
    assert len(mods) == 3
    means = [np.asarray(m).mean() for m in mods]
    assert means[0] < 50 and 100 < means[1] < 140 and means[2] > 200


def test_msvr310_scanner(tmp_path):
    base = os.path.join(str(tmp_path), "MSVR310")
    img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    # name: pppp_sSSS_vC_... pid=[0:4], sceneid=[6:9], camid=[11]
    for split in ("bounding_box_train", "query3", "bounding_box_test"):
        for vid in ("0001", "0002"):
            for mod in ("vis", "ni", "th"):
                os.makedirs(os.path.join(base, split, vid, mod), exist_ok=True)
            name = f"{vid}_s012_v3_000.jpg"
            for mod in ("vis", "ni", "th"):
                img.save(os.path.join(base, split, vid, mod, name))
    ds = build_dataset("MSVR310", str(tmp_path))
    assert len(ds.train) == 2
    _, pid, camid, sceneid = ds.train[0]
    assert camid == 3 and sceneid == 12
    assert ds.num_train_pids == 2


def test_msvwild863_scanner(tmp_path):
    base = os.path.join(str(tmp_path), "MSVWild863")
    img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    # name: <pid6>_cam<cam>_<idx>.jpg — pid from [:6], camid from [3]−1
    names = ["000001_cam1_00.jpg", "000001_cam3_01.jpg", "000007_cam2_00.jpg"]
    for split in ("train", "query", "test"):
        for mod in ("vis", "ni", "th"):
            os.makedirs(os.path.join(base, split, mod), exist_ok=True)
            for n in names:
                img.save(os.path.join(base, split, mod, n))
    ds = build_dataset("MSVWild863", str(tmp_path))
    assert len(ds.train) == 3 and len(ds.query) == 3 and len(ds.gallery) == 3
    paths, pid, camid, trackid = ds.train[0]
    assert len(paths) == 3 and trackid == -1
    assert "vis" in paths[0] and "ni" in paths[1] and "th" in paths[2]
    assert sorted({r[1] for r in ds.train}) == [0, 1]     # relabeled
    assert sorted({r[2] for r in ds.train}) == [0, 1, 2]  # camid − 1
    assert sorted({r[1] for r in ds.query}) == [1, 7]     # raw pids


# --------------------------------------------------------------------------
# PK sampler
# --------------------------------------------------------------------------

def test_pk_sampler_structure():
    ds = synthetic_dataset(num_pids=8, per_pid=10)
    s = RandomIdentitySampler(ds.train, batch_size=16, num_instances=4, seed=0)
    idxs = s.epoch_indices()
    assert len(idxs) % 4 == 0
    pids = [ds.train[i][1] for i in idxs]
    # every K-group is one identity; every batch has batch//K identities
    for start in range(0, len(idxs) - 16 + 1, 16):
        batch_pids = pids[start:start + 16]
        groups = [batch_pids[j:j + 4] for j in range(0, 16, 4)]
        for g in groups:
            assert len(set(g)) == 1
        assert len({g[0] for g in groups}) == 4


def test_pk_sampler_deterministic_and_shard():
    ds = synthetic_dataset(num_pids=8, per_pid=10)
    a = RandomIdentitySampler(ds.train, 16, 4, seed=5).epoch_indices()
    b = RandomIdentitySampler(ds.train, 16, 4, seed=5).epoch_indices()
    assert a == b
    shards = [shard_indices(a, 4, r, 16) for r in range(4)]
    # shards partition each global batch
    recon = []
    for start in range(0, len(a) - 16 + 1, 16):
        for r in range(4):
            recon.extend(shards[r][start // 16 * 4:(start // 16 + 1) * 4])
    assert recon == a[: len(recon)]


# --------------------------------------------------------------------------
# Transforms
# --------------------------------------------------------------------------

def test_train_transform_shape_and_range():
    tf = TrainTransform((256, 128), prob=0.5, re_prob=1.0, padding=10,
                        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (100, 50, 3), dtype=np.uint8).astype(np.uint8))
    out = tf(img, np.random.default_rng(0))
    assert out.shape == (3, 256, 128)
    assert out.dtype == np.float32


def test_val_transform_deterministic():
    tf = ValTransform((256, 128), (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    img = Image.fromarray(np.full((100, 50, 3), 128, np.uint8))
    out = tf(img)
    assert out.shape == (3, 256, 128)
    np.testing.assert_allclose(out.mean(), (128 / 255 - 0.5) / 0.5, atol=1e-3)


# --------------------------------------------------------------------------
# Loader end-to-end on synthetic
# --------------------------------------------------------------------------

def test_make_dataloader_synthetic():
    cfg = Config()
    cfg.DATASETS.NAMES = "synthetic"
    cfg.SOLVER.IMS_PER_BATCH = 16
    cfg.DATALOADER.NUM_INSTANCE = 4
    cfg.TEST.IMS_PER_BATCH = 6
    cfg.INPUT.SIZE_TRAIN = (64, 32)
    cfg.INPUT.SIZE_TEST = (64, 32)
    (train_loader, train_normal, val_loader, num_query,
     num_classes, cam_num, view_num) = make_dataloader(cfg)
    assert num_query == 8 and num_classes == 8

    batch = next(iter(train_loader))
    assert batch["imgs"]["RGB"].shape == (16, 3, 64, 32)
    assert batch["pids"].shape == (16,)

    batches = list(val_loader)
    total = sum(b["valid"] for b in batches)
    assert total == 16                       # 8 query + 8 gallery
    assert batches[-1]["imgs"]["RGB"].shape[0] == 6  # padded tail


# --------------------------------------------------------------------------
# Config system
# --------------------------------------------------------------------------

def test_native_decoder_matches_pil(tmp_path):
    from signal_tpu.data import native_decoder
    if not native_decoder.available():
        import pytest as _pytest

        _pytest.skip("native decoder not built (make -C native)")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        arr = rng.integers(0, 255, (128, 256, 3), dtype=np.uint8).astype(np.uint8)
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    out = native_decoder.decode_batch(paths, 256, 128,
                                      (0.5, 0.5, 0.5), (0.5, 0.5, 0.5), 2)
    assert out.shape == (3, 3, 256, 128)
    img = Image.open(paths[0]).convert("RGB").resize((128, 256), Image.BILINEAR)
    ref = ((np.asarray(img, np.float32) / 255. - 0.5) / 0.5).transpose(2, 0, 1)
    # PIL quantizes to uint8 after resampling; we keep float — ≤1 LSB apart
    assert np.abs(out[0] - ref).max() <= (1.0 / 255.0) / 0.5 + 1e-5


def test_val_loader_uses_native_path(tmp_path):
    from signal_tpu.data import native_decoder
    if not native_decoder.available():
        import pytest as _pytest

        _pytest.skip("native decoder not built")
    root = _make_rgbnt201_fixture(str(tmp_path))
    cfg = Config()
    cfg.DATASETS.NAMES = "RGBNT201"
    cfg.DATASETS.ROOT_DIR = root
    cfg.TEST.IMS_PER_BATCH = 4
    cfg.INPUT.SIZE_TEST = (64, 32)
    cfg.INPUT.SIZE_TRAIN = (64, 32)
    cfg.DATALOADER.NUM_INSTANCE = 1
    cfg.SOLVER.IMS_PER_BATCH = 2
    (_, _, val_loader, num_query, *_rest) = make_dataloader(cfg)
    batches = list(val_loader)
    total = sum(b["valid"] for b in batches)
    assert total == 6  # 3 query + 3 gallery fixtures
    assert batches[0]["imgs"]["RGB"].shape[1:] == (3, 64, 32)
    assert "names" in batches[0]


def test_config_yaml_roundtrip(tmp_path):
    cfg = load_config("configs/RGBNT201/Signal.yml")
    assert cfg.MODEL.USE_A and cfg.MODEL.USE_B
    assert cfg.MODEL.TOPK == 80
    assert cfg.SOLVER.BASE_LR == 0.00035
    assert cfg.INPUT.SIZE_TRAIN == (256, 128)
    assert cfg.MODEL.stageName == "together_CLS_Patch"


def test_config_opts_override():
    cfg = load_config("configs/RGBNT201/Signal.yml",
                      ["MODEL.USE_A", "False", "SOLVER.BASE_LR", "0.001",
                       "MODEL.STRIDE_SIZE", "[8, 8]"])
    assert cfg.MODEL.USE_A is False
    assert cfg.SOLVER.BASE_LR == 0.001
    assert cfg.MODEL.STRIDE_SIZE == (8, 8)


def test_config_rejects_bool_for_string_knob():
    cfg = Config()
    # CLI strings stay strings on a str knob (yacs-like)
    cfg.merge_from_list(["TEST.FEAT_NORM", "yes"])
    assert cfg.TEST.FEAT_NORM == "yes"
    # unquoted YAML `yes` parses to a bool — must error, not silently
    # disable the knob
    with _pytest_raises(ValueError):
        from signal_tpu.config import _merge_tree
        _merge_tree(cfg, {"TEST": {"RE_RANKING": True}})


def test_config_rejects_scalar_for_tuple_knob():
    cfg = Config()
    with _pytest_raises(ValueError):
        cfg.merge_from_list(["MODEL.STRIDE_SIZE", "12"])
    cfg.merge_from_list(["MODEL.STRIDE_SIZE", "[12, 12]"])
    assert cfg.MODEL.STRIDE_SIZE == (12, 12)


def _pytest_raises(exc):
    import pytest as _p
    return _p.raises(exc)


def test_native_decoder_u8_matches_pil_bitexact(tmp_path):
    """The uint8 output path rounds like PIL's post-resample clip8 —
    identity AND resample cases must match np.asarray(PIL) bit-for-bit."""
    from signal_tpu.data import native_decoder
    if not native_decoder.available():
        pytest.skip("native decoder not built (make -C native)")
    rng = np.random.default_rng(1)
    p_small = str(tmp_path / "small.jpg")   # 128x64 -> 256x128 upscale
    p_exact = str(tmp_path / "exact.jpg")   # 256x128 identity
    Image.fromarray(rng.integers(0, 255, (128, 64, 3), dtype=np.uint8)
                    ).save(p_small, quality=95)
    Image.fromarray(rng.integers(0, 255, (256, 128, 3), dtype=np.uint8)
                    ).save(p_exact, quality=95)
    for p, filt, pil_f in ((p_small, "bilinear", Image.BILINEAR),
                           (p_small, "bicubic", Image.BICUBIC),
                           (p_exact, "bilinear", Image.BILINEAR)):
        out = native_decoder.decode_batch_u8([p], 256, 128, 1, filter=filt)
        assert out.dtype == np.uint8 and out.shape == (1, 3, 256, 128)
        ref = np.asarray(Image.open(p).convert("RGB")
                         .resize((128, 256), pil_f)).transpose(2, 0, 1)
        mismatch = np.abs(out[0].astype(int) - ref.astype(int))
        # PIL's fixed-point resample vs our float accumulate: allow 1 LSB
        # on a handful of half-way pixels, never more
        assert mismatch.max() <= 1 and (mismatch > 0).mean() < 0.02, filt


def test_u8_batch_normalized_on_device_matches_float(tmp_path):
    """An emit_u8 loader batch fed through make_eval_step(normalize=...)
    must produce the same features as the pre-normalized float path."""
    import jax.numpy as jnp

    from signal_tpu.data import native_decoder
    if not native_decoder.available():
        pytest.skip("native decoder not built")
    from signal_tpu.data.augment import normalize_images

    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (2, 3, 8, 4), dtype=np.uint8)
    mean, std = (0.5, 0.4, 0.3), (0.5, 0.2, 0.1)
    got = normalize_images({"RGB": jnp.asarray(u8)}, mean, std)["RGB"]
    want = (u8.astype(np.float32) / 255.0
            - np.asarray(mean)[None, :, None, None]) \
        / np.asarray(std)[None, :, None, None]
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-5)
    # float input passes through untouched
    f32 = want.astype(np.float32)
    same = normalize_images({"RGB": jnp.asarray(f32)}, mean, std)["RGB"]
    np.testing.assert_array_equal(np.asarray(same), f32)


def test_val_loader_emits_u8_and_eval_consumes_it(tmp_path):
    from signal_tpu.data import native_decoder
    if not native_decoder.available():
        pytest.skip("native decoder not built")
    root = _make_rgbnt201_fixture(str(tmp_path))
    cfg = Config()
    cfg.DATASETS.NAMES = "RGBNT201"
    cfg.DATASETS.ROOT_DIR = root
    cfg.TEST.IMS_PER_BATCH = 4
    cfg.INPUT.SIZE_TEST = (64, 32)
    cfg.INPUT.SIZE_TRAIN = (64, 32)
    cfg.DATALOADER.NUM_INSTANCE = 1
    cfg.SOLVER.IMS_PER_BATCH = 2
    (_, _, val_loader, *_rest) = make_dataloader(cfg)
    batch = next(iter(val_loader))
    assert batch["imgs"]["RGB"].dtype == np.uint8
    # and the knob turns it back off
    cfg.DATALOADER.DEVICE_NORMALIZE = False
    (_, _, val_loader, *_rest) = make_dataloader(cfg)
    batch = next(iter(val_loader))
    assert batch["imgs"]["RGB"].dtype == np.float32


def test_loader_packed_buffer_is_contiguous_view_parent(tmp_path):
    """Both loader paths must ship `packed` — ONE contiguous
    [B, 3modal, 3ch, H, W] buffer whose per-modality 'imgs' entries are
    views into it (single H2D transfer, device-side split)."""
    import numpy as np
    from PIL import Image

    from signal_tpu.data.loader import _BatchLoader
    from signal_tpu.data.transforms import ValTransform

    rng = np.random.default_rng(0)
    records = []
    for i in range(4):
        paths = []
        for m in range(3):
            p = tmp_path / f"{i}_{m}.jpg"
            Image.fromarray(rng.integers(0, 255, (64, 32, 3), dtype=np.uint8)
                            ).save(p, quality=90)
            paths.append(str(p))
        records.append((tuple(paths), i, 0, -1))
    vt = ValTransform((64, 32), (0.5,) * 3, (0.5,) * 3)
    for emit_u8 in (True, False):
        loader = _BatchLoader(records, vt, 4, lambda: list(range(4)),
                              drop_last=True, seed=0, num_threads=2,
                              emit_u8=emit_u8)
        batch = next(iter(loader))
        packed = batch["packed"]
        assert packed.shape == (4, 3, 3, 64, 32)
        assert packed.flags["C_CONTIGUOUS"]
        assert packed.dtype == (np.uint8 if emit_u8 else np.float32)
        for i, m in enumerate(("RGB", "NI", "TI")):
            np.testing.assert_array_equal(batch["imgs"][m], packed[:, i])


def test_pil_fallback_emits_u8(tmp_path):
    """With emit_u8, the PIL path (non-jpg records) must also ship uint8
    via ValTransform.raw_u8 — matching the native decoder's contract."""
    import numpy as np

    from signal_tpu.data.loader import _BatchLoader
    from signal_tpu.data.transforms import ValTransform

    records = [((f"synth:{i % 2}:{i}:0", f"synth:{i % 2}:{i}:1",
                 f"synth:{i % 2}:{i}:2"), i, 0, -1) for i in range(4)]
    vt = ValTransform((64, 32), (0.5,) * 3, (0.5,) * 3)
    loader = _BatchLoader(records, vt, 4, lambda: list(range(4)),
                          drop_last=True, seed=0, num_threads=1, emit_u8=True)
    batch = next(iter(loader))
    assert batch["packed"].dtype == np.uint8


def test_prefetch_overlap_and_errors():
    import time

    from signal_tpu.data.prefetch import prefetch

    # order preserved, all items delivered
    out = list(prefetch(range(10), lambda x: x * 2, depth=3))
    assert out == [i * 2 for i in range(10)]

    # worker exceptions surface to the consumer
    def bad(x):
        if x == 3:
            raise RuntimeError("boom")
        return x

    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        list(prefetch(range(10), bad))

    # early abandonment doesn't deadlock the worker
    gen = prefetch(range(1000), lambda x: x, depth=2)
    assert next(gen) == 0
    gen.close()

    # the put of item n+1 runs while the consumer processes item n
    times = []

    def record(x):
        times.append(("put", x, time.perf_counter()))
        return x

    consumed = []
    for item in prefetch(range(3), record, depth=2):
        time.sleep(0.05)
        consumed.append(("got", item, time.perf_counter()))
    # item 1's put happened before item 0 was consumed (overlap)
    put1 = next(t for k, i, t in times if k == "put" and i == 1)
    got0 = next(t for k, i, t in consumed if k == "got" and i == 0)
    assert put1 < got0
