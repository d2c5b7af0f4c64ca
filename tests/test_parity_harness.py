"""Smoke test of the one-command accuracy-parity harness
(`scripts/parity_eval.py` / `parity_eval.sh`): fabricate an RGBNT201
directory tree + a reference-format Signal checkpoint at tiny dims, run
the harness end-to-end, and check both exit paths."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
from _fabricate import fake_signal_sd  # noqa: E402
import parity_eval  # noqa: E402

WIDTH, LAYERS, OUT = 64, 2, 32


def _make_rgbnt201(root):
    base = os.path.join(root, "RGBNT201")
    rng = np.random.default_rng(0)
    # filename: <pid6>_cam<cam>_<idx>.jpg (pid from [:6], cam digit at [3])
    names = [f"{pid:06d}_cam{cam}_{i:02d}.jpg"
             for pid in (1, 2, 3) for cam in (1, 2) for i in range(2)]
    for split in ("train_171", "test"):
        for mod in ("RGB", "NI", "TI"):
            d = os.path.join(base, split, mod)
            os.makedirs(d, exist_ok=True)
            for n in names:
                arr = rng.integers(0, 255, (64, 32, 3)).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(d, n), quality=95)
    return root


@pytest.mark.slow
def test_parity_harness_end_to_end(tmp_path):
    root = _make_rgbnt201(str(tmp_path))
    rng = np.random.default_rng(1)
    # grid_hw: a real trained .pth stores the non-square ReID pos-embed
    # grid (here (64,32)/16 = 4x2) — regression cover for the import path
    sd = fake_signal_sd(rng, WIDTH, LAYERS, OUT, cam_num=2, num_classes=3,
                        grid_hw=(4, 2))
    weight = str(tmp_path / "Signalbest.pth")
    torch.save(sd, weight)

    base = [
        "--weight", weight, "--root", root,
        "--config", "configs/RGBNT201/Signal.yml",
        "--shrink", f"layers={LAYERS},width={WIDTH},feat_dim={OUT},"
                    "num_heads=4,use_flash=False,compute_dtype=float32",
    ]
    opts = [  # reference-style KEY VALUE overrides (argparse REMAINDER)
        "INPUT.SIZE_TRAIN", "(64, 32)", "INPUT.SIZE_TEST", "(64, 32)",
        "TEST.IMS_PER_BATCH", "8", "DATALOADER.NUM_WORKERS", "2",
        "MODEL.TOPK", "3",
    ]
    # generous tolerance → random weights still "pass": exercises rc=0
    rc_ok = parity_eval.main(base + ["--tol", "1000"] + opts)
    assert rc_ok == 0
    # strict tolerance vs the published 80.3 → must fail: exercises rc=1
    rc_fail = parity_eval.main(base + ["--tol", "1e-6"] + opts)
    assert rc_fail == 1
