#!/usr/bin/env python
"""Export a TPU-trained Signal checkpoint as a reference-format torch
.pth (keys per the reference's `modeling/make_model.py` Signal module),
so it drops into the reference's `load_param` and the surrounding torch
ecosystem (their vis/ablation scripts, GradCAM drivers, …).

Usage:
  python scripts/export_torch_checkpoint.py --config_file configs/RGBNT201/Signal.yml \
      TEST.WEIGHT /path/to/orbax_ckpt -o Signal_tpu_trained.pth \
      [--num_classes N --camera_num C]

Round-trip tested: importing the exported .pth back through
TEST.WEIGHT reproduces the original param tree exactly
(tests/test_clip_loader.py).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config_file", required=True)
    ap.add_argument("-o", "--out", required=True, help="output .pth path")
    ap.add_argument("--num_classes", type=int, default=None,
                    help="classifier size (skip the dataset scan)")
    ap.add_argument("--camera_num", type=int, default=None)
    ap.add_argument("--view_num", type=int, default=1)
    ap.add_argument("--shrink", default="", help="ModelSpec overrides "
                    "k=v,... (CI smoke only)")
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()

    from signal_tpu.cli import build_model_for_test, parse_spec_overrides
    from signal_tpu.config import load_config
    from signal_tpu.models.clip_loader import save_reference_signal_checkpoint

    cfg = load_config(args.config_file, args.opts)
    if not cfg.TEST.WEIGHT:
        ap.error("pass the checkpoint to export as `TEST.WEIGHT <path>`")
    spec, params, bn_state = build_model_for_test(
        cfg, num_classes=args.num_classes, camera_num=args.camera_num,
        view_num=args.view_num,
        spec_overrides=parse_spec_overrides(args.shrink))
    save_reference_signal_checkpoint(params, bn_state, spec, args.out)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB, "
          f"reference Signal state-dict format)")


if __name__ == "__main__":
    main()
