#!/usr/bin/env python
"""Export a trained Signal checkpoint as a self-contained serving
artifact (StableHLO via jax.export — see signal_tpu/serving.py).

Usage:
  python scripts/export_serving.py --config_file configs/RGBNT201/Signal.yml \
      TEST.WEIGHT /path/to/ckpt -o /path/to/artifact [--batch 128] [--uint8]

  --batch N   fixed-shape export (keeps the Pallas attention kernel when
              exporting on a TPU host); default: symbolic batch dim
              (one artifact serves any batch size, XLA attention path)
  --uint8     bake uint8→Normalize into the graph (artifact takes raw
              uint8 crops; 4× smaller transfers at the serving host)
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config_file", required=True)
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--uint8", action="store_true")
    ap.add_argument("--num_classes", type=int, default=None,
                    help="classifier size (skip the dataset scan)")
    ap.add_argument("--camera_num", type=int, default=None)
    ap.add_argument("--view_num", type=int, default=1,
                    help="view count for the SIE table (MODEL.SIE_VIEW "
                         "checkpoints); must match the training dataset")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. 'cpu,tpu': lower for several "
                         "platforms so one artifact serves both (XLA "
                         "attention path only)")
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()

    from signal_tpu import serving
    from signal_tpu.cli import build_model_for_test
    from signal_tpu.config import load_config

    cfg = load_config(args.config_file, args.opts)
    spec, params, bn_state = build_model_for_test(
        cfg, num_classes=args.num_classes, camera_num=args.camera_num,
        view_num=args.view_num)

    normalize = (tuple(cfg.INPUT.PIXEL_MEAN), tuple(cfg.INPUT.PIXEL_STD)) \
        if args.uint8 else None
    platforms = args.platforms.split(",") if args.platforms else None
    ex = serving.export_eval(params, bn_state, spec,
                             image_size=tuple(cfg.INPUT.SIZE_TEST),
                             batch=args.batch, normalize=normalize,
                             platforms=platforms)
    path = serving.save_exported(ex, args.out, extra_manifest={
        "config_file": args.config_file,
        "weight": cfg.TEST.WEIGHT,
        "image_size": list(cfg.INPUT.SIZE_TEST),
        "uint8_input": bool(args.uint8),
    })
    print(path)


if __name__ == "__main__":
    main()
