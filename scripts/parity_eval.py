"""One-command accuracy-parity harness against the reference's released
numbers.

    python scripts/parity_eval.py --weight Signal.pth --root /data \
        [--config configs/RGBNT201/Signal.yml] [--clip ViT-B-16.pt] \
        [--expected 80.3 85.2 91.4 93.7] [--tol 0.2] [opts KEY VALUE ...]

Imports the torch reference checkpoint (`clip_loader.
load_reference_signal_checkpoint`), runs the full `do_inference` pass and
compares mAP / Rank-1/5/10 against the reference's published RGBNT201
results (`/root/reference/test_RNT201/test_log.txt` tail; README.md:31).
Exits nonzero when |mAP − expected| > tol.

`--shrink k=v,...` overrides ModelSpec fields (dataclasses.replace) — used
only by the CI smoke test, which fabricates a tiny checkpoint with the
reference key schema (tests/test_parity_harness.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Signal-TPU accuracy parity check")
    ap.add_argument("--weight", required=True, help="reference Signal .pth")
    ap.add_argument("--root", required=True, help="dataset root dir")
    ap.add_argument("--config", default="configs/RGBNT201/Signal.yml")
    ap.add_argument("--clip", default="", help="optional ViT-B-16.pt (only "
                    "needed if the .pth lacks the fine-tuned tower)")
    ap.add_argument("--expected", nargs=4, type=float,
                    default=[80.3, 85.2, 91.4, 93.7],
                    metavar=("mAP", "R1", "R5", "R10"))
    ap.add_argument("--tol", type=float, default=0.2)
    ap.add_argument("--shrink", default="", help="ModelSpec overrides "
                    "k=v,... (CI smoke only)")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = ap.parse_args(argv)

    from signal_tpu.config import load_config
    from signal_tpu.data import make_dataloader
    from signal_tpu.engine.eval import do_inference
    from signal_tpu.models.clip_loader import load_reference_signal_checkpoint
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.utils.logger import setup_logger

    cfg = load_config(args.config, args.opts or None)
    cfg.DATASETS.ROOT_DIR = args.root
    if args.clip:
        cfg.MODEL.PRETRAIN_PATH_CLIP = args.clip
    setup_logger("signal_tpu", "", if_train=False)

    (_, _, val_loader, num_query, num_classes, camera_num,
     view_num) = make_dataloader(cfg)

    import jax

    spec = ModelSpec.from_config(cfg, num_classes, camera_num, view_num)
    if args.shrink:
        from signal_tpu.cli import parse_spec_overrides

        spec = dataclasses.replace(spec, **parse_spec_overrides(args.shrink))

    params, bn_state = init_signal_params(jax.random.PRNGKey(cfg.SOLVER.SEED), spec)
    params, bn_state = load_reference_signal_checkpoint(
        params, bn_state, args.weight, spec)

    cmc, mAP = do_inference(cfg, spec, params, bn_state, val_loader, num_query)
    got = [100 * mAP, 100 * cmc[0], 100 * cmc[4], 100 * cmc[9]]
    names = ("mAP", "Rank-1", "Rank-5", "Rank-10")
    ok = abs(got[0] - args.expected[0]) <= args.tol
    for n, g, e in zip(names, got, args.expected):
        print(f"{n:8s}: {g:6.1f}%  (expected {e:.1f}%)")
    print(f"PARITY {'OK' if ok else 'FAIL'}: |mAP − {args.expected[0]:.1f}| "
          f"{'<=' if ok else '>'} {args.tol}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
