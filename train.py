"""Training CLI — mirrors the reference's `train.py` interface:

    python train.py --config_file configs/RGBNT201/Signal.yml [KEY VALUE ...]

(reference `train.py:24-109` in maxingan2412/Signal). Thin shim over
`signal_tpu.cli.train_main` (also installed as `signal-tpu-train`).
"""

from signal_tpu.cli import train_main as main

if __name__ == "__main__":
    main()
