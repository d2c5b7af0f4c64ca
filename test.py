"""Test CLI — mirrors the reference's `test.py` interface:

    python test.py --config_file configs/RGBNT201/Signal.yml TEST.WEIGHT <ckpt>

(reference `test.py:10-52` in maxingan2412/Signal; the hardcoded .pth path
is replaced by TEST.WEIGHT — an orbax dir or a torch .pth, auto-detected).
Thin shim over `signal_tpu.cli.test_main` (also installed as
`signal-tpu-test`).
"""

from signal_tpu.cli import test_main as main

if __name__ == "__main__":
    main()
