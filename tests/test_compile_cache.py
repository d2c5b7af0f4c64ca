"""The package enables JAX's persistent compilation cache by default.

TPU compiles of the full train step run minutes when the compiler sits
behind a network tunnel (measured ~10 min for the B=64 train step; ~3.5
min with a warm cache), so `signal_tpu/__init__.py` turns the on-disk
executable cache on for every entry point — except CPU-only runs
(JAX_PLATFORMS=cpu), where XLA:CPU's AOT loader spews machine-feature
errors on every load and compiles are cheap anyway. These tests pin
that contract; they run in a subprocess because the cache config is
process-global at import time.
"""

import os
import subprocess
import sys

_PROBE = (
    "import signal_tpu, jax; "
    "print(jax.config.jax_compilation_cache_dir or '')"
)


def _run(env_extra, *, drop=()):
    env = {k: v for k, v in os.environ.items() if k not in drop}
    env.update(env_extra)
    out = subprocess.run([sys.executable, "-c", _PROBE], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    return out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""


def test_cache_on_by_default(tmp_path):
    # no JAX_PLATFORMS (the normal TPU entry point) → cache at the
    # requested path, directory created eagerly so first compile can write
    d = str(tmp_path / "cache")
    got = _run({"SIGNAL_TPU_COMPILE_CACHE": d}, drop=("JAX_PLATFORMS",))
    assert got == d
    assert os.path.isdir(d)


def test_cache_opt_out():
    got = _run({"SIGNAL_TPU_NO_COMPILE_CACHE": "1"}, drop=("JAX_PLATFORMS",))
    assert got == ""


def test_cpu_only_runs_skip_cache():
    assert _run({"JAX_PLATFORMS": "cpu"}) == ""


def test_mixed_platforms_keep_cache(tmp_path):
    d = str(tmp_path / "cache")
    got = _run({"JAX_PLATFORMS": "cpu,tpu",
                "SIGNAL_TPU_COMPILE_CACHE": d})
    assert got == d


def test_default_location_under_home():
    got = _run({}, drop=("JAX_PLATFORMS",))
    assert got.endswith(os.path.join("signal_tpu", "jax_cache"))
