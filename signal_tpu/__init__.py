"""signal_tpu — a TPU-native multi-modal object re-identification framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the Signal
(AAAI-2026) multi-modal ReID framework (reference: maxingan2412/Signal):
RGB / near-infrared / thermal-infrared triplets encoded by a shared CLIP
ViT-B/16 tower, fused by a Selective Interaction Module (SIM), regularized
by Global (GAM) and Local (LAM) alignment, evaluated with mAP / CMC
retrieval metrics on RGBNT201 / RGBNT100 / MSVR310.

Design: functional, jit-first. Model parameters are pytrees; every
compute-path function is pure and shardable over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

import os as _os


def _enable_persistent_compile_cache() -> None:
    """Turn on JAX's on-disk executable cache (opt-out, not opt-in).

    TPU compiles of the full train step run minutes when the compiler
    lives across a network tunnel; the reference's torch workflow has no
    equivalent cost, so out of the box we amortize it to zero for every
    repeat invocation (CLI runs, benches, CI). Set
    SIGNAL_TPU_NO_COMPILE_CACHE=1 to disable, SIGNAL_TPU_COMPILE_CACHE
    to relocate the directory.
    """
    if _os.environ.get("SIGNAL_TPU_NO_COMPILE_CACHE"):
        return
    # CPU-only runs (JAX_PLATFORMS=cpu — the test suite, hermetic CLI
    # smokes) skip the cache: XLA:CPU compiles fast anyway, and its AOT
    # loader re-checks machine features on every load, spewing
    # "could lead to SIGILL" errors for its own pseudo-features
    # (+prefer-no-gather) on perfectly matching hosts.
    platforms = {p.strip().lower()
                 for p in _os.environ.get("JAX_PLATFORMS", "").split(",")
                 if p.strip()}
    if platforms and platforms <= {"cpu"}:
        return
    try:
        import jax

        path = _os.environ.get(
            "SIGNAL_TPU_COMPILE_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "signal_tpu", "jax_cache"))
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took >1s to compile; default (extremely
        # long traces only) would skip most of our steps
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass


_enable_persistent_compile_cache()

from signal_tpu.config import Config, default_config, load_config  # noqa: F401
