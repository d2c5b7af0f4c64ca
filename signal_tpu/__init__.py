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

from signal_tpu.config import Config, default_config, load_config  # noqa: F401
