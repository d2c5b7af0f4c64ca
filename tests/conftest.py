"""Test env: force CPU JAX with 8 virtual devices BEFORE jax import.

The container routes JAX to a remote TPU through the axon tunnel
(PALLAS_AXON_POOL_IPS); tests must run hermetically on host CPU with a
virtual 8-device mesh for multi-chip sharding coverage.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""       # disable the TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
