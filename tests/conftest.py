"""Test env: force CPU JAX with 8 virtual devices.

The container's sitecustomize registers a remote-TPU (axon) backend at
interpreter startup — BEFORE this conftest runs — so env vars alone are
too late. jax.config still works because the backend is only registered,
not initialized, until first use.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""       # belt: no tunnel if re-exec'd
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
