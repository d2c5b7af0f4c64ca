"""Throughput of a bridged zoo CNN on the attached TPU.

Builds the torch module from a zoo checkout, lowers it through the
torch→JAX bridge (bf16 conv/matmul compute), and times the jitted
forward with the same chained-dispatch discipline as bench.py (device
work forced by a scalar fetch, warmup excluded).

Usage: python scripts/bench_zoo.py [name] [batch] [zoo_dir]
       (defaults: se_resnet50 128 /root/reference/.../basic_cnn_params)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "se_resnet50"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    zoo_dir = (sys.argv[3] if len(sys.argv) > 3 else
               os.environ.get("SIGNAL_ZOO_DIR",
                              "/root/reference/modeling/backbones/"
                              "basic_cnn_params"))

    from signal_tpu.models.zoo import ZOO, build_zoo_backbone

    entry = ZOO[name]
    bm = build_zoo_backbone(name, zoo_dir=zoo_dir, num_classes=171,
                            batch_size=batch, compute_dtype=jnp.bfloat16)
    fn = jax.jit(bm.fn)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 3, *entry.input_hw)), jnp.float32)
    params = jax.device_put(bm.params)

    out = fn(params, x)
    jax.block_until_ready(out)                      # compile + warmup

    def chain(iters: int) -> float:
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(params, x)
        float(jnp.sum(o if not isinstance(o, tuple) else o[0]))  # force
        return time.perf_counter() - t0

    # differential timing (tunnel-safe): long chain minus short chain
    short, long_ = 10, 40
    dt = chain(long_) - chain(short)
    rate = batch * (long_ - short) / dt
    print(f'{{"metric": "zoo_bridge_eval_imgs_per_s", "model": "{name}", '
          f'"batch": {batch}, "value": {rate:.1f}, "unit": "samples/s", '
          f'"input_hw": {list(entry.input_hw)}, '
          f'"device": "{jax.devices()[0].device_kind}"}}')


if __name__ == "__main__":
    main()
