"""Bridge-overhead A/B: the SAME architecture (resnet50, last_stride=2,
eval mode) timed as (a) the native hand-written JAX model
(``models/resnet.py``) and (b) the reference zoo's torch definition
(`modeling/backbones/basic_cnn_params/resnet.py:425` in
maxingan2412/Signal) lowered through the torch→JAX bridge — both jitted
bf16 on the attached TPU at identical batch/shape.

Quantifies what the aten-lowering costs vs a hand-written model, i.e.
whether the 38-member bridged zoo leaves TPU performance on the table.

Usage: python scripts/bench_bridge_overhead.py [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _rate(fn, args, batch, short=10, long_=40):
    out = fn(*args)
    jax.block_until_ready(out)                     # compile + warmup

    def chain(iters):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        float(jnp.sum(o if not isinstance(o, tuple) else o[0]))
        return time.perf_counter() - t0

    dt = chain(long_) - chain(short)               # differential: tunnel-safe
    return batch * (long_ - short) / dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    x_np = np.random.default_rng(0).standard_normal(
        (batch, 3, 256, 128)).astype(np.float32)

    # --- native ---------------------------------------------------------
    from signal_tpu.models.resnet import init_resnet50_params, resnet50_forward

    # last_stride=2: torchvision/zoo geometry (the ReID variant uses 1)
    params, bn_state = init_resnet50_params(jax.random.PRNGKey(0),
                                            last_stride=2)
    native = jax.jit(lambda p, s, x: resnet50_forward(
        p, s, x, training=False, last_stride=2, compute_dtype=jnp.bfloat16))
    x = jnp.asarray(x_np)
    native_rate = _rate(lambda p, s, xx: native(p, s, xx),
                        (params, bn_state, x), batch)

    # --- bridged --------------------------------------------------------
    import torch

    from signal_tpu.models.zoo import load_zoo_module
    from signal_tpu.torch_bridge import lower_torch_module

    zoo_dir = os.environ.get(
        "SIGNAL_ZOO_DIR",
        "/root/reference/modeling/backbones/basic_cnn_params")
    mod = load_zoo_module(zoo_dir, "resnet.py")
    torch.manual_seed(0)
    tm = mod.resnet50(num_classes=171, pretrained=False).eval()
    bm = lower_torch_module(tm, (torch.zeros(batch, 3, 256, 128),),
                            compute_dtype=jnp.bfloat16)
    bridged = jax.jit(bm.fn)
    bparams = jax.device_put(bm.params)
    bridged_rate = _rate(lambda p, xx: bridged(p, xx), (bparams, x), batch)

    print(json.dumps({
        "metric": "bridge_overhead_resnet50_eval",
        "batch": batch,
        "native_samples_per_s": round(native_rate, 1),
        "bridged_samples_per_s": round(bridged_rate, 1),
        "bridged_over_native": round(bridged_rate / native_rate, 3),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
