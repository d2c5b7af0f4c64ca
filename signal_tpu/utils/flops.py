"""FLOPs / cost accounting via XLA's own cost analysis.

The reference counts FLOPs with fvcore and a hand-maintained op table
(`modeling/backbones/basic_cnn_params/flops.py`, `Signal.flops()` in
maxingan2412/Signal). On TPU the compiler already knows: jit-compile the
forward and read ``cost_analysis()`` — exact for the fused executable,
no op table to maintain.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """Compile ``fn(*args)`` and return XLA's cost analysis dict
    (keys incl. 'flops', 'bytes accessed', ...)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):
        costs = costs[0]
    return dict(costs or {})


def model_flops(spec, params, bn_state, batch_size: int = 1) -> float:
    """FLOPs (raw, not giga) of one Signal eval forward per XLA's own
    accounting (mirrors `Signal.flops()`). NOTE: under-reports through
    Pallas custom calls."""
    import jax.numpy as jnp

    from signal_tpu.models.signal_model import forward_eval

    ih, iw = spec.image_size
    imgs = {m: jnp.zeros((batch_size, 3, ih, iw), jnp.float32)
            for m in ("RGB", "NI", "TI")}
    cam = jnp.zeros((batch_size,), jnp.int32)
    costs = cost_analysis(
        lambda p, s, x, c: forward_eval(p, s, x, c, spec),
        params, bn_state, imgs, cam)
    return float(costs.get("flops", 0.0))


def param_count(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
