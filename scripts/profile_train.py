"""Profile the full train step on the attached TPU and print the top ops.

Captures a jax.profiler device trace of N train steps and aggregates op
durations from the xplane proto (the tensorboard-plugin-profile converter
is broken in this image; the proto parse below is self-contained).
Caveats: ops inside the 12-layer `lax.scan` report their whole-scan
total, and while-body ops can double-count — treat numbers as relative
weight, not absolute seconds.

Usage: python scripts/profile_train.py [KEY VALUE ...]
"""

from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp


def parse_xplane(path: str, top: int = 30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    rows = collections.Counter()
    total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e12
                # collapse fusion suffixes: 'fusion.123' → 'fusion'
                base = name.split(".")[0]
                rows[base] += dur
                total += dur
    print(f"{'op':<44} {'s':>9}  {'%':>5}")
    for name, dur in rows.most_common(top):
        print(f"{name:<44} {dur:9.4f}  {100 * dur / max(total, 1e-12):5.1f}")
    return rows, total


def main():
    from bench import flagship_cfg
    from signal_tpu.engine.train import make_train_step
    from signal_tpu.models.signal_model import ModelSpec, init_signal_params
    from signal_tpu.solver import adam_init, build_param_groups, schedule_coeffs

    cfg = flagship_cfg(sys.argv[1:])  # the exact model bench.py measures
    num_classes = 171
    spec = ModelSpec.from_config(cfg, num_classes=num_classes, camera_num=4)
    params, bn_state = init_signal_params(jax.random.PRNGKey(0), spec)
    group_trees = jax.tree.map(jnp.asarray, build_param_groups(params, cfg))
    opt_state = adam_init(params)
    step = make_train_step(spec, cfg, num_classes)

    B = cfg.SOLVER.IMS_PER_BATCH
    rng = jax.random.PRNGKey(1)
    batch = {
        "imgs": {m: jax.random.normal(jax.random.fold_in(rng, i),
                                      (B, 3, 256, 128), jnp.float32)
                 for i, m in enumerate(("RGB", "NI", "TI"))},
        "pids": jax.random.randint(jax.random.fold_in(rng, 9), (B,), 0,
                                   num_classes),
        "camids": jnp.zeros((B,), jnp.int32),
    }
    if cfg.SOLVER.ACCUM_ITER > 1:  # step expects [A, B/A, ...] microbatches
        from signal_tpu.engine.train import _device_batch

        batch = _device_batch(batch, None, cfg.SOLVER.ACCUM_ITER)
    lr_a, lr_b = schedule_coeffs(cfg, 1)
    la, lb = jnp.float32(lr_a), jnp.float32(lr_b)

    def one(p, s, o):
        p, s, o, loss, _, _ = step(p, s, o, batch, la, lb, group_trees)
        return p, s, o, loss

    # compile + warm
    params, bn_state, opt_state, loss = one(params, bn_state, opt_state)
    print("warm loss:", float(loss))

    out_dir = "/tmp/signal_profile"
    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        params, bn_state, opt_state, loss = one(params, bn_state, opt_state)
    print("traced loss:", float(loss))
    jax.profiler.stop_trace()

    planes = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        print("no xplane captured")
        return
    parse_xplane(planes[-1])


if __name__ == "__main__":
    main()
