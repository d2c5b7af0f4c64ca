"""GPipe-style pipeline parallelism over the ViT's stacked blocks.

No reference equivalent (the reference's only strategy is NCCL DDP,
`train.py:46-48` in maxingan2412/Signal); this exists so backbones whose
weights + activations outgrow one chip's HBM can still train — the ViT's
scan-over-stacked-weights layout ([layers, ...] leaves) makes stage
partitioning a pure sharding decision.

TPU-native design:

* a third mesh axis 'pipe' holds ``layers / n_stages`` blocks per device
  (the block pytree's leading layer axis is simply sharded over 'pipe');
* the schedule is GPipe inside ONE ``shard_map``: every stage runs the
  same program for ``M + P − 1`` steps; activations hop stage→stage via
  ``lax.ppermute`` over ICI (the point-to-point each step is one
  microbatch's [mb, L, D] tile — tiny next to the per-stage compute);
* the whole pipeline is differentiable as-is: AD transposes ppermute to
  the reverse permutation, so the backward pass is the mirrored pipeline
  (full-forward-then-full-backward GPipe; activation memory is bounded
  by per-block remat exactly as in the unpipelined path — ``block_fn``
  arrives already checkpoint-wrapped);
* bubble fraction is the standard (P − 1)/(M + P − 1); pick
  ``microbatches ≥ 2·stages`` to amortize it.

Scope: composes with data parallelism (mesh ('data', 'model'=1, 'pipe'));
tensor parallelism inside a pipeline stage is rejected at mesh build time
(`mesh.create_mesh`) — at ViT-B scale one of the two always suffices, and
mixing them would put width-sharded activations through the stage hops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_blocks(blocks, x, block_fn, *, mesh: Mesh,
                    microbatches: int = 0) -> jnp.ndarray:
    """Run ``x`` through the stacked ``blocks`` as a GPipe pipeline.

    blocks: pytree with leaves stacked [layers, ...] (the lax.scan layout);
    x: [N, T, D] activations (batch dim may be sharded over 'data');
    block_fn(layer_params, h) -> h, already remat-wrapped by the caller.

    Returns [N, T, D], numerically identical to the plain
    ``lax.scan(block_fn, x, blocks)`` (per-sample ops only — microbatch
    slicing cannot change any sample's math).
    """
    n_stages = int(mesh.shape["pipe"])
    if n_stages == 1:
        def body(c, lp):
            return block_fn(lp, c), None
        return jax.lax.scan(body, x, blocks)[0]

    n_layers = int(jax.tree.leaves(blocks)[0].shape[0])
    if n_layers % n_stages:
        raise ValueError(
            f"PIPE_AXIS={n_stages} must divide the block count ({n_layers})")
    M = int(microbatches) if microbatches else n_stages
    N = x.shape[0]
    if N % M:
        raise ValueError(
            f"PIPE_MICROBATCH={M} must divide the (3×modality) batch {N}")
    dp = int(mesh.shape.get("data", 1))
    if (N // M) % dp:
        raise ValueError(
            f"microbatch size {N // M} must divide over the data axis ({dp})")

    xs = x.reshape((M, N // M) + x.shape[1:])
    block_specs = jax.tree.map(lambda _: P("pipe"), blocks)
    x_spec = P(None, "data") if dp > 1 else P()

    def stage_program(local_blocks, xs_local):
        # xs_local [M, mb, T, D]; local_blocks leaves [n_layers/P, ...]
        stage = jax.lax.axis_index("pipe")
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def run_stage(h):
            def body(c, lp):
                return block_fn(lp, c), None
            return jax.lax.scan(body, h, local_blocks)[0]

        def step(carry, t):
            state, out = carry
            # each stage hands its previous step's output downstream
            recv = jax.lax.ppermute(state, "pipe", perm)
            x_t = jax.lax.dynamic_index_in_dim(
                xs_local, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            h = jnp.where(stage == 0, x_t, recv)
            y = run_stage(h)
            # the last stage finished microbatch w = t − (P − 1)
            w = t - (n_stages - 1)
            out = jax.lax.cond(
                w >= 0,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, y, jnp.clip(w, 0, M - 1), 0),
                lambda o: o,
                out)
            return (y, out), None

        init = (jnp.zeros_like(xs_local[0]), jnp.zeros_like(xs_local))
        (_, out), _ = jax.lax.scan(step, init,
                                   jnp.arange(M + n_stages - 1))
        # only the last stage's buffer holds real outputs; psum of the
        # masked buffers broadcasts it back to every stage (the caller's
        # ln_post/proj/heads run replicated over 'pipe')
        out = jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, "pipe")

    fn = jax.shard_map(stage_program, mesh=mesh,
                       in_specs=(block_specs, x_spec), out_specs=x_spec,
                       check_vma=False)
    from signal_tpu.parallel.mesh import shard_local

    # the body traces NOW (inside this call); mark the trace as per-shard
    # so ops that consult the active mesh (the Pallas attention router)
    # run their local kernel instead of nesting another shard_map
    with shard_local():
        ys = fn(blocks, xs)
    return ys.reshape((N,) + x.shape[1:])
