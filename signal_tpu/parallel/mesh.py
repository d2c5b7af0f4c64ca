"""Device-mesh parallelism: DP + optional TP over ICI.

The reference's only strategy is NCCL DDP (`train.py:46-48`,
`engine/processor.py:100-105` in maxingan2412/Signal). TPU-native
replacement: a 2-D ``jax.sharding.Mesh`` ('data', 'model') with GSPMD —

* data parallel: batch dim sharded over 'data'; the gradient all-reduce
  XLA inserts over ICI replaces DDP's bucketed NCCL all-reduce; BN batch
  stats become *global*-batch stats (single-GPU semantics, strictly
  better than DDP's per-replica stats);
* tensor parallel (no reference equivalent): Megatron-style column/row
  sharding of attention QKV/out and MLP fc/proj over 'model' — the ViT's
  768/3072-wide matmuls split cleanly across 2-4 chips;
* `find_unused_parameters=True` (needed by torch because USE_A/USE_B gate
  submodules) has no analogue: dead branches simply compile away.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# --------------------------------------------------------------------------
# Active-mesh context: lets ops deep inside the model (the Pallas attention
# kernel) discover the mesh at TRACE time without threading it through every
# forward signature. Set by the engine around its jitted steps (the trace
# happens inside the first call, which runs under the wrapper).
# --------------------------------------------------------------------------

_ACTIVE_MESH: Optional[Mesh] = None
_SHARD_LOCAL: bool = False


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def in_local_shard() -> bool:
    """True while tracing inside a manual shard_map body (the pipeline
    stage program): mesh-routing ops must run their per-shard local path
    — nesting another shard_map there is an error."""
    return _SHARD_LOCAL


@contextlib.contextmanager
def shard_local():
    global _SHARD_LOCAL
    prev = _SHARD_LOCAL
    _SHARD_LOCAL = True
    try:
        yield
    finally:
        _SHARD_LOCAL = prev


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    """Activate ``mesh`` for the duration (None = leave unchanged)."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    if mesh is not None:
        _ACTIVE_MESH = mesh
    try:
        yield
    finally:
        _ACTIVE_MESH = prev


def sequence_constrain(x):
    """Megatron-SP sharding constraint on a [B, L, D] residual stream:
    tokens over 'model'. Applied between ViT blocks when
    PARALLEL.SEQUENCE is on, it tells GSPMD to keep the LN / residual /
    elementwise regions token-sharded (activation bytes drop tp×) and to
    lower the attention out-proj's all-reduce as reduce-scatter(+later
    all-gather) — the Megatron-LM sequence-parallel schedule, derived
    from annotations instead of hand-written collectives. L=129 is not
    divisible by tp; GSPMD pads the last shard (correctness unaffected).
    No-op off-mesh, under a manual shard_map body, or without TP."""
    mesh = _ACTIVE_MESH
    if (mesh is None or _SHARD_LOCAL or "model" not in mesh.axis_names
            or int(mesh.shape["model"]) <= 1 or getattr(x, "ndim", 0) != 3):
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data", "model", None)))


def moe_constrain(x):
    """Expert-parallel sharding constraint on a [G, E, C, d] dispatched-
    expert tensor (`ops/moe.py`): groups over 'data', experts over
    'model'. GSPMD derives the dispatch/combine all-to-all from this one
    annotation — each 'model' shard holds E/tp experts and receives only
    the token slots routed to them. No-op off-mesh, inside a manual
    shard_map body, without TP, or when E doesn't divide."""
    mesh = _ACTIVE_MESH
    if (mesh is None or _SHARD_LOCAL or getattr(x, "ndim", 0) != 4):
        return x
    tp = (int(mesh.shape["model"]) if "model" in mesh.axis_names else 1)
    dp = (int(mesh.shape["data"]) if "data" in mesh.axis_names else 1)
    spec = [None, None, None, None]
    if dp > 1 and x.shape[0] % dp == 0:
        spec[0] = "data"
    if tp > 1 and x.shape[1] % tp == 0:
        spec[1] = "model"
    if spec == [None] * 4:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def create_mesh(num_data: int = -1, num_model: int = 1, num_pipe: int = 1,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_data == -1:
        num_data = n // (num_model * num_pipe)
    assert num_data * num_model * num_pipe == n, (
        f"mesh {num_data}x{num_model}x{num_pipe} != {n} devices")
    if num_pipe > 1:
        # tp inside a pipeline stage is rejected: it would put
        # width-sharded activations through the stage-to-stage ppermute
        # hops (see parallel/pipeline.py). dp × pp composes freely.
        assert num_model == 1, (
            "PARALLEL.MODEL_AXIS and PIPE_AXIS are mutually exclusive")
        arr = np.asarray(devices).reshape(num_data, num_model, num_pipe)
        return Mesh(arr, ("data", "model", "pipe"))
    arr = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard the batch dim over 'data' (axes before it replicate)."""
    return NamedSharding(mesh, P(*([None] * batch_axis), "data"))


def _spec_for(path: str, leaf) -> P:
    """Tensor-parallel partition specs for Signal parameter leaves.

    ViT block weights are stacked [layers, ...]; dim 0 is the scan axis.

    TP SCOPE (deliberate): only the ViT blocks shard over 'model' — they
    are >98% of the FLOPs (36 transformer layers vs one MHCA + tiny
    heads). SIM, the BNNeck/classifier heads, GAM/LAM, and the patch
    embed REPLICATE: at 2–4-way TP their compute is microseconds and
    replicating avoids per-layer collectives on 512-wide activations
    where the collective would cost more than the matmul it saves. The
    Pallas attention kernel runs sharded under TP via a shard_map over
    'model' head groups (`signal_tpu/ops/flash_attention.py`).
    """
    if "blocks.attn.qkv_kernel" in path:
        return P(None, None, "model")        # column-parallel (heads split)
    if "blocks.attn.qkv_bias" in path:
        return P(None, "model")
    if "blocks.attn.out_kernel" in path:
        return P(None, "model", None)        # row-parallel
    if "blocks.mlp.fc_kernel" in path:
        return P(None, None, "model")
    if "blocks.mlp.fc_bias" in path:
        return P(None, "model")
    if "blocks.mlp.proj_kernel" in path:
        return P(None, "model", None)
    if "blocks.moe." in path:
        # expert parallelism: the expert axis (dim 1 of the [L, E, ...]
        # stacks) shards over 'model'; the fp32 router replicates (it is
        # tiny and every token needs every column). The dispatched
        # activations carry the matching constraint (moe_constrain), so
        # GSPMD turns dispatch/combine into an all-to-all over 'model'.
        if "router" in path:
            return P()
        return P(None, "model")
    return P()


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for the model params (TP over 'model';
    under a pipeline mesh the ViT blocks' stacked layer axis shards over
    'pipe' — each stage holds its layers, matching the pipeline
    shard_map's in_spec so entry is collective-free)."""
    n_pipe = int(mesh.shape.get("pipe", 1)) if "pipe" in mesh.axis_names else 1

    def spec_for(path, leaf):
        spec = _spec_for(path, leaf)
        if (n_pipe > 1 and "blocks." in f"{path}."
                and getattr(leaf, "ndim", 0) >= 1
                and leaf.shape[0] % n_pipe == 0):
            tail = tuple(spec) + (None,) * (leaf.ndim - len(tuple(spec)))
            return P("pipe", *tail[1:])
        return spec

    def rec(node, path):
        if isinstance(node, dict):
            return {k: rec(v, f"{path}.{k}" if path else k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            # e.g. the resnet backbone's per-stage block lists
            out = [rec(v, f"{path}.{i}") for i, v in enumerate(node)]
            return type(node)(out) if isinstance(node, tuple) else out
        return NamedSharding(mesh, spec_for(path, node))

    return rec(params, "")


def shard_params(params, mesh: Mesh):
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def zero1_shardings(params, mesh: Mesh):
    """ZeRO-1-style shardings for a params-shaped optimizer-state tree
    (Adam mu/nu, SGD momentum): each leaf takes its parameter's sharding
    widened with 'data' on the first free axis the data-parallel degree
    divides. Keeping params replicated while mu/nu shard means GSPMD
    dynamic-slices the (already all-reduced) grads into the local
    moment update and all-gathers the parameter delta — the ZeRO-1
    communication pattern, derived from annotations alone. Moment
    memory drops ~dp×: Adam's fp32 mu+nu are 2 × 4 bytes/param, the
    largest optimizer-side tensor at ViT-B scale.

    Leaves no axis divides (odd shapes, tiny biases) stay on the
    parameter's own sharding — correct, just not partitioned."""
    dp = int(mesh.shape.get("data", 1))
    base = param_shardings(params, mesh)

    def widen(leaf, ns):
        if dp == 1 or getattr(leaf, "ndim", 0) == 0:
            return ns
        spec = list(tuple(ns.spec)) + [None] * (leaf.ndim - len(tuple(ns.spec)))
        for i in range(leaf.ndim):
            if spec[i] is None and leaf.shape[i] % dp == 0:
                spec[i] = "data"
                return NamedSharding(mesh, P(*spec))
        return ns

    return jax.tree.map(widen, params, base)


def shard_batch(batch, mesh: Mesh, batch_axis: int = 0):
    """Place a batch on the mesh, batch dim over 'data'.

    ``batch_axis``: which dim is the batch (1 under gradient
    accumulation, where dim 0 is the sequential microbatch axis and
    must stay replicated).

    Single-host: a plain device_put with the NamedSharding. Multi-host:
    each process holds only ITS loader shard, so the local array must be
    assembled into the global array via
    ``jax.make_array_from_process_local_data`` — device_put'ing the local
    shard with a global sharding would silently treat it as the whole
    global batch."""
    sh = batch_sharding(mesh, batch_axis)
    multihost = jax.process_count() > 1

    def put(x):
        if not (hasattr(x, "ndim") and x.ndim >= batch_axis + 1):
            return x
        if multihost:
            import numpy as _np

            return jax.make_array_from_process_local_data(sh, _np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)
