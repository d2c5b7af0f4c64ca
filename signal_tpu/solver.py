"""Optimizer + LR schedules, mirroring the reference's solver package.

* Per-parameter LR/weight-decay groups (`solver/make_optimizer.py:4-45` in
  maxingan2412/Signal), applied IN THE REFERENCE'S RULE ORDER:
    1. bias → lr ×BIAS_LR_FACTOR, wd=WEIGHT_DECAY_BIAS
    2. CLIP backbone ('base', not 'adapter') → lr pinned to 5e-6
       (ImageNet ViT → BASE_LR×0.8)
    3. MSVR310: 'classifier' → lr ×100, wd=WEIGHT_DECAY_BIAS
    4. LARGE_FC_LR: 'classifier'/'arcface' → lr ×2
  BNNeck biases are frozen (requires_grad False) → masked out of updates.

* Adam with torch semantics (L2-into-grad weight decay, not decoupled),
  implemented as a single jit-friendly transform whose per-leaf LR is the
  affine map lr = a + b·base_lr_leaf — both the timm cosine schedule
  (absolute lr_min / warmup_lr_init, `solver/cosine_lr.py:67-94`) and the
  MSVR310 WarmupMultiStepLR (`solver/lr_scheduler310.py:43-56`) are affine
  in the group base LR, so the host passes two scalars per epoch and the
  compiled step never retraces.

* The per-epoch LR noise (`solver/scheduler.py:87-105`: truncated normal,
  generator seeded with noise_seed + epoch) is reproduced bit-exactly via
  torch CPU when available, else a numpy equivalent.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Param groups
# --------------------------------------------------------------------------

def _map_with_paths(tree, fn, path=()):
    """Rebuild ``tree``'s container structure (dicts AND lists — e.g. the
    resnet backbone's per-stage block lists) with fn('.'-joined path) at
    each leaf position."""
    if isinstance(tree, dict):
        return {k: _map_with_paths(v, fn, path + (k,)) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        out = [_map_with_paths(v, fn, path + (str(i),))
               for i, v in enumerate(tree)]
        return type(tree)(out) if isinstance(tree, tuple) else out
    return fn(".".join(path))


def build_param_groups(params, cfg) -> Tuple[Any, Any, Any]:
    """→ (base_lr tree, weight_decay tree, trainable-mask tree)."""
    base_lr = cfg.SOLVER.BASE_LR
    is_clip = cfg.MODEL.TRANSFORMER_TYPE == "ViT-B-16"

    def rules(path: str):
        lr, wd = base_lr, cfg.SOLVER.WEIGHT_DECAY
        trainable = True
        if "bias" in path:
            lr = base_lr * cfg.SOLVER.BIAS_LR_FACTOR
            wd = cfg.SOLVER.WEIGHT_DECAY_BIAS
        if not cfg.MODEL.FROZEN and path.startswith("base") and "adapter" not in path:
            lr = 0.000005 if is_clip else base_lr * 0.8
        if cfg.DATASETS.NAMES == "MSVR310" and "classifier" in path:
            lr = base_lr * 100
            wd = cfg.SOLVER.WEIGHT_DECAY_BIAS
        if cfg.SOLVER.LARGE_FC_LR and ("classifier" in path or "arcface" in path):
            lr = base_lr * 2
        # BNNeck bias frozen (`make_model.py:78,88,94,100,115`)
        if "bottleneck" in path and path.endswith("bias"):
            trainable = False
        # SIM's W_v is never used in the forward (`useA.py:48`); torch
        # leaves its grad None so it neither updates nor decays.
        if "W_v" in path:
            trainable = False
        # the T2T sinusoid table is a frozen buffer in the reference
        # (`t2t.py:130-131`, requires_grad=False)
        if cfg.MODEL.TRANSFORMER_TYPE.startswith("t2t") and \
                path == "base.pos_embed":
            trainable = False
        # MODEL.FROZEN: backbone frozen except LoRA/adapter params
        # (`meta_arch.py:66-78`, `LoRA.py:307`); the LoRA factor tree
        # lives at params['lora'] and trains at BASE_LR (the 5e-6 CLIP
        # pin only applies when NOT frozen, `make_optimizer.py:15-19`)
        if cfg.MODEL.FROZEN and path.startswith("base") and \
                "adapter" not in path and "lora" not in path:
            trainable = False
        # alpha/r is a constant of the adapter, never optimized
        if path.endswith("lora_scale"):
            trainable = False
        return lr, wd, trainable

    lr_tree = _map_with_paths(params, lambda p: rules(p)[0])
    wd_tree = _map_with_paths(params, lambda p: rules(p)[1])
    tr_tree = _map_with_paths(params, lambda p: rules(p)[2])
    # structural sanity: the group trees must mirror params exactly
    jax.tree.map(lambda a, b: None, params, lr_tree)
    return lr_tree, wd_tree, tr_tree


# --------------------------------------------------------------------------
# Adam (torch semantics) with dynamic affine LR
# --------------------------------------------------------------------------

class AdamState(NamedTuple):
    step: jnp.ndarray
    mu: Any
    nu: Any


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
    return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                     nu=jax.tree.map(jnp.copy, zeros))


def adam_update(
    grads,
    state: AdamState,
    params,
    *,
    base_lr_tree,
    wd_tree,
    trainable_tree,
    lr_a: jnp.ndarray,
    lr_b: jnp.ndarray,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    decoupled_wd: bool = False,
) -> Tuple[Any, AdamState]:
    """One Adam step. Leaf lr = lr_a + lr_b·base_lr (host-computed scalars).
    ``decoupled_wd``: torch AdamW semantics (decay applied to the params
    directly, scaled by lr) instead of L2-into-gradient (torch Adam)."""
    step = state.step + 1
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)

    def upd(g, m, v, p, base, wd, tr):
        p32 = p.astype(jnp.float32)
        g = g.astype(jnp.float32)
        if not decoupled_wd:
            g = g + wd * p32                       # torch Adam L2 decay
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        lr = lr_a + lr_b * base
        newp = p32 - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        if decoupled_wd:
            newp = newp - lr * wd * p32            # torch AdamW
        newp = jnp.where(tr, newp, p32)
        return newp.astype(p.dtype), m, v

    flat = jax.tree.map(upd, grads, state.mu, state.nu, params,
                        base_lr_tree, wd_tree, trainable_tree)
    new_params = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
    new_nu = jax.tree.map(lambda t: t[2], flat, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, AdamState(step=step, mu=new_mu, nu=new_nu)


def sgd_update(grads, momentum_state, params, *, base_lr_tree, wd_tree,
               trainable_tree, lr_a, lr_b, momentum: float = 0.9):
    """torch SGD with momentum (for OPTIMIZER_NAME='SGD' and center loss)."""
    def upd(g, buf, p, base, wd, tr):
        g = g.astype(jnp.float32) + wd * p.astype(jnp.float32)
        buf = momentum * buf + g
        lr = lr_a + lr_b * base
        newp = p.astype(jnp.float32) - lr * buf
        newp = jnp.where(tr, newp, p.astype(jnp.float32))
        return newp.astype(p.dtype), buf

    flat = jax.tree.map(upd, grads, momentum_state, params,
                        base_lr_tree, wd_tree, trainable_tree)
    new_params = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
    new_buf = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, new_buf


# --------------------------------------------------------------------------
# Schedules: host-side scalars (a, b) with leaf lr = a + b·base_lr
# --------------------------------------------------------------------------

def _lr_noise(epoch: int, seed: int = 42, pct: float = 0.67) -> float:
    """Truncated-normal LR noise, matching `solver/scheduler.py:93-104`
    bit-exactly when torch is importable (generator-seeded resampling)."""
    try:
        import torch

        g = torch.Generator()
        g.manual_seed(seed + epoch)
        while True:
            noise = torch.randn(1, generator=g).item()
            if abs(noise) < pct:
                return noise
    except ImportError:
        rng = np.random.default_rng(seed + epoch)
        while True:
            noise = float(rng.standard_normal())
            if abs(noise) < pct:
                return noise


def cosine_schedule_coeffs(
    epoch: int,
    *,
    max_epochs: int,
    base_lr: float,
    warmup_t: int,
    noise: bool = True,
    noise_seed: int = 42,
) -> Tuple[float, float]:
    """timm CosineLRScheduler (`solver/cosine_lr.py:67-94` with the factory
    defaults `scheduler_factory.py:16-30`): lr_min=0.001·BASE_LR,
    warmup_lr_init=0.1·BASE_LR, cycle_limit=1, per-epoch noise over the
    whole run. Returns (a, b) with group lr = a + b·group_base_lr."""
    lr_min = 0.001 * base_lr
    warmup_lr_init = 0.1 * base_lr
    if warmup_t and epoch < warmup_t:
        # warmup: lr = init + t·(base − init)/warmup_t
        frac = epoch / warmup_t
        a, b = warmup_lr_init * (1.0 - frac), frac
    else:
        t = epoch
        if t < max_epochs:  # cycle_limit=1
            c = 0.5 * (1.0 + math.cos(math.pi * t / max_epochs))
            a, b = lr_min * (1.0 - c), c
        else:
            a, b = lr_min, 0.0
    if noise and 0 <= epoch < max_epochs:
        nz = 1.0 + _lr_noise(epoch, noise_seed)
        a, b = a * nz, b * nz
    return a, b


def multistep_schedule_coeffs(
    epoch: int,
    *,
    steps,
    gamma: float,
    warmup_factor: float,
    warmup_iters: int,
    warmup_method: str = "linear",
) -> Tuple[float, float]:
    """WarmupMultiStepLR (`solver/lr_scheduler310.py:43-56`), MSVR310 path."""
    wf = 1.0
    if epoch < warmup_iters:
        if warmup_method == "constant":
            wf = warmup_factor
        else:
            alpha = epoch / warmup_iters
            wf = warmup_factor * (1 - alpha) + alpha
    import bisect

    mult = wf * gamma ** bisect.bisect_right(list(steps), epoch)
    return 0.0, mult


def schedule_coeffs(cfg, epoch: int) -> Tuple[float, float]:
    """Epoch → (a, b). The reference steps schedules with the 1-based epoch
    (`processor.py:135`)."""
    if cfg.DATASETS.NAMES == "MSVR310":
        return multistep_schedule_coeffs(
            epoch,
            steps=cfg.SOLVER.STEPS,
            gamma=cfg.SOLVER.GAMMA,
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
            warmup_iters=cfg.SOLVER.WARMUP_ITERS,
            warmup_method=cfg.SOLVER.WARMUP_METHOD,
        )
    return cosine_schedule_coeffs(
        epoch,
        max_epochs=cfg.SOLVER.MAX_EPOCHS,
        base_lr=cfg.SOLVER.BASE_LR,
        warmup_t=cfg.SOLVER.WARMUP_ITERS,
    )


def current_lr(cfg, epoch: int) -> float:
    """Display LR (the base group's), for log-line parity."""
    a, b = schedule_coeffs(cfg, epoch)
    return a + b * cfg.SOLVER.BASE_LR
