"""Training engine: jitted step, per-epoch schedule, eval, checkpoints.

Behavioral mirror of `engine/processor.py:41-350` (maxingan2412/Signal):
per-epoch LR scheduling (stepped with the 1-based epoch, l.135), the
sign-dispatched loss assembly (l.176-256), loss/acc meters and log lines
(l.285-302), periodic + best-by-mAP checkpoints (l.310-342).

TPU-first: the whole fwd/bwd/update is ONE jitted function (donated
params/opt state, bf16 matmuls — no GradScaler needed on TPU), sharded
over the device mesh by GSPMD; the host only streams batches and scalars.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from signal_tpu.losses import make_loss, total_train_loss
from signal_tpu.metrics import R1mAPEvaluator
from signal_tpu.models.signal_model import ModelSpec, forward_train, init_signal_params
from signal_tpu.solver import (
    adam_init,
    adam_update,
    build_param_groups,
    current_lr,
    schedule_coeffs,
    sgd_update,
)
from signal_tpu.utils.meter import AverageMeter

logger = logging.getLogger("signal_tpu.train")


@dataclasses.dataclass
class TrainState:
    params: Any
    bn_state: Any
    opt_state: Any
    centers: Any = None  # center-loss class centers (when enabled)


def make_train_step(spec: ModelSpec, cfg, num_classes: int,
                    device_augment: bool = False, mesh=None) -> Callable:
    """Builds the jitted train step closed over static config.

    ``device_augment``: the loader delivered decode+resize+normalize only;
    flip/pad+crop/erase run here, on device, fused into the step
    (`signal_tpu.data.augment`). Requires a per-step ``rng``.

    ``mesh``: device mesh; activates the trace-time mesh context so the
    Pallas attention kernel can run sharded under TP (shard_map over
    'model' head groups)."""
    loss_fn = make_loss(cfg, num_classes)
    gram_w = cfg.MODEL.Gram_Loss_weight
    pat_w = cfg.MODEL.PAT_Loss_weight
    moe_w = float(getattr(cfg.MODEL, "MoE_Loss_weight", 0.0))
    use_sgd = cfg.SOLVER.OPTIMIZER_NAME == "SGD"
    use_adamw = cfg.SOLVER.OPTIMIZER_NAME == "AdamW"  # decoupled decay
    momentum = cfg.SOLVER.MOMENTUM
    use_center = "center" in cfg.MODEL.METRIC_LOSS_TYPE
    center_w = cfg.SOLVER.CENTER_LOSS_WEIGHT
    center_lr = cfg.SOLVER.CENTER_LR
    flip_prob, re_prob = float(cfg.INPUT.PROB), float(cfg.INPUT.RE_PROB)
    aug_padding = int(cfg.INPUT.PADDING)
    pixel_mean = tuple(float(m) for m in cfg.INPUT.PIXEL_MEAN)
    pixel_std = tuple(float(s) for s in cfg.INPUT.PIXEL_STD)
    aug_fill = tuple((0.0 - float(m)) / float(s) for m, s in
                     zip(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD))

    accum = max(1, int(getattr(cfg.SOLVER, "ACCUM_ITER", 1)))
    # ZeRO-1 (PARALLEL.SHARD_OPT_STATE): optimizer moments shard over
    # 'data'; the constraints below make GSPMD dynamic-slice the
    # all-reduced grads into the local moment update and all-gather the
    # parameter delta — moment memory drops ~dp×, params stay replicated
    shard_opt = (mesh is not None
                 and bool(getattr(cfg.PARALLEL, "SHARD_OPT_STATE", False)))

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, bn_state, opt_state, batch, lr_a, lr_b, group_trees,
                   rng=None, centers=None):
        base_lr_tree, wd_tree, trainable_tree = group_trees

        def prepare(imgs, step_rng):
            vals = imgs.values() if isinstance(imgs, dict) else (imgs,)
            if any(v.dtype == jnp.uint8 for v in vals):
                # loader shipped raw uint8 pixels (4× less transfer); run
                # torchvision-Normalize here, fused into the forward
                from signal_tpu.data.augment import normalize_images

                imgs = normalize_images(imgs, pixel_mean, pixel_std)
            model_rng = step_rng
            if device_augment:
                from signal_tpu.data.augment import augment_batch

                assert step_rng is not None, "device_augment needs a per-step rng"
                if not isinstance(imgs, dict):
                    # packed single-buffer batch: split per modality for the
                    # augmenter (device-side slices — free under XLA)
                    imgs = {"RGB": imgs[:, 0], "NI": imgs[:, 1],
                            "TI": imgs[:, 2]}
                aug_rng = jax.random.fold_in(step_rng, 0)
                model_rng = jax.random.fold_in(step_rng, 1)
                imgs = augment_batch(aug_rng, imgs, flip_prob=flip_prob,
                                     re_prob=re_prob, padding=aug_padding,
                                     fill=aug_fill)
            return imgs, model_rng

        def objective(p, c, bn, imgs, pids, camids, model_rng):
            out, new_bn = forward_train(p, bn, imgs, camids, spec,
                                        rng=model_rng)
            loss = total_train_loss(out, pids, loss_fn,
                                    gram_weight=gram_w, pat_weight=pat_w,
                                    moe_weight=moe_w)
            if use_center and c is not None:
                from signal_tpu.losses import center_loss

                loss = loss + center_w * center_loss(c, out["feats"][0], pids)
            acc = jnp.mean(
                (jnp.argmax(out["scores"][0], axis=1) == pids).astype(jnp.float32))
            return loss, (new_bn, acc)

        has_center = use_center and centers is not None
        if accum == 1:
            imgs, model_rng = prepare(batch["imgs"], rng)
            pids, camids = batch["pids"], batch["camids"]
            if has_center:
                (loss, (new_bn, acc)), (grads, center_grad) = jax.value_and_grad(
                    objective, argnums=(0, 1), has_aux=True)(
                        params, centers, bn_state, imgs, pids, camids, model_rng)
                # reference: center grads scaled by 1/CENTER_LOSS_WEIGHT, plain
                # SGD(lr=CENTER_LR) (`processor.py:264-269`, `make_optimizer.py:43`)
                centers = centers - center_lr * (center_grad / center_w)
            else:
                (loss, (new_bn, acc)), grads = jax.value_and_grad(
                    lambda p: objective(p, None, bn_state, imgs, pids, camids,
                                        model_rng), has_aux=True)(params)
        else:
            # gradient accumulation (SOLVER.ACCUM_ITER): batch arrives
            # [A, B/A, ...]; scan the microbatches sequentially — the
            # peak-memory forward/backward sees B/A samples — summing
            # grads (fp32) and threading BN state, then apply ONE update
            # on the average. Batch-level losses (triplet mining, GAM)
            # operate within each microbatch by construction.
            def grads_of(bn, imgs, pids, camids, model_rng):
                if has_center:
                    return jax.value_and_grad(objective, argnums=(0, 1),
                                              has_aux=True)(
                        params, centers, bn, imgs, pids, camids, model_rng)
                la, g = jax.value_and_grad(
                    lambda p: objective(p, None, bn, imgs, pids, camids,
                                        model_rng), has_aux=True)(params)
                return la, (g, jnp.float32(0.0))

            def body(carry, xs):
                bn, gsum, cgsum, lsum, asum = carry
                mb_imgs, mb_pids, mb_camids, idx = xs
                mb_rng = (jax.random.fold_in(rng, idx)
                          if rng is not None else None)
                mb_imgs, model_rng = prepare(mb_imgs, mb_rng)
                (loss, (new_bn, acc)), (g, cg) = grads_of(
                    bn, mb_imgs, mb_pids, mb_camids, model_rng)
                gsum = jax.tree.map(
                    lambda s, x: s + x.astype(jnp.float32), gsum, g)
                cgsum = jax.tree.map(jnp.add, cgsum, cg)
                return (new_bn, gsum, cgsum, lsum + loss, asum + acc), None

            ims = batch["imgs"]
            lead = (next(iter(ims.values())) if isinstance(ims, dict)
                    else ims).shape[0]
            if lead != accum:
                raise ValueError(
                    f"SOLVER.ACCUM_ITER={accum} expects a microbatched "
                    f"[{accum}, B/{accum}, ...] batch but got leading dim "
                    f"{lead} — build batches with "
                    f"engine.train._device_batch(batch, mesh, accum)")
            init = (bn_state,
                    jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32),
                                 params),
                    jnp.zeros_like(centers) if has_center else jnp.float32(0.0),
                    jnp.float32(0.0), jnp.float32(0.0))
            xs = (batch["imgs"], batch["pids"], batch["camids"],
                  jnp.arange(accum))
            (new_bn, gsum, cgsum, lsum, asum), _ = jax.lax.scan(body, init, xs)
            inv = jnp.float32(1.0 / accum)
            grads = jax.tree.map(lambda s, p: (s * inv).astype(p.dtype),
                                 gsum, params)
            loss, acc = lsum * inv, asum * inv
            if has_center:
                centers = centers - center_lr * ((cgsum * inv) / center_w)
        if use_sgd:
            new_params, new_opt = sgd_update(
                grads, opt_state, params,
                base_lr_tree=base_lr_tree, wd_tree=wd_tree,
                trainable_tree=trainable_tree, lr_a=lr_a, lr_b=lr_b,
                momentum=momentum)
        else:
            new_params, new_opt = adam_update(
                grads, opt_state, params,
                base_lr_tree=base_lr_tree, wd_tree=wd_tree,
                trainable_tree=trainable_tree, lr_a=lr_a, lr_b=lr_b,
                decoupled_wd=use_adamw)
        if shard_opt:
            from signal_tpu.parallel.mesh import param_shardings, zero1_shardings

            new_params = jax.lax.with_sharding_constraint(
                new_params, param_shardings(new_params, mesh))
            z = zero1_shardings(new_params, mesh)
            if use_sgd:
                new_opt = jax.lax.with_sharding_constraint(new_opt, z)
            else:
                new_opt = new_opt._replace(
                    mu=jax.lax.with_sharding_constraint(new_opt.mu, z),
                    nu=jax.lax.with_sharding_constraint(new_opt.nu, z))
        return new_params, new_bn, new_opt, loss, acc, centers

    if mesh is None:
        return train_step

    from signal_tpu.parallel.mesh import use_mesh

    def train_step_with_mesh(*args, **kwargs):
        # the jit trace happens inside the FIRST call — run every call
        # under the mesh context so trace-time ops (the sharded Pallas
        # attention) see it; steady-state overhead is one contextmanager
        with use_mesh(mesh):
            return train_step(*args, **kwargs)

    # AOT introspection (scripts/bench_pp.py lowers the step for
    # memory_analysis): expose the underlying jit — lower it under
    # ``use_mesh(mesh)`` so trace-time mesh ops see the mesh
    train_step_with_mesh.jitted = train_step
    train_step_with_mesh.mesh = mesh
    return train_step_with_mesh


def _device_batch(batch, mesh=None, accum: int = 1) -> Dict:
    def prep(x):
        x = np.asarray(x)
        if accum > 1:
            if x.shape[0] % accum:
                raise ValueError(
                    f"SOLVER.ACCUM_ITER={accum} must divide the batch size "
                    f"({x.shape[0]})")
            # [A, B/A, ...] — contiguous chunks keep P×K identity groups
            # intact (the PK sampler emits K-instance runs per id)
            x = x.reshape((accum, x.shape[0] // accum) + x.shape[1:])
        return jnp.asarray(x)

    packed = batch.get("packed")
    out = {
        # prefer the loader's packed [B,3,3,H,W] buffer: ONE contiguous
        # H2D transfer instead of three strided ones (the modality split
        # happens on device inside the jitted step)
        "imgs": (prep(packed) if packed is not None
                 else {k: prep(v) for k, v in batch["imgs"].items()}),
        "pids": prep(batch["pids"]),
        "camids": prep(batch["camids"]),
    }
    if mesh is not None:
        from signal_tpu.parallel.mesh import shard_batch

        out = shard_batch(out, mesh, batch_axis=1 if accum > 1 else 0)
    return out


def do_train(
    cfg,
    spec: ModelSpec,
    train_loader,
    val_loader,
    num_query: int,
    num_classes: int,
    *,
    key=None,
    mesh=None,
    params=None,
    bn_state=None,
    max_steps_per_epoch: Optional[int] = None,
    resume_from: Optional[str] = None,
    preempt_event=None,
) -> TrainState:
    """Main training loop. Returns the final TrainState.

    Preemption safety (no reference equivalent — TPU pods get
    preempted): SIGTERM sets a flag and the loop writes a full
    resumable checkpoint (`<NAME>_preempt`) at the next step boundary,
    then returns cleanly; relaunch with ``--resume`` to continue from
    the interrupted epoch. ``preempt_event`` (threading.Event-like)
    injects the same signal for tests."""
    key = key if key is not None else jax.random.PRNGKey(cfg.SOLVER.SEED)
    if params is None:
        params, bn_state = init_signal_params(key, spec)
        clip_path = cfg.MODEL.PRETRAIN_PATH_CLIP or cfg.MODEL.PRETRAIN_PATH_T
        if clip_path and os.path.exists(clip_path):
            from signal_tpu.models.clip_loader import load_clip_into_params

            params = load_clip_into_params(params, clip_path, spec)
            logger.info("Loaded CLIP weights from %s", clip_path)

    if mesh is not None:
        from signal_tpu.parallel.mesh import shard_params

        params = shard_params(params, mesh)

    group_trees = build_param_groups(params, cfg)
    # param-count log line as the reference's startup (`train.py:75-78`);
    # trainable = params whose group-tree entry isn't frozen
    n_total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    n_train = sum(
        int(np.prod(p.shape))
        for p, t in zip(jax.tree.leaves(params), jax.tree.leaves(group_trees[2])) if t)
    logger.info("number of parameters: %.6fM (trainable %.6fM)",
                n_total / 1e6, n_train / 1e6)
    # devices arrays once — feeding hundreds of Python scalars into the
    # jitted step every iteration costs tiny H2D transfers per step
    group_trees = jax.tree.map(jnp.asarray, group_trees)
    use_sgd = cfg.SOLVER.OPTIMIZER_NAME == "SGD"
    opt_state = (jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
                 if use_sgd else adam_init(params))
    device_augment = bool(getattr(train_loader, "device_augment", False))
    train_step = make_train_step(spec, cfg, num_classes,
                                 device_augment=device_augment, mesh=mesh)
    accum = max(1, int(getattr(cfg.SOLVER, "ACCUM_ITER", 1)))
    k_inst = max(1, int(cfg.DATALOADER.NUM_INSTANCE))
    # each host reshapes its LOCAL contiguous PK slice into microbatches,
    # so group integrity is decided by the per-host microbatch size
    local_b = cfg.SOLVER.IMS_PER_BATCH // max(1, jax.process_count())
    if accum > 1 and (local_b // accum) % k_inst:
        logger.warning(
            "ACCUM_ITER=%d gives per-host microbatches of %d — not a "
            "multiple of NUM_INSTANCE=%d, so P×K identity groups split "
            "across microbatches and triplet mining weakens", accum,
            local_b // accum, k_inst)

    scene_aware = cfg.DATASETS.NAMES == "MSVR310"
    evaluator = R1mAPEvaluator(num_query, feat_norm=cfg.TEST.FEAT_NORM == "yes",
                               reranking=cfg.TEST.RE_RANKING == "yes",
                               scene_aware=scene_aware)

    loss_meter, acc_meter = AverageMeter(), AverageMeter()
    best = {"mAP": 0.0, "Rank-1": 0.0, "Rank-5": 0.0, "Rank-10": 0.0}
    ckpt_dir = os.path.join(cfg.OUTPUT_DIR, cfg.ckpt_save_path)
    os.makedirs(ckpt_dir, exist_ok=True)

    centers = None
    if "center" in cfg.MODEL.METRIC_LOSS_TYPE:
        # reference hardcodes feat_dim=2048 (`make_loss.py:59`) which never
        # matches the actual heads; size to the first head's feature
        cdim = 3 * spec.feat_dim if spec.direct else spec.feat_dim
        centers = jax.random.normal(jax.random.fold_in(key, 7),
                                    (num_classes, cdim), jnp.float32)

    state = TrainState(params, bn_state, opt_state, centers)
    start_epoch = 1
    if resume_from:
        from signal_tpu.utils.checkpoint import load_checkpoint

        template = {"params": state.params, "bn_state": state.bn_state,
                    "opt_state": state.opt_state, "epoch": 0}
        if centers is not None:
            template["centers"] = centers
        tree = load_checkpoint(resume_from, template)
        state.params = tree["params"]
        state.bn_state = tree["bn_state"]
        state.opt_state = tree["opt_state"]
        if centers is not None and "centers" in tree:
            state.centers = tree["centers"]
        start_epoch = int(tree["epoch"]) + 1
        logger.info("Resumed from %s at epoch %d", resume_from, start_epoch)

    if mesh is not None and getattr(cfg.PARALLEL, "SHARD_OPT_STATE", False):
        # ZeRO-1: place the moments sharded over 'data' up front (fresh
        # init and resume both) — the step's constraints keep them there
        from signal_tpu.parallel.mesh import zero1_shardings

        z = zero1_shardings(state.params, mesh)
        if use_sgd:
            state.opt_state = jax.tree.map(jax.device_put, state.opt_state, z)
        else:
            state.opt_state = state.opt_state._replace(
                mu=jax.tree.map(jax.device_put, state.opt_state.mu, z),
                nu=jax.tree.map(jax.device_put, state.opt_state.nu, z))

    log_period = cfg.SOLVER.LOG_PERIOD
    from signal_tpu.engine.eval import make_eval_step

    eval_step = make_eval_step(  # built once — re-jitting per epoch recompiles
        spec, normalize=(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD), mesh=mesh)

    import signal as _signal
    import threading

    if preempt_event is None:
        preempt_event = threading.Event()
    prev_sigterm = None
    sigterm_installed = False

    def _on_sigterm(signum, frame):
        preempt_event.set()
        logger.info("SIGTERM received — checkpointing at the next step boundary")

    try:  # signal handlers only install from the main thread
        prev_sigterm = _signal.signal(_signal.SIGTERM, _on_sigterm)
        sigterm_installed = True
    except ValueError:
        pass

    def _restore_sigterm():
        if sigterm_installed:
            # a None prev means the old handler was installed from C; fall
            # back to the default disposition rather than keeping ours
            _signal.signal(_signal.SIGTERM,
                           prev_sigterm if prev_sigterm is not None
                           else _signal.SIG_DFL)

    def _preempt_save(resume_epoch: int) -> None:
        # the saved epoch is the last COMPLETED one; --resume restarts
        # at resume_epoch + 1 (mid-epoch saves pass epoch − 1: the
        # interrupted epoch reruns from its top)
        path = os.path.join(ckpt_dir, f"{cfg.MODEL.NAME}_preempt")
        _save_checkpoint(path, state, epoch=resume_epoch, full=True)
        logger.info("Preemption checkpoint written to %s — resume with "
                    "--resume %s", path, path)

    try:
        for epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCHS + 1):
            t0 = time.time()
            loss_meter.reset()
            acc_meter.reset()
            lr_a, lr_b = schedule_coeffs(cfg, epoch)
            n_iter = 0
            pending = []
            needs_rng = device_augment or (spec.backbone == "imagenet"
                                           and spec.drop_path > 0)
            from signal_tpu.data.prefetch import prefetch

            def _put(batch):
                n = (batch["packed"] if "packed" in batch
                     else batch["imgs"]["RGB"]).shape[0]
                return _device_batch(batch, mesh, accum), n

            # decode + H2D of batch n+1 overlap the device step on batch n
            # (the reference gets this from torch workers + pinned copies,
            # `processor.py:155-162`)
            for n_iter, (db, n_samples) in enumerate(
                    prefetch(train_loader, _put)):
                step_rng = (jax.random.fold_in(key, epoch * 100000 + n_iter)
                            if needs_rng else None)
                (state.params, state.bn_state, state.opt_state, loss, acc,
                 state.centers) = train_step(
                    state.params, state.bn_state, state.opt_state, db,
                    jnp.float32(lr_a), jnp.float32(lr_b), group_trees, step_rng,
                    state.centers)
                # keep loss/acc on device; fetching every step would serialize
                # host↔TPU (the reference's .item() per step, `processor.py:280`)
                pending.append((loss, acc, n_samples))
                if (n_iter + 1) % log_period == 0:
                    for pl, pa, n in pending:
                        loss_meter.update(float(pl), n)
                        acc_meter.update(float(pa), 1)
                    pending.clear()
                    logger.info(
                        "Epoch[%d] Iteration[%d/%d] Loss: %.3f, Acc: %.3f, Base Lr: %.2e",
                        epoch, n_iter + 1, len(train_loader),
                        loss_meter.avg, acc_meter.avg, current_lr(cfg, epoch))
                if preempt_event.is_set():
                    _preempt_save(epoch - 1)
                    return state
                if max_steps_per_epoch and n_iter + 1 >= max_steps_per_epoch:
                    break

            for pl, pa, n in pending:
                loss_meter.update(float(pl), n)
                acc_meter.update(float(pa), 1)
            pending.clear()
            time_per_batch = (time.time() - t0) / (n_iter + 1)
            logger.info("Epoch %d done. Time per batch: %.3f[s] Speed: %.1f[samples/s]",
                        epoch, time_per_batch,
                        cfg.SOLVER.IMS_PER_BATCH / time_per_batch)

            if epoch % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
                # full resumable snapshot (params + BN + optimizer + epoch) — the
                # reference saves model-only and cannot resume (`processor.py:310-321`)
                _save_checkpoint(os.path.join(ckpt_dir, f"{cfg.MODEL.NAME}_{epoch}"),
                                 state, epoch=epoch, full=True)

            if epoch % cfg.SOLVER.EVAL_PERIOD == 0 and val_loader is not None:
                mAP, cmc = _neat_eval(cfg, spec, state, val_loader, evaluator, epoch,
                                      eval_step=eval_step, mesh=mesh)
                if mAP >= best["mAP"]:
                    best.update({"mAP": mAP, "Rank-1": cmc[0], "Rank-5": cmc[4],
                                 "Rank-10": cmc[9]})
                    _save_checkpoint(os.path.join(ckpt_dir, f"{cfg.MODEL.NAME}best"), state)
                logger.info("~" * 50)
                for k in ("mAP", "Rank-1", "Rank-5", "Rank-10"):
                    logger.info("Best %s: %.1f%%", k, 100 * best[k])
                logger.info("~" * 50)

            if preempt_event.is_set() and epoch < cfg.SOLVER.MAX_EPOCHS:
                # SIGTERM during epoch-end eval/checkpointing: act at the
                # epoch boundary instead of waiting for a full step of the
                # next epoch (this epoch completed, so resume at epoch + 1)
                _preempt_save(epoch)
                return state
    finally:
        _restore_sigterm()
    return state


def _neat_eval(cfg, spec, state, val_loader, evaluator, epoch, eval_step=None,
               mesh=None):
    """In-training eval (`training_neat_eval`, `processor.py:454-539`)."""
    from signal_tpu.engine.eval import extract_features

    evaluator.reset()
    extract_features(spec, state.params, state.bn_state, val_loader, evaluator,
                     eval_step=eval_step, mesh=mesh)
    cmc, mAP, *_ = evaluator.compute()
    logger.info("Validation Results - Epoch: %d", epoch)
    logger.info("mAP: %.1f%%", 100 * mAP)
    for r in (1, 5, 10):
        logger.info("CMC curve, Rank-%-3d:%.1f%%", r, 100 * cmc[r - 1])
    return mAP, cmc


def _save_checkpoint(path: str, state: TrainState, epoch: int = 0,
                     full: bool = False):
    from signal_tpu.utils.checkpoint import save_checkpoint

    tree = {"params": state.params, "bn_state": state.bn_state}
    if full:
        tree["opt_state"] = state.opt_state
        tree["epoch"] = epoch
        if state.centers is not None:
            tree["centers"] = state.centers  # center-loss class centers
    save_checkpoint(path, tree)
