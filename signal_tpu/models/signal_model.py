"""The Signal model: shared ViT encoder ×3 modalities → SIM → GAM/LAM →
BNNeck + classifier heads.

Behavioral mirror of `modeling/make_model.py:22-319` (maxingan2412/Signal),
re-architected functionally:

* parameters and BN running stats are explicit pytrees;
* the three modalities run as ONE batched encoder call ([3B, …] instead of
  three sequential calls, `make_model.py:181-183`) — identical numerics
  (shared weights; LN/attention are per-sample), ~3× better MXU batching;
* train/eval forward are pure functions returning an output dict instead
  of the reference's sign-tagged tuples (the engine maps sign semantics,
  `engine/processor.py:176-256`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from signal_tpu.models import vit as vit_mod
from signal_tpu.models.align import align_forward, init_align_params
from signal_tpu.models.bnneck import bnneck_apply, init_bnneck
from signal_tpu.models.sim import init_sim_params, sim_forward
from signal_tpu.ops.attention import trunc_normal

MODALITIES = ("RGB", "NI", "TI")


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Hashable static model description (safe as a jit static arg)."""
    num_classes: int
    camera_num: int
    view_num: int = 0            # SIE view slots (imagenet tower only)
    backbone: str = "clip"       # 'clip' (ViT-B-16) | 'imagenet' (timm ViT)
    feat_dim: int = 512          # CLIP ViT-B/16 output dim (768 imagenet)
    width: int = 768
    layers: int = 12
    num_heads: int = 12
    patch_size: int = 16
    stride_size: int = 16
    h: int = 16                  # patch-grid height ((img_h − 16)/stride + 1)
    w: int = 8                   # patch-grid width
    img_h: int = 0               # input image size (0 ⇒ h·stride, w·stride)
    img_w: int = 0
    direct: bool = True
    use_a: bool = True
    use_b: bool = True
    topk: int = 80
    keep_ratio: Optional[float] = None
    sie_camera: bool = True
    sie_view: bool = False
    sie_coe: float = 1.0
    stage: str = "together_CLS_Patch"
    compute_dtype: str = "bfloat16"
    use_flash: bool = False
    drop_path: float = 0.0       # imagenet tower stochastic depth
    mlp_ratio: float = 4.0       # imagenet tower MLP hidden ratio
    qk_scale: Optional[float] = None  # imagenet tower qk-scale override
    adapter: bool = False        # MODEL.ADAPTER (MambaPro parallel adapter)
    prompt: bool = False         # MODEL.PROMPT (MambaPro prompt tokens)
    frozen: bool = False         # MODEL.FROZEN (backbone frozen, LoRA trains)
    lora_rank: int = 8           # LoRA rank r (alpha fixed at 2r)
    remat: bool = True           # per-block rematerialization (backward)
    remat_policy: str = "full"   # 'full'|'dots'|'attn'|'attn_mlp'|'half' (models/vit.py)
    scan_unroll: int = 1         # lax.scan unroll factor over ViT blocks
    miss: str = "nothing"        # TEST.MISS missing-modality eval pattern
    pipe_stages: int = 1         # PARALLEL.PIPE_AXIS pipeline stages (clip tower)
    pipe_microbatches: int = 0   # PARALLEL.PIPE_MICROBATCH (0 → = stages)
    sequence_parallel: bool = False  # PARALLEL.SEQUENCE (Megatron-SP, clip tower)
    moe_experts: int = 0         # MODEL.MOE_EXPERTS (>1: routed MoE MLP, clip tower)
    moe_topk: int = 1            # MODEL.MOE_TOPK
    moe_capacity: float = 1.25   # MODEL.MOE_CAPACITY

    @classmethod
    def from_config(cls, cfg, num_classes: int, camera_num: int,
                    view_num: int = 0) -> "ModelSpec":
        # conv-output grid (patch 16, stride may overlap) — the reference's
        # formula (`make_model_clipreid.py:84`); == SIZE//16 when stride=16
        h = (cfg.INPUT.SIZE_TRAIN[0] - 16) // cfg.MODEL.STRIDE_SIZE[0] + 1
        w = (cfg.INPUT.SIZE_TRAIN[1] - 16) // cfg.MODEL.STRIDE_SIZE[1] + 1
        img_h, img_w = int(cfg.INPUT.SIZE_TRAIN[0]), int(cfg.INPUT.SIZE_TRAIN[1])
        keep_ratio = cfg.MODEL.KEEP_RATIO if cfg.MODEL.FIXED_KEEP_RATIO else None
        ttype = cfg.MODEL.TRANSFORMER_TYPE
        pipe_stages = int(getattr(cfg.PARALLEL, "PIPE_AXIS", 1))
        if pipe_stages > 1 and "ViT-B-16" not in ttype:
            raise ValueError(
                "PARALLEL.PIPE_AXIS > 1 is implemented for the CLIP ViT "
                "tower only (the stacked-block scan it pipelines over)")
        if (bool(getattr(cfg.PARALLEL, "SEQUENCE", False))
                and int(getattr(cfg.PARALLEL, "MODEL_AXIS", 1)) <= 1):
            import logging

            # sequence_constrain is a no-op without a 'model' mesh axis —
            # the user asked for SP but would silently get none
            logging.getLogger("signal_tpu.model").warning(
                "PARALLEL.SEQUENCE=True has no effect with MODEL_AXIS=%d — "
                "Megatron-SP shards tokens over the 'model' axis and "
                "requires MODEL_AXIS > 1 (docs/CONFIG.md)",
                int(getattr(cfg.PARALLEL, "MODEL_AXIS", 1)))
        moe_experts = int(getattr(cfg.MODEL, "MOE_EXPERTS", 0))
        if moe_experts > 1:
            if "ViT-B-16" not in ttype:
                raise ValueError(
                    "MODEL.MOE_EXPERTS > 1 is implemented for the CLIP ViT "
                    "tower only (the stacked-block scan carrying the MoE MLP)")
            if pipe_stages > 1:
                raise ValueError(
                    "MODEL.MOE_EXPERTS does not compose with "
                    "PARALLEL.PIPE_AXIS > 1 (aux loss / expert all-to-all "
                    "are not threaded through the pipeline schedule)")
            if bool(cfg.MODEL.FROZEN):
                raise ValueError(
                    "MODEL.MOE_EXPERTS does not compose with MODEL.FROZEN "
                    "(LoRA factors target dense 2-D kernels, not expert "
                    "stacks)")
            if bool(cfg.MODEL.PROMPT):
                raise ValueError(
                    "MODEL.MOE_EXPERTS does not compose with MODEL.PROMPT "
                    "(the prompted per-modality forward has no MoE path)")
            tp = int(getattr(cfg.PARALLEL, "MODEL_AXIS", 1))
            if tp > 1 and moe_experts % tp:
                raise ValueError(
                    f"MODEL.MOE_EXPERTS={moe_experts} must be divisible by "
                    f"PARALLEL.MODEL_AXIS={tp} for expert parallelism")
        layers, width, heads = 12, 768, 12
        mlp_ratio, qk_scale = 4.0, None
        if "ViT-B-16" in ttype:
            backbone, feat_dim = "clip", 512          # `make_model.py:49-52`
        elif ttype in ("resnet50", "resnet101", "resnet152"):
            # CNN path (the reference zoo's bottleneck-ResNet family);
            # last-stride-1 → /16 grid, 2048-dim features
            backbone, feat_dim = "resnet", 2048
            h = cfg.INPUT.SIZE_TRAIN[0] // 16
            w = cfg.INPUT.SIZE_TRAIN[1] // 16
            layers = {"resnet50": 50, "resnet101": 101, "resnet152": 152}[ttype]
        elif ttype.startswith("osnet"):
            # OSNet (the zoo's ReID-idiomatic CNN): /16 grid, variant
            # width encoded via feat_dim (== final channel count)
            from signal_tpu.models.osnet import OSNET_VARIANTS

            backbone = "osnet"
            feat_dim = OSNET_VARIANTS[ttype][3]
            width = feat_dim
            h = cfg.INPUT.SIZE_TRAIN[0] // 16
            w = cfg.INPUT.SIZE_TRAIN[1] // 16
        elif ttype.startswith("t2t"):
            # t2t_vit_t_14/24: embed 384, heads 6, mlp_ratio 3
            backbone, feat_dim = "t2t", 384
            width, heads, mlp_ratio = 384, 6, 3.0
            layers = 24 if "24" in ttype else 14
        elif ttype == "vit_small_patch16_224":
            # `vit_pytorch.py:498-508`: 768 wide but 8L/8H, mlp×3,
            # qk_scale=768^-0.5
            backbone, feat_dim = "imagenet", 768
            layers, heads, mlp_ratio, qk_scale = 8, 8, 3.0, 768 ** -0.5
        elif ttype == "deit_small_patch16_224":
            # `vit_pytorch.py:511-521`: 384×12L/6H
            backbone, feat_dim = "imagenet", 384
            width, heads = 384, 6
        else:
            # vit_base / deit_base (`vit_pytorch.py:487-495`)
            backbone, feat_dim = "imagenet", 768
        return cls(
            num_classes=num_classes,
            camera_num=camera_num,
            view_num=view_num if cfg.MODEL.SIE_VIEW else 0,
            backbone=backbone,
            feat_dim=feat_dim,
            width=width,
            layers=layers,
            num_heads=heads,
            stride_size=int(cfg.MODEL.STRIDE_SIZE[0]),
            h=h,
            w=w,
            img_h=img_h,
            img_w=img_w,
            direct=bool(cfg.MODEL.DIRECT),
            use_a=bool(cfg.MODEL.USE_A),
            use_b=bool(cfg.MODEL.USE_B),
            topk=int(cfg.MODEL.TOPK),
            keep_ratio=keep_ratio,
            mlp_ratio=mlp_ratio,
            qk_scale=qk_scale,
            sie_camera=bool(cfg.MODEL.SIE_CAMERA),
            sie_view=bool(cfg.MODEL.SIE_VIEW),
            sie_coe=float(cfg.MODEL.SIE_COE),
            stage=cfg.MODEL.stageName.strip(),
            compute_dtype=cfg.MODEL.COMPUTE_DTYPE,
            # under PARALLEL.MODEL_AXIS > 1 the kernel runs per-shard via
            # shard_map (`ops/flash_attention.py::_mesh_sharded_attention`)
            use_flash=bool(cfg.MODEL.USE_PALLAS_ATTENTION),
            drop_path=float(cfg.MODEL.DROP_PATH),
            adapter=bool(cfg.MODEL.ADAPTER),
            prompt=bool(cfg.MODEL.PROMPT),
            frozen=bool(cfg.MODEL.FROZEN),
            remat=bool(getattr(cfg.MODEL, "REMAT", True)),
            remat_policy=str(getattr(cfg.MODEL, "REMAT_POLICY", "full")),
            scan_unroll=int(getattr(cfg.MODEL, "SCAN_UNROLL", 1)),
            miss=str(cfg.TEST.MISS),
            pipe_stages=pipe_stages,
            pipe_microbatches=int(getattr(cfg.PARALLEL, "PIPE_MICROBATCH", 0)),
            sequence_parallel=bool(getattr(cfg.PARALLEL, "SEQUENCE", False)),
            moe_experts=moe_experts,
            moe_topk=int(getattr(cfg.MODEL, "MOE_TOPK", 1)),
            moe_capacity=float(getattr(cfg.MODEL, "MOE_CAPACITY", 1.25)),
        )

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def image_size(self) -> Tuple[int, int]:
        """True input size. Only trusted when consistent with the h×w grid
        (specs rebuilt via dataclasses.replace shrink h/w without touching
        img_h/img_w); otherwise reconstruct from the grid. Reconstruction
        is exact only for non-overlapping patches (stride 16) — with an
        overlapping stride (STRIDE_SIZE < 16, `clip/model.py:433`
        semantics) several image sizes map to the same grid, so guessing
        silently would hand FLOPs/serving a wrong size: raise instead."""
        if self.img_h and \
                (self.img_h - 16) // self.stride_size + 1 == self.h and \
                (self.img_w - 16) // self.stride_size + 1 == self.w:
            return (self.img_h, self.img_w)
        if self.stride_size != 16:
            raise ValueError(
                f"ModelSpec.image_size is ambiguous: img_h/img_w "
                f"({self.img_h}x{self.img_w}) do not match the {self.h}x"
                f"{self.w} grid and stride {self.stride_size} overlaps — "
                f"rebuild the spec with dataclasses.replace(..., img_h=, "
                f"img_w=) instead of relying on reconstruction")
        return (self.h * self.stride_size, self.w * self.stride_size)

    @property
    def eval_feat_dim(self) -> int:
        return 6 * self.feat_dim if self.use_a else 3 * self.feat_dim


def init_signal_params(key, spec: ModelSpec) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """→ (params, bn_state)."""
    ks = jax.random.split(key, 12)
    params: Dict[str, Any] = {}
    bn_state: Dict[str, Any] = {}

    if spec.backbone == "clip":
        params["base"] = vit_mod.init_vit_params(
            ks[0],
            h_resolution=spec.h,
            w_resolution=spec.w,
            patch_size=spec.patch_size,
            width=spec.width,
            layers=spec.layers,
            output_dim=spec.feat_dim,
            adapter=spec.adapter,
            moe_experts=spec.moe_experts,
        )
        if spec.prompt:
            from signal_tpu.models.vit_prompt import init_prompt_params

            params["prompt"] = init_prompt_params(ks[9], spec.width, spec.layers)
        # SIE slots (`meta_arch.py:79-92`): cam×view when both flags are
        # set, else camera-only, else view-only. Quirks preserved exactly:
        # the forward always indexes by cam_label alone and only applies
        # the embedding when SIE_CAMERA (`cv_embed_sign`, meta_arch.py:41,
        # 101-103) — so the cam×view rows beyond camera_num and the whole
        # view-only table are allocated-but-unreached, as in the reference.
        if spec.sie_camera and spec.sie_view and spec.view_num:
            params["cv_embed"] = trunc_normal(
                ks[1], (spec.camera_num * spec.view_num, spec.width), 0.02)
        elif spec.sie_camera:
            params["cv_embed"] = trunc_normal(ks[1], (spec.camera_num, spec.width), 0.02)
        elif spec.sie_view and spec.view_num:
            params["cv_embed"] = trunc_normal(ks[1], (spec.view_num, spec.width), 0.02)
    elif spec.backbone == "t2t":
        from signal_tpu.models.t2t import init_t2t_params

        params["base"] = init_t2t_params(
            ks[0],
            img_size=spec.image_size,
            embed_dim=spec.width,
            depth=spec.layers,
            camera_num=spec.camera_num if spec.sie_camera else 0,
        )
    elif spec.backbone == "resnet":
        from signal_tpu.models.resnet import RESNET_BLOCK_COUNTS, init_resnet50_params

        params["base"], bn_state["base"] = init_resnet50_params(
            ks[0], block_counts=RESNET_BLOCK_COUNTS[spec.layers])
    elif spec.backbone == "osnet":
        from signal_tpu.models.osnet import OSNET_BY_FEAT_DIM, init_osnet_params

        params["base"], bn_state["base"] = init_osnet_params(
            ks[0], channels=OSNET_BY_FEAT_DIM[spec.feat_dim])
    else:
        from signal_tpu.models.vit_imagenet import init_imagenet_vit_params

        params["base"] = init_imagenet_vit_params(
            ks[0],
            img_size=spec.image_size,
            patch_size=spec.patch_size,
            stride_size=spec.stride_size,
            width=spec.width,
            layers=spec.layers,
            camera_num=spec.camera_num if spec.sie_camera else 0,
            view_num=spec.view_num,
            mlp_ratio=spec.mlp_ratio,
        )

    def classifier(k, din):
        # reference classifier init: normal(std=0.001), no bias
        return {"kernel": 0.001 * jax.random.normal(k, (din, spec.num_classes))}

    if spec.direct:
        params["bottleneck"], bn_state["bottleneck"] = init_bnneck(3 * spec.feat_dim)
        params["classifier"] = classifier(ks[2], 3 * spec.feat_dim)
    else:
        for i, m in enumerate(("r", "n", "t")):
            params[f"bottleneck_{m}"], bn_state[f"bottleneck_{m}"] = init_bnneck(spec.feat_dim)
            params[f"classifier_{m}"] = classifier(ks[3 + i], spec.feat_dim)

    if spec.use_a:
        params["SIM"] = init_sim_params(ks[6], spec.feat_dim)
        params["bottleneck_var"], bn_state["bottleneck_var"] = init_bnneck(3 * spec.feat_dim)
        params["classifier_var"] = classifier(ks[7], 3 * spec.feat_dim)

    if spec.use_b:
        params["AlignM"] = init_align_params(ks[8], spec.feat_dim)

    if spec.frozen and spec.backbone not in ("resnet", "osnet"):
        # MODEL.FROZEN: the reference freezes the backbone and trains only
        # its low-rank adapters (`meta_arch.py:66-78` → LoRA.py:307
        # `mark_only_lora_as_trainable`). Functional equivalent: a parallel
        # factor tree merged into the frozen base weights at encode time.
        from signal_tpu.models.lora import init_lora_factors

        params["lora"] = init_lora_factors(
            ks[10], params["base"],
            rank=spec.lora_rank, alpha=2.0 * spec.lora_rank)

    return params, bn_state


def _encode(params, spec: ModelSpec, imgs: jnp.ndarray, cam_label,
            view_label=None, rng=None, base_state=None, training=False):
    """imgs [B, 3(modal), 3(ch), H, W] → (patches [B, 3, L, D],
    cls [B, 3, D], new_base_state | None, moe_aux | None). Only the
    resnet backbone carries state (BatchNorm running stats); only the
    MoE tower (spec.moe_experts > 1) emits a load-balance aux."""
    B = imgs.shape[0]
    new_base = None
    moe_aux = None
    x = imgs.reshape(B * 3, *imgs.shape[2:])
    base = params["base"]
    if spec.frozen and "lora" in params:
        # merged weights W + A·B·scale; grads flow only to the factors
        # (base leaves are masked in solver.build_param_groups)
        from signal_tpu.models.lora import apply_lora

        base = apply_lora(base, params["lora"])
    if spec.backbone == "clip":
        cv = None
        if spec.sie_camera and cam_label is not None:
            cv = spec.sie_coe * params["cv_embed"][cam_label]     # [B, width]
        if spec.prompt:
            # prompted blocks differ per modality → three separate streams
            # (matches the reference's per-modality encoder calls)
            from signal_tpu.models.vit_prompt import vit_forward_prompt

            outs = [vit_forward_prompt(
                base, params["prompt"], imgs[:, m], cv, name,
                num_heads=spec.num_heads, compute_dtype=spec.cdtype,
                use_flash=spec.use_flash, stride=spec.stride_size)
                for m, name in enumerate(("rgb", "nir", "tir"))]
            patches = jnp.stack([o[0] for o in outs], axis=1)
            cls = jnp.stack([o[1] for o in outs], axis=1)
            return patches, cls, None, None
        # rows of x are sample-major — (b0,RGB),(b0,NI),(b0,TI),(b1,RGB),… —
        # so per-row conditioning must REPEAT each sample's embedding ×3
        # (tile would hand most samples another sample's camera)
        cv3 = jnp.repeat(cv, 3, axis=0) if cv is not None else None
        vit_out = vit_mod.vit_forward(
            base, x, cv3,
            num_heads=spec.num_heads,
            compute_dtype=spec.cdtype,
            use_flash=spec.use_flash,
            remat=spec.remat,
            remat_policy=spec.remat_policy,
            stride=spec.stride_size,
            unroll=spec.scan_unroll,
            pipe_stages=spec.pipe_stages,
            pipe_microbatches=spec.pipe_microbatches,
            sequence_parallel=spec.sequence_parallel,
            moe_topk=spec.moe_topk,
            moe_capacity=spec.moe_capacity,
        )
        if spec.moe_experts > 1:
            patches, cls, moe_aux = vit_out
        else:
            patches, cls = vit_out
    elif spec.backbone == "resnet":
        from signal_tpu.models.resnet import resnet50_forward

        patches, cls, new_base = resnet50_forward(
            base, base_state, x,
            training=training, compute_dtype=spec.cdtype)
    elif spec.backbone == "osnet":
        from signal_tpu.models.osnet import osnet_forward

        patches, cls, new_base = osnet_forward(
            base, base_state, x,
            training=training, compute_dtype=spec.cdtype)
    elif spec.backbone == "t2t":
        from signal_tpu.models.t2t import t2t_forward

        cams = jnp.repeat(cam_label, 3) if cam_label is not None else None
        patches, cls = t2t_forward(
            base, x, cams,
            sie_xishu=spec.sie_coe,
            num_heads=spec.num_heads,
            compute_dtype=spec.cdtype,
            remat=spec.remat,
        )
    else:
        from signal_tpu.models.vit_imagenet import imagenet_vit_forward

        cams = jnp.repeat(cam_label, 3) if cam_label is not None else None
        views = jnp.repeat(view_label, 3) if view_label is not None else None
        patches, cls = imagenet_vit_forward(
            base, x, cams, views,
            camera_num=spec.camera_num if spec.sie_camera else 0,
            view_num=spec.view_num,
            sie_xishu=spec.sie_coe,
            num_heads=spec.num_heads,
            stride_size=spec.stride_size,
            drop_path_rate=spec.drop_path if rng is not None else 0.0,
            rng=rng,
            compute_dtype=spec.cdtype,
            use_flash=spec.use_flash,
            qk_scale=spec.qk_scale,
            remat=spec.remat,
        )
    L, D = patches.shape[1], patches.shape[2]
    patches = patches.reshape(B, 3, L, D)
    cls = cls.reshape(B, 3, D)
    return patches, cls, new_base, moe_aux


def _stack_modalities(imgs) -> jnp.ndarray:
    if not isinstance(imgs, dict):
        return imgs  # already packed [B, 3modal, 3ch, H, W] (one H2D buffer)
    return jnp.stack([imgs[m] for m in MODALITIES], axis=1)


def forward_train(
    params,
    bn_state,
    imgs: Dict[str, jnp.ndarray],
    cam_label,
    spec: ModelSpec,
    rng=None,
    view_label=None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Training forward. Returns (outputs, new_bn_state).

    outputs: {'scores': [...], 'feats': [...], 'gam': scalar|None,
              'lam': scalar|None, 'masks': {...}|None}
    (score, feat) pairs appear in the reference's tuple order:
    direct → [(ori_score, ori)] or per-modality triples; then SIM's
    (vars_score, vars_total) if USE_A.
    """
    x = _stack_modalities(imgs)
    patches, cls, new_base, moe_aux = _encode(
        params, spec, x, cam_label, view_label,
        rng=rng, base_state=bn_state.get("base"), training=True)
    new_state = dict(bn_state)
    if new_base is not None:
        new_state["base"] = new_base
    out: Dict[str, Any] = {"scores": [], "feats": [], "gam": None, "lam": None,
                           "masks": None, "moe_aux": moe_aux}

    vars_total = None
    if spec.use_a:
        vars_total, masks = sim_forward(
            params["SIM"], patches, cls,
            k=spec.topk, keep_ratio=spec.keep_ratio, compute_dtype=spec.cdtype,
        )
        out["masks"] = masks

    if spec.use_b:
        gam, lam = align_forward(params["AlignM"], patches, h=spec.h, w=spec.w, stage=spec.stage)
        out["gam"], out["lam"] = gam, lam

    if spec.direct:
        ori = cls.reshape(cls.shape[0], -1)  # [B, 3D] — concat in (RGB, NI, TI) order
        ori_bn, new_state["bottleneck"] = bnneck_apply(
            params["bottleneck"], bn_state["bottleneck"], ori, training=True)
        out["scores"].append(ori_bn @ params["classifier"]["kernel"])
        out["feats"].append(ori)
    else:
        for i, m in enumerate(("r", "n", "t")):
            feat = cls[:, i]
            fbn, new_state[f"bottleneck_{m}"] = bnneck_apply(
                params[f"bottleneck_{m}"], bn_state[f"bottleneck_{m}"], feat, training=True)
            out["scores"].append(fbn @ params[f"classifier_{m}"]["kernel"])
            out["feats"].append(feat)

    if spec.use_a:
        vbn, new_state["bottleneck_var"] = bnneck_apply(
            params["bottleneck_var"], bn_state["bottleneck_var"], vars_total, training=True)
        out["scores"].append(vbn @ params["classifier_var"]["kernel"])
        out["feats"].append(vars_total)

    return out, new_state


def _apply_miss(x: jnp.ndarray, miss: str) -> jnp.ndarray:
    """Missing-modality eval (TEST.MISS): zero out named modalities.

    The reference declares the knob (`config/defaults.py:173`) without a
    consumer; here 'r'/'n'/'t' combinations (e.g. 'rn') zero those streams.
    """
    if not miss or miss.lower() in ("none", "nothing"):
        return x
    idx = {"r": 0, "n": 1, "t": 2}
    keep = jnp.ones((3,), x.dtype)
    for ch in miss.lower():
        if ch in idx:
            keep = keep.at[idx[ch]].set(0.0)
    return x * keep[None, :, None, None, None]


def forward_eval(
    params,
    bn_state,
    imgs: Dict[str, jnp.ndarray],
    cam_label,
    spec: ModelSpec,
    view_label=None,
) -> jnp.ndarray:
    """Inference features: [B, 3D] (no SIM) or [B, 6D] (with SIM),
    taken BEFORE the BNNecks (TEST.NECK_FEAT='before', `make_model.py:284-290`)."""
    x = _stack_modalities(imgs)
    x = _apply_miss(x, spec.miss)
    patches, cls, _, _ = _encode(params, spec, x, cam_label, view_label,
                                 base_state=bn_state.get("base"))
    ori = cls.reshape(cls.shape[0], -1)
    if not spec.use_a:
        return ori
    vars_total, _ = sim_forward(
        params["SIM"], patches, cls,
        k=spec.topk, keep_ratio=spec.keep_ratio, compute_dtype=spec.cdtype,
    )
    return jnp.concatenate([ori, vars_total], axis=-1)


# --------------------------------------------------------------------------
# Convenience wrapper mirroring the reference's make_frame factory
# --------------------------------------------------------------------------

class SignalModel:
    """Thin OO shell over the functional model (CLI/engine convenience)."""

    def __init__(self, cfg, num_classes: int, camera_num: int,
                 view_num: int = 0, key=None):
        self.cfg = cfg
        self.spec = ModelSpec.from_config(cfg, num_classes, camera_num,
                                          view_num)
        key = key if key is not None else jax.random.PRNGKey(cfg.SOLVER.SEED)
        self.params, self.bn_state = init_signal_params(key, self.spec)

    def load_clip(self, path: str):
        from signal_tpu.models.clip_loader import load_clip_into_params

        self.params = load_clip_into_params(self.params, path, self.spec)

    def __call__(self, imgs, cam_label=None, training=False):
        if training:
            out, self.bn_state = forward_train(self.params, self.bn_state, imgs, cam_label, self.spec)
            return out
        return forward_eval(self.params, self.bn_state, imgs, cam_label, self.spec)


def make_frame(cfg, num_class: int, camera_num: int, view_num: int = 0, key=None) -> SignalModel:
    """Factory mirroring `modeling/make_model.py:304-319`. View SIE only
    applies on the imagenet tower when MODEL.SIE_VIEW (`vit_pytorch.py:
    421-428`); the CLIP tower is camera-only like the reference's
    (`meta_arch.py:53,85-103`)."""
    return SignalModel(cfg, num_class, camera_num, view_num, key=key)
