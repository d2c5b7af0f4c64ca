"""CLIP-ReID variant: prompt-learning + image-encoder ReID model.

Behavioral mirror of `modeling/make_model_clipreid.py:55-173`
(maxingan2412/Signal): a single-modality CLIP ViT-B/16 ReID model with

* two feature heads: the 768-d ln_post CLS and the 512-d projected CLS,
  each with its own BNNeck + classifier;
* `get_text`: per-class learned prompts ("A photo of a X X X X …")
  through the CLIP text tower;
* `get_image`: projected CLS image feature;
* train forward: ([cls_score, cls_score_proj],
  [feat_last, feat, feat_proj], feat_proj);
* eval forward: concat(768-d, 512-d) features, before/after BNNeck per
  TEST.NECK_FEAT.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from signal_tpu.models import vit as vit_mod
from signal_tpu.models.bnneck import bnneck_apply, init_bnneck
from signal_tpu.models.text_encoder import (
    init_prompt_learner,
    init_text_params,
    prompt_forward,
    text_forward,
)
from signal_tpu.ops.attention import trunc_normal


@dataclasses.dataclass(frozen=True)
class ClipReIDSpec:
    num_classes: int
    camera_num: int
    width: int = 768            # in_planes (ViT-B-16)
    proj_dim: int = 512         # in_planes_proj
    layers: int = 12
    num_heads: int = 12
    h: int = 16
    w: int = 8
    stride_size: int = 16
    sie_camera: bool = True
    sie_coe: float = 1.0
    neck_feat: str = "before"
    compute_dtype: str = "bfloat16"
    use_flash: bool = False
    dataset_name: str = "RGBNT201"

    @classmethod
    def from_config(cls, cfg, num_classes: int, camera_num: int) -> "ClipReIDSpec":
        return cls(
            num_classes=num_classes,
            camera_num=camera_num,
            h=(cfg.INPUT.SIZE_TRAIN[0] - 16) // cfg.MODEL.STRIDE_SIZE[0] + 1,
            w=(cfg.INPUT.SIZE_TRAIN[1] - 16) // cfg.MODEL.STRIDE_SIZE[1] + 1,
            stride_size=int(cfg.MODEL.STRIDE_SIZE[0]),
            sie_camera=bool(cfg.MODEL.SIE_CAMERA),
            sie_coe=float(cfg.MODEL.SIE_COE),
            neck_feat=cfg.TEST.NECK_FEAT,
            compute_dtype=cfg.MODEL.COMPUTE_DTYPE,
            use_flash=bool(cfg.MODEL.USE_PALLAS_ATTENTION),
            dataset_name=cfg.DATASETS.NAMES,
        )

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)


def init_clipreid_params(key, spec: ClipReIDSpec, tokenizer=None
                         ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    ks = jax.random.split(key, 8)
    params: Dict[str, Any] = {}
    bn: Dict[str, Any] = {}

    params["base"] = vit_mod.init_vit_params(
        ks[0], h_resolution=spec.h, w_resolution=spec.w,
        width=spec.width, layers=spec.layers, output_dim=spec.proj_dim)
    params["text"] = init_text_params(ks[1], embed_dim=spec.proj_dim)
    if spec.sie_camera:
        params["cv_embed"] = trunc_normal(ks[2], (spec.camera_num, spec.width), 0.02)

    params["classifier"] = {"kernel": 0.001 * jax.random.normal(
        ks[3], (spec.width, spec.num_classes))}
    params["classifier_proj"] = {"kernel": 0.001 * jax.random.normal(
        ks[4], (spec.proj_dim, spec.num_classes))}
    params["bottleneck"], bn["bottleneck"] = init_bnneck(spec.width)
    params["bottleneck_proj"], bn["bottleneck_proj"] = init_bnneck(spec.proj_dim)

    if tokenizer is None:
        from signal_tpu.models.tokenizer import ClipTokenizer

        tokenizer = ClipTokenizer()
    params["prompt_learner"] = init_prompt_learner(
        ks[5], spec.num_classes, spec.dataset_name,
        params["text"]["token_embedding"], tokenizer)
    return params, bn


def _image_triple(params, spec: ClipReIDSpec, images, cam_label):
    cv = None
    if spec.sie_camera and cam_label is not None:
        cv = spec.sie_coe * params["cv_embed"][cam_label]
    return vit_mod.vit_forward(
        params["base"], images, cv, num_heads=spec.num_heads,
        compute_dtype=spec.cdtype, use_flash=spec.use_flash,
        return_intermediate=True, stride=spec.stride_size)


def clipreid_text_features(params, spec: ClipReIDSpec, labels) -> jnp.ndarray:
    prompts, tokenized = prompt_forward(params["prompt_learner"], labels)
    return text_forward(params["text"], prompts, tokenized,
                        num_heads=8, compute_dtype=spec.cdtype)


def clipreid_image_features(params, spec: ClipReIDSpec, images, cam_label=None) -> jnp.ndarray:
    _, _, proj = _image_triple(params, spec, images, cam_label)
    return proj[:, 0]


def clipreid_forward_train(params, bn_state, spec: ClipReIDSpec, images,
                           cam_label=None):
    """→ (scores [2], feats [3: last/post/proj], img_feature_proj, new_bn)."""
    x_last, x_post, x_proj = _image_triple(params, spec, images, cam_label)
    feat_last, feat, feat_proj = x_last[:, 0], x_post[:, 0], x_proj[:, 0]
    new_bn = dict(bn_state)
    fbn, new_bn["bottleneck"] = bnneck_apply(
        params["bottleneck"], bn_state["bottleneck"], feat, training=True)
    fpbn, new_bn["bottleneck_proj"] = bnneck_apply(
        params["bottleneck_proj"], bn_state["bottleneck_proj"], feat_proj, training=True)
    scores = [fbn @ params["classifier"]["kernel"],
              fpbn @ params["classifier_proj"]["kernel"]]
    return scores, [feat_last, feat, feat_proj], feat_proj, new_bn


def clipreid_forward_eval(params, bn_state, spec: ClipReIDSpec, images,
                          cam_label=None) -> jnp.ndarray:
    x_last, x_post, x_proj = _image_triple(params, spec, images, cam_label)
    feat, feat_proj = x_post[:, 0], x_proj[:, 0]
    if spec.neck_feat == "after":
        fbn, _ = bnneck_apply(params["bottleneck"], bn_state["bottleneck"],
                              feat, training=False)
        fpbn, _ = bnneck_apply(params["bottleneck_proj"],
                               bn_state["bottleneck_proj"], feat_proj, training=False)
        return jnp.concatenate([fbn, fpbn], axis=1)
    return jnp.concatenate([feat, feat_proj], axis=1)
