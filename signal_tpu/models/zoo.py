"""The reference CNN zoo, served through the torch→JAX bridge.

The reference vendors 22 torchreid-derived CNN definitions under
`modeling/backbones/basic_cnn_params/` (maxingan2412/Signal) that its
Signal factory never reaches (`modeling/make_model.py:294-301` registers
ViTs only). The two ReID-idiomatic families are native JAX here
(``models/resnet.py`` 50/101/152, ``models/osnet.py`` x1_0…x0_25); this
module covers the rest: point ``build_zoo_backbone`` at a directory of
torchreid-style model files (a reference checkout's
``modeling/backbones/basic_cnn_params``, or torchreid's
``torchreid/models``) and it loads the torch definition, traces it, and
returns a pure JAX ``BridgedModule`` ready for jit/TPU (see
``signal_tpu.torch_bridge`` for the lowering).

The registry mirrors the reference inventory one row per member with its
factory name, constructor signature quirks, and the input geometry each
net asserts or assumes. Excluded (with evidence):

* ``cal.py`` — broken at source: ``CAL.classifier_bap`` is
  ``Linear(768*8=6144, 768)`` (`cal.py:314`) but BAP emits ``M*C =
  8*2048 = 16384`` features from the ResNet trunk (`cal.py:171-219`),
  so ``CAL.forward`` raises a shape error for every input size; the
  module cannot run in the reference either.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import warnings
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

__all__ = ["ZOO", "ZooEntry", "load_zoo_module", "build_zoo_backbone"]


@dataclass(frozen=True)
class ZooEntry:
    file: str                       # source file under the zoo dir
    factory: str                    # factory function or class name
    input_hw: Tuple[int, int]       # a valid (H, W); most nets accept any
    feat_dim: int                   # eval-mode output feature width
    kwargs: Dict = field(default_factory=dict)
    fixed_input: bool = False       # net asserts/requires exactly input_hw
    notes: str = ""


# feat_dim = eval-forward output width at num_classes=NUM (classifier
# logits for nets returning scores; pooled features for torchreid-style
# nets, which return features in eval via `if not self.training`).
ZOO: Dict[str, ZooEntry] = {
    "densenet121": ZooEntry("densenet.py", "densenet121", (256, 128), 1024),
    "densenet169": ZooEntry("densenet.py", "densenet169", (256, 128), 1664),
    "densenet201": ZooEntry("densenet.py", "densenet201", (256, 128), 1920),
    "densenet161": ZooEntry("densenet.py", "densenet161", (256, 128), 2208),
    "densenet121_fc512": ZooEntry("densenet.py", "densenet121_fc512",
                                  (256, 128), 512),
    "se_resnet50": ZooEntry("senet.py", "se_resnet50", (256, 128), 2048),
    "se_resnet101": ZooEntry("senet.py", "se_resnet101", (256, 128), 2048),
    "se_resnet152": ZooEntry("senet.py", "se_resnet152", (256, 128), 2048),
    "se_resnet50_fc512": ZooEntry("senet.py", "se_resnet50_fc512",
                                  (256, 128), 512),
    "se_resnext50_32x4d": ZooEntry("senet.py", "se_resnext50_32x4d",
                                   (256, 128), 2048),
    "se_resnext101_32x4d": ZooEntry("senet.py", "se_resnext101_32x4d",
                                    (256, 128), 2048),
    "senet154": ZooEntry("senet.py", "senet154", (256, 128), 2048),
    "mobilenetv2_x1_0": ZooEntry("mobilenetv2.py", "mobilenetv2_x1_0",
                                 (256, 128), 1280),
    "mobilenetv2_x1_4": ZooEntry("mobilenetv2.py", "mobilenetv2_x1_4",
                                 (256, 128), 1792),
    "shufflenet": ZooEntry("shufflenet.py", "shufflenet", (256, 128), 960),
    "shufflenet_v2_x0_5": ZooEntry("shufflenetv2.py", "shufflenet_v2_x0_5",
                                   (256, 128), 1024),
    "shufflenet_v2_x1_0": ZooEntry("shufflenetv2.py", "shufflenet_v2_x1_0",
                                   (256, 128), 1024),
    "shufflenet_v2_x1_5": ZooEntry("shufflenetv2.py", "shufflenet_v2_x1_5",
                                   (256, 128), 1024),
    "shufflenet_v2_x2_0": ZooEntry("shufflenetv2.py", "shufflenet_v2_x2_0",
                                   (256, 128), 2048),
    "squeezenet1_0": ZooEntry("squeezenet.py", "squeezenet1_0",
                              (256, 128), 512),
    "squeezenet1_1": ZooEntry("squeezenet.py", "squeezenet1_1",
                              (256, 128), 512),
    "squeezenet1_0_fc512": ZooEntry("squeezenet.py", "squeezenet1_0_fc512",
                                    (256, 128), 512),
    "xception": ZooEntry("xception.py", "xception", (256, 128), 2048),
    "inceptionv4": ZooEntry("inceptionv4.py", "inceptionv4",
                            (299, 299), 1536),
    "inceptionresnetv2": ZooEntry("inceptionresnetv2.py",
                                  "inceptionresnetv2", (299, 299), 1536),
    "nasnetamobile": ZooEntry("nasnet.py", "nasnetamobile", (224, 224), 1056),
    "mlfn": ZooEntry("mlfn.py", "mlfn", (256, 128), 768),
    # PCB eval path returns the pre-reduction 2048-d part features
    "pcb_p6": ZooEntry("pcb.py", "pcb_p6", (256, 128), 2048 * 6),
    "pcb_p4": ZooEntry("pcb.py", "pcb_p4", (256, 128), 2048 * 4),
    "resnet50mid": ZooEntry("resnetmid.py", "resnet50mid", (256, 128), 3072),
    # osnet_ain factories pin feature_dim=512 (fc head) at every width
    "osnet_ain_x1_0": ZooEntry("osnet_ain.py", "osnet_ain_x1_0",
                               (256, 128), 512),
    "osnet_ain_x0_75": ZooEntry("osnet_ain.py", "osnet_ain_x0_75",
                                (256, 128), 512),
    "osnet_ain_x0_5": ZooEntry("osnet_ain.py", "osnet_ain_x0_5",
                               (256, 128), 512),
    "osnet_ain_x0_25": ZooEntry("osnet_ain.py", "osnet_ain_x0_25",
                                (256, 128), 512),
    "resnet50_ibn_a": ZooEntry("resnet_ibn_a.py", "resnet50_ibn_a",
                               (256, 128), 2048, kwargs={"last_stride": 1}),
    "resnet50_ibn_b": ZooEntry("resnet_ibn_b.py", "resnet50_ibn_b",
                               (256, 128), 2048, kwargs={"last_stride": 1}),
    "hacnn": ZooEntry("hacnn.py", "HACNN", (160, 64), 1024 + 4 * 128,
                      kwargs={"use_gpu": False}, fixed_input=True,
                      notes="asserts 160x64 input (hacnn.py:308); "
                            "use_gpu=False avoids the hard-coded "
                            ".cuda() at hacnn.py:304"),
    "mudeep": ZooEntry("mudeep.py", "MuDeep", (256, 128), 768,
                       fixed_input=True,
                       notes="fc layer hard-codes the 256x128 "
                             "flatten size (mudeep.py:189)"),
}


def load_zoo_module(zoo_dir: str, filename: str):
    """Import one torchreid-style model file by path (registering nothing
    on sys.path; repeated loads are cached by absolute path)."""
    path = os.path.abspath(os.path.join(zoo_dir, filename))
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"zoo file {path} not found — point zoo_dir at a torchreid "
            "models directory or a Signal-reference "
            "modeling/backbones/basic_cnn_params checkout")
    mod_name = "signal_tpu_zoo_" + filename.replace(".py", "")
    cached = sys.modules.get(mod_name)
    if cached is not None and getattr(cached, "__file__", None) == path:
        return cached
    spec = importlib.util.spec_from_file_location(mod_name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    try:
        spec.loader.exec_module(mod)
    except BaseException:
        # never cache a half-executed module: a retry must re-raise the
        # real import error, not AttributeError on the missing factory
        sys.modules.pop(mod_name, None)
        raise
    return mod


def build_zoo_backbone(name: str, zoo_dir: Optional[str] = None, *,
                       num_classes: int = 1000, input_hw=None,
                       batch_size: int = 2, compute_dtype=None,
                       state_dict: Optional[dict] = None,
                       train_mode: bool = False):
    """Build a zoo CNN as a pure JAX model.

    Returns a ``BridgedModule``: ``bm(params_jnp, images_jnp)`` with
    images ``[B, 3, H, W]`` fp32. ``zoo_dir`` defaults to the
    ``SIGNAL_ZOO_DIR`` environment variable. ``state_dict`` (a torch
    state dict, e.g. torchreid pretrained weights) is loaded into the
    module before tracing, so the returned ``.params`` carry it.

    ``train_mode=True`` lowers the TRAIN forward instead (batch-stat
    BN, dropout active, torchreid-style logits outputs) as a
    ``BridgedTrainModule`` whose step also returns the BN running-stat
    updates — the full fine-tuning path. Note the trace is
    batch-size-specialized; rebuild for a different batch.
    """
    import jax.numpy as jnp
    import torch

    from signal_tpu.torch_bridge import (
        lower_torch_module, lower_torch_module_train)

    entry = ZOO.get(name)
    if entry is None:
        raise KeyError(f"unknown zoo backbone {name!r}; have "
                       f"{sorted(ZOO)}")
    zoo_dir = zoo_dir or os.environ.get("SIGNAL_ZOO_DIR")
    if not zoo_dir:
        raise ValueError("pass zoo_dir= or set SIGNAL_ZOO_DIR")
    mod = load_zoo_module(zoo_dir, entry.file)
    factory = getattr(mod, entry.factory)

    import inspect
    sig = inspect.signature(factory)
    kwargs = dict(entry.kwargs)
    if "num_classes" in sig.parameters:
        kwargs.setdefault("num_classes", num_classes)
    if "loss" in sig.parameters:
        kwargs.setdefault("loss", "softmax")
    if "pretrained" in sig.parameters:
        kwargs.setdefault("pretrained", False)
    model = factory(**kwargs)
    model.eval()
    if state_dict is not None:
        sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
        # strict=False tolerates head-shape mismatches (torchreid ckpts
        # carry their own classifier) but must not silently load NOTHING
        # (torch does not report BN num_batches_tracked as missing, so
        # count the real key intersection, not len(missing_keys))
        own = set(model.state_dict())
        n_matched = len(own & set(sd))
        if n_matched == 0:
            raise ValueError(
                f"state_dict matched 0 of {len(own)} keys for {name!r} "
                f"(first ckpt keys: {list(sd)[:3]}) — wrong checkpoint "
                "or an unstripped prefix")
        result = model.load_state_dict(sd, strict=False)
        if result.missing_keys:
            warnings.warn(f"{name}: {len(result.missing_keys)} of "
                          f"{len(own)} keys not in checkpoint "
                          f"(e.g. {result.missing_keys[:3]})")

    hw = input_hw or entry.input_hw
    if entry.fixed_input and input_hw and tuple(input_hw) != entry.input_hw:
        raise ValueError(f"{name} requires input {entry.input_hw}: "
                         f"{entry.notes}")
    example = torch.randn(batch_size, 3, *hw)
    lower = lower_torch_module_train if train_mode else lower_torch_module
    return lower(model, (example,),
                 compute_dtype=compute_dtype or jnp.float32)
