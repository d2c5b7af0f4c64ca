"""AOT serving export: package the eval forward as a serialized
StableHLO artifact.

The reference serves by loading the full torch training module and
calling ``forward(training=False)`` (`test.py:42-51`,
`engine/processor.py:403-435` in maxingan2412/Signal) — deployment
drags the whole framework along. TPU-native replacement: ``jax.export``
the jitted eval step (weights baked in as constants) into a
self-contained artifact that any JAX runtime — or a C++ PJRT host via
the embedded StableHLO — can load and call without signal_tpu
installed.

Two export modes:

* **symbolic batch** (default): the batch dim is a symbolic dimension,
  one artifact serves any batch size. Requires the XLA attention path
  (the Pallas kernel picks concrete batch tiles at trace time), which
  XLA fuses well — the right trade for a shape-generic artifact.
* **fixed batch**: concrete shapes; the Pallas fused-attention kernel
  stays on when exporting on a TPU host. Fastest for a known serving
  batch.

The artifact directory holds ``model.stablehlo`` (serialized Exported)
and ``manifest.json`` (input/output signature, dtypes, feature dim,
normalization baked-in flag) so a serving host needs no out-of-band
knowledge.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

MODALITIES = ("RGB", "NI", "TI")


def make_serving_fn(params, bn_state, spec, *,
                    normalize: Optional[Tuple] = None):
    """Closure (imgs dict, camids) → features with weights baked in.

    ``normalize``: (mean, std) tuple → the graph takes raw uint8 crops
    and runs torchvision-``Normalize`` on device (fused into the patch
    conv); None → the caller feeds pre-normalized float images.
    """
    from signal_tpu.models.signal_model import forward_eval

    def fn(imgs: Dict[str, jnp.ndarray], camids: jnp.ndarray) -> jnp.ndarray:
        if normalize is not None:
            from signal_tpu.data.augment import normalize_images

            imgs = normalize_images(imgs, *normalize)
        return forward_eval(params, bn_state, imgs, camids, spec)

    return fn


def export_eval(params, bn_state, spec, *,
                image_size: Tuple[int, int],
                batch: Optional[int] = None,
                normalize: Optional[Tuple] = None,
                platforms: Optional[Sequence[str]] = None) -> jexport.Exported:
    """Export the eval forward. ``batch=None`` → symbolic batch dim
    (forces the XLA attention path); an int → fixed-shape export with
    the configured attention kernel."""
    # The Pallas kernel may only survive into the artifact when the
    # lowering it traces matches the (single) platform the artifact
    # targets: tile selection needs a concrete batch, and the kernel's
    # lowering is backend-dependent — a Mosaic custom call traced on a
    # TPU host can't run on a CPU serving host, and the interpret-mode
    # HLO traced on a CPU host would bake slow emulation into a TPU
    # artifact. Anything else takes the shape-generic, portable XLA
    # attention path.
    targets = tuple(platforms) if platforms else (jax.default_backend(),)
    if spec.use_flash and (batch is None or targets != ("tpu",)
                          or jax.default_backend() != "tpu"):
        spec = dataclasses.replace(spec, use_flash=False)

    fn = make_serving_fn(params, bn_state, spec, normalize=normalize)

    H, W = image_size
    in_dtype = jnp.uint8 if normalize is not None else jnp.float32
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    imgs_spec = {m: jax.ShapeDtypeStruct((b, 3, H, W), in_dtype)
                 for m in MODALITIES}
    cam_spec = jax.ShapeDtypeStruct((b,), jnp.int32)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    return jexport.export(jax.jit(fn), **kwargs)(imgs_spec, cam_spec)


def save_exported(exported: jexport.Exported, path: str, *,
                  extra_manifest: Optional[dict] = None) -> str:
    """Write ``model.stablehlo`` + ``manifest.json`` under ``path``."""
    os.makedirs(path, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(path, "model.stablehlo"), "wb") as f:
        f.write(blob)
    manifest = {
        "format": "jax.export.Exported",
        "calling_convention_version": exported.calling_convention_version,
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "bytes": len(blob),
    }
    manifest.update(extra_manifest or {})
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return path


def load_exported(path: str):
    """Load an artifact directory → (callable, manifest). The callable
    takes (imgs dict, camids) exactly like the exported closure."""
    with open(os.path.join(path, "model.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)

    def call(imgs: Dict[str, jnp.ndarray], camids: jnp.ndarray) -> jnp.ndarray:
        return exported.call(imgs, camids)

    return call, manifest


def export_bridged(bridged, *, platforms: Optional[Sequence[str]] = None
                   ) -> jexport.Exported:
    """Export a torch→JAX ``BridgedModule`` (``signal_tpu.torch_bridge``)
    as a self-contained artifact: the torch module's weights bake in as
    constants, so serving needs neither torch nor the original model
    definition. The bridge trace is shape-specialized, so the artifact
    serves exactly the traced input shapes (rebuild the bridge for other
    shapes)."""
    if type(bridged).__name__ == "BridgedTrainModule":
        raise ValueError(
            "train-mode bridges are not exportable: their step returns "
            "(outputs, buffer_updates) and may need an rng — export an "
            "eval-mode bridge (lower_torch_module on model.eval()) instead")
    if not getattr(bridged, "input_specs", None):
        raise ValueError("bridged module carries no input_specs — rebuild "
                         "it with a current signal_tpu.torch_bridge")

    def fn(*inputs):
        return bridged.fn(bridged.params, *inputs)

    in_specs = [jax.ShapeDtypeStruct(shape, dtype)
                for shape, dtype in bridged.input_specs]
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    return jexport.export(jax.jit(fn), **kwargs)(*in_specs)


def load_exported_bridged(path: str):
    """Load an ``export_bridged`` artifact → (callable, manifest); the
    callable takes the positional inputs of the original torch forward."""
    with open(os.path.join(path, "model.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    return (lambda *inputs: exported.call(*inputs)), manifest
