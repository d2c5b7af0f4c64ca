"""Lower a torch ``nn.Module`` to a pure JAX function + parameter pytree.

Why this exists: the reference vendors a 22-member CNN zoo
(`modeling/backbones/basic_cnn_params/` in maxingan2412/Signal, ~8.6k LoC
of torchreid-derived model definitions) that its own Signal factory never
reaches (`modeling/make_model.py:294-301` registers ViTs only). The
ReID-idiomatic members got native JAX implementations here
(``models/resnet.py``, ``models/osnet.py``); for the long tail — and for
ANY torch CNN a migrating user brings — this bridge turns the torch
module into a TPU program:

1. trace once to a flat aten graph: ``make_fx`` over
   ``torch.func.functional_call`` so every parameter/buffer becomes a
   graph *input* (not a baked-in constant), wrapped in
   ``torch.func.functionalize`` so in-place aten ops become pure;
2. lower each aten node to its JAX equivalent (table below);
3. return a pure ``fn(params, *inputs)`` that jits, shards, and
   differentiates (w.r.t. ``params``) like any hand-written model.

The trace is shape-specialized (aten graphs have concrete shapes — the
XLA-friendly property that makes every lowered op static), and traces in
the module's current train/eval mode: BatchNorm running stats ride along
in ``params`` as ordinary leaves, so an eval-mode bridge supports
inference and frozen-stat fine-tuning. torch is required only while
*building* the bridge (CPU torch ships in the image); the returned
function and pytree are torch-free.

Numerics: default ``compute_dtype=float32`` runs convs/matmuls at
``Precision.HIGHEST`` for bit-level parity testing against the torch
module; pass ``jnp.bfloat16`` to run them on the MXU at speed (fp32
accumulation, the same policy as the native models).
"""

from __future__ import annotations

import math
import operator
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["lower_torch_module", "lower_torch_module_train",
           "BridgedModule", "BridgedTrainModule"]


# ---------------------------------------------------------------------------
# helpers


def _torch_dtype_to_jnp(tdtype) -> jnp.dtype:
    import torch

    table = {
        torch.float32: jnp.float32, torch.float64: jnp.float32,
        torch.float16: jnp.float16, torch.bfloat16: jnp.bfloat16,
        torch.int64: jnp.int32, torch.int32: jnp.int32,
        torch.uint8: jnp.uint8, torch.bool: jnp.bool_,
    }
    return table.get(tdtype, jnp.float32)


def _pool_out_size(L: int, k: int, s: int, p: int, d: int, ceil_mode: bool) -> int:
    """torch pooling output-length rule, incl. the ceil-mode clause that
    drops a window starting entirely inside the padding."""
    num = L + 2 * p - d * (k - 1) - 1
    out = (num + (s - 1 if ceil_mode else 0)) // s + 1
    if ceil_mode and (out - 1) * s >= L + p:
        out -= 1
    return out


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (list, tuple)):
        if len(v) == 0:
            raise ValueError("empty size list")
        return (int(v[0]), int(v[1] if len(v) > 1 else v[0]))
    return (int(v), int(v))


def _interp_matrix(n_out: int, n_in: int, align_corners: bool) -> np.ndarray:
    """[n_out, n_in] linear-interpolation matrix (torch upsample_bilinear2d
    semantics, separable per axis)."""
    A = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        if align_corners:
            src = i * (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        else:
            src = max((i + 0.5) * n_in / n_out - 0.5, 0.0)
        lo = min(int(math.floor(src)), n_in - 1)
        hi = min(lo + 1, n_in - 1)
        w = src - lo
        A[i, lo] += 1.0 - w
        A[i, hi] += w
    return A


def _adaptive_matrix(n_out: int, n_in: int) -> np.ndarray:
    """[n_out, n_in] averaging matrix for torch adaptive_avg_pool:
    bin i covers [floor(i·in/out), ceil((i+1)·in/out))."""
    A = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        lo = (i * n_in) // n_out
        hi = -(-((i + 1) * n_in) // n_out)  # ceil div
        A[i, lo:hi] = 1.0 / (hi - lo)
    return A


def _reduce_window_2d(x, init, op, k, s, pad_hw):
    return jax.lax.reduce_window(
        x, init, op, (1, 1, k[0], k[1]), (1, 1, s[0], s[1]),
        ((0, 0), (0, 0), pad_hw[0], pad_hw[1]))


# ---------------------------------------------------------------------------
# aten lowerings. Each takes already-resolved JAX values / python scalars in
# the aten schema's positional order (with schema defaults applied by the
# interpreter via partial argument lists).

_LOWERINGS: Dict[str, Callable] = {}


def _register(*names):
    def deco(fn):
        for n in names:
            _LOWERINGS[n] = fn
        return fn
    return deco


@_register("aten.convolution.default")
def _convolution(ctx, x, w, b, stride, padding, dilation, transposed,
                 output_padding, groups):
    if transposed:
        raise NotImplementedError("transposed convolution not bridged")
    dt = ctx.compute_dtype
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    pad = [(int(p), int(p)) for p in padding]
    out = jax.lax.conv_general_dilated(
        x.astype(dt), w.astype(dt),
        window_strides=[int(s) for s in stride], padding=pad,
        rhs_dilation=[int(d) for d in dilation],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=int(groups), precision=prec,
    ).astype(jnp.float32)
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * (out.ndim - 2))
    return out


@_register("aten.native_batch_norm.default",
           "aten._native_batch_norm_legit.default")
def _batch_norm(ctx, x, weight, bias, running_mean, running_var,
                training=False, momentum=0.1, eps=1e-5):
    x32 = x.astype(jnp.float32)
    if training or running_mean is None:
        axes = (0,) + tuple(range(2, x.ndim))
        mean = jnp.mean(x32, axes)
        var = jnp.var(x32, axes)  # biased, as torch normalizes with
    else:
        mean, var = running_mean, running_var
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = jax.lax.rsqrt(var + eps)
    out = (x32 - mean.reshape(shape)) * inv.reshape(shape)
    if weight is not None:
        out = out * weight.reshape(shape)
    if bias is not None:
        out = out + bias.reshape(shape)
    return (out, mean, inv)


@_register("aten._native_batch_norm_legit_no_training.default")
def _batch_norm_no_training(ctx, x, weight, bias, running_mean, running_var,
                            momentum=0.1, eps=1e-5):
    # this overload's schema omits the `training` positional entirely
    return _batch_norm(ctx, x, weight, bias, running_mean, running_var,
                       training=False, momentum=momentum, eps=eps)


@_register("aten._native_batch_norm_legit_functional.default")
def _batch_norm_functional(ctx, x, weight, bias, running_mean, running_var,
                           training, momentum, eps):
    """Train-mode BN (torch.export functionalization): also returns the
    updated running stats (torch updates them with the UNBIASED batch
    variance while normalizing with the biased one)."""
    out, mean, inv = _batch_norm(ctx, x, weight, bias, None, None,
                                 training=True, eps=eps)
    n = x.size // mean.size
    unbiased = jnp.var(x.astype(jnp.float32),
                       (0,) + tuple(range(2, x.ndim))) * (n / max(n - 1, 1))
    new_rm = (1 - momentum) * running_mean + momentum * mean
    new_rv = (1 - momentum) * running_var + momentum * unbiased
    return (out, mean, inv, new_rm, new_rv)


@_register("aten.native_layer_norm.default")
def _layer_norm(ctx, x, normalized_shape, weight, bias, eps=1e-5):
    axes = tuple(range(x.ndim - len(normalized_shape), x.ndim))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axes, keepdims=True)
    var = jnp.var(x32, axes, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight
    if bias is not None:
        out = out + bias
    return (out, mean, var)


@_register("aten.relu.default", "aten.relu_.default")
def _relu(ctx, x):
    return jax.nn.relu(x)


@_register("aten.sigmoid.default")
def _sigmoid(ctx, x):
    return jax.nn.sigmoid(x)


@_register("aten.tanh.default")
def _tanh(ctx, x):
    return jnp.tanh(x)


@_register("aten.gelu.default")
def _gelu(ctx, x, approximate="none"):
    return jax.nn.gelu(x, approximate=(approximate == "tanh"))


@_register("aten._softmax.default", "aten.softmax.int")
def _softmax(ctx, x, dim=-1, half_to_float=False):
    return jax.nn.softmax(x.astype(jnp.float32), axis=dim)


@_register("aten.hardtanh.default", "aten.hardtanh_.default")
def _hardtanh(ctx, x, lo=-1.0, hi=1.0):
    return jnp.clip(x, lo, hi)


@_register("aten.clamp_min.default")
def _clamp_min(ctx, x, lo):
    return jnp.maximum(x, lo)


@_register("aten.add.Tensor", "aten.add_.Tensor", "aten.add.Scalar")
def _add(ctx, a, b, alpha=1):
    return a + (b * alpha if alpha != 1 else b)


@_register("aten.sub.Tensor", "aten.sub.Scalar", "aten.rsub.Scalar")
def _sub(ctx, a, b, alpha=1):
    return a - (b * alpha if alpha != 1 else b)


@_register("aten.mul.Tensor", "aten.mul_.Tensor", "aten.mul.Scalar")
def _mul(ctx, a, b):
    return a * b


@_register("aten.div.Tensor", "aten.div.Scalar")
def _div(ctx, a, b):
    return a / b


@_register("aten.addmm.default")
def _addmm(ctx, bias, m1, m2, beta=1, alpha=1):
    dt = ctx.compute_dtype
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    out = jnp.matmul(m1.astype(dt), m2.astype(dt),
                     precision=prec).astype(jnp.float32)
    return beta * bias + alpha * out


@_register("aten.mm.default", "aten.bmm.default")
def _mm(ctx, a, b):
    dt = ctx.compute_dtype
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    return jnp.matmul(a.astype(dt), b.astype(dt),
                      precision=prec).astype(jnp.float32)


@_register("aten.t.default")
def _t(ctx, x):
    return x.T if x.ndim == 2 else x


@_register("aten.transpose.int")
def _transpose(ctx, x, d0, d1):
    return jnp.swapaxes(x, d0, d1)


@_register("aten.permute.default")
def _permute(ctx, x, dims):
    return jnp.transpose(x, dims)


@_register("aten.view.default", "aten.reshape.default",
           "aten._unsafe_view.default")
def _view(ctx, x, sizes):
    return jnp.reshape(x, [int(s) for s in sizes])


@_register("aten.expand.default")
def _expand(ctx, x, sizes):
    # torch aligns -1 ("keep this dim") from the RIGHT: expand may add
    # new leading dims, so size index i maps to x dim i - offset
    off = len(sizes) - x.ndim
    out = []
    for i, s in enumerate(sizes):
        s = int(s)
        if s == -1:
            if i < off:
                raise ValueError("expand: -1 not allowed for a new dim")
            s = x.shape[i - off]
        out.append(s)
    return jnp.broadcast_to(x, out)


@_register("aten.unsqueeze.default")
def _unsqueeze(ctx, x, dim):
    return jnp.expand_dims(x, dim)


@_register("aten.squeeze.default")
def _squeeze(ctx, x):
    return jnp.squeeze(x)


@_register("aten.squeeze.dim", "aten.squeeze.dims")
def _squeeze_dim(ctx, x, dim):
    dims = tuple(dim) if isinstance(dim, (list, tuple)) else (dim,)
    # torch silently keeps non-1 dims; jnp.squeeze would raise
    dims = tuple(d for d in dims if x.shape[d] == 1)
    return jnp.squeeze(x, dims) if dims else x


@_register("aten.index.Tensor")
def _index(ctx, x, indices):
    # advanced indexing x[idx0, idx1, ...]; None = untouched dim
    return x[tuple(slice(None) if i is None else i for i in indices)]


@_register("aten.repeat.default")
def _repeat(ctx, x, reps):
    reps = [int(r) for r in reps]
    if len(reps) > x.ndim:
        x = x.reshape((1,) * (len(reps) - x.ndim) + x.shape)
    return jnp.tile(x, reps)


@_register("aten.cat.default")
def _cat(ctx, tensors, dim=0):
    return jnp.concatenate(tensors, axis=dim)


@_register("aten.stack.default")
def _stack(ctx, tensors, dim=0):
    return jnp.stack(tensors, axis=dim)


@_register("aten.slice.Tensor")
def _slice(ctx, x, dim=0, start=None, end=None, step=1):
    idx = [slice(None)] * x.ndim
    if end is not None and end > x.shape[dim]:
        end = None  # torch encodes "to the end" as int64 max
    idx[dim] = slice(start, end, step)
    return x[tuple(idx)]


@_register("aten.select.int")
def _select(ctx, x, dim, index):
    return jnp.take(x, index, axis=dim)


@_register("aten.split.Tensor")
def _split(ctx, x, split_size, dim=0):
    n = x.shape[dim]
    outs = []
    for lo in range(0, n, int(split_size)):
        idx = [slice(None)] * x.ndim
        idx[dim] = slice(lo, min(lo + int(split_size), n))
        outs.append(x[tuple(idx)])
    return tuple(outs)


@_register("aten.chunk.default")
def _chunk(ctx, x, chunks, dim=0):
    # torch.chunk fills each chunk to ceil(n/chunks) (last may be short);
    # NOT numpy array_split, which spreads the remainder
    return _split(ctx, x, -(-x.shape[dim] // chunks), dim)


@_register("aten.split_with_sizes.default")
def _split_with_sizes(ctx, x, sizes, dim=0):
    outs, lo = [], 0
    for s in sizes:
        idx = [slice(None)] * x.ndim
        idx[dim] = slice(lo, lo + int(s))
        outs.append(x[tuple(idx)])
        lo += int(s)
    return tuple(outs)


@_register("aten.mean.dim")
def _mean_dim(ctx, x, dims, keepdim=False, dtype=None):
    return jnp.mean(x, axis=tuple(dims), keepdims=keepdim)


@_register("aten.mean.default")
def _mean(ctx, x, dtype=None):
    return jnp.mean(x)


@_register("aten.sum.dim_IntList")
def _sum_dim(ctx, x, dims, keepdim=False, dtype=None):
    return jnp.sum(x, axis=tuple(dims), keepdims=keepdim)


@_register("aten.sum.default")
def _sum(ctx, x, dtype=None):
    return jnp.sum(x.astype(_torch_dtype_to_jnp(dtype))
                   if dtype is not None else x)


@_register("aten.linalg_vector_norm.default")
def _vector_norm(ctx, x, ord=2, dim=None, keepdim=False, dtype=None):
    # torch's vector_norm treats a multi-axis `dim` as one flattened
    # vector; jnp.linalg.norm would compute a MATRIX norm there (ord=2
    # → spectral norm via SVD), so reduce explicitly
    if dim is not None:
        dim = tuple(dim) if isinstance(dim, (list, tuple)) else (int(dim),)
    a = jnp.abs(x.astype(_torch_dtype_to_jnp(dtype) if dtype is not None
                         else jnp.float32))
    p = float(ord)
    if p == float("inf"):
        return jnp.max(a, axis=dim, keepdims=keepdim)
    if p == float("-inf"):
        return jnp.min(a, axis=dim, keepdims=keepdim)
    if p == 0.0:
        return jnp.sum((a != 0).astype(a.dtype), axis=dim, keepdims=keepdim)
    if p == 1.0:
        return jnp.sum(a, axis=dim, keepdims=keepdim)
    if p == 2.0:
        return jnp.sqrt(jnp.sum(a * a, axis=dim, keepdims=keepdim))
    return jnp.sum(a ** p, axis=dim, keepdims=keepdim) ** (1.0 / p)


@_register("aten.clone.default", "aten.detach.default",
           "aten.contiguous.default", "aten.alias.default",
           "aten.lift_fresh_copy.default")
def _identity(ctx, x, *a, **k):
    return x


@_register("aten._to_copy.default", "aten.to.dtype")
def _to_copy(ctx, x, *a, dtype=None, **k):
    # .to(dtype)/.float()/.int() — the cast is the whole point; jnp's
    # float→int astype truncates toward zero exactly like torch's
    if dtype is None:
        return x
    return x.astype(_torch_dtype_to_jnp(dtype))


@_register("aten.empty.memory_format", "aten.zeros.default")
def _zeros(ctx, sizes, dtype=None, **k):
    return jnp.zeros([int(s) for s in sizes],
                     _torch_dtype_to_jnp(dtype) if dtype is not None
                     else jnp.float32)


@_register("aten.zeros_like.default")
def _zeros_like(ctx, x, **k):
    return jnp.zeros_like(x)


@_register("aten.constant_pad_nd.default")
def _constant_pad(ctx, x, pads, value=0.0):
    # torch pad list: (last-dim lo, hi, second-to-last lo, hi, ...)
    cfg = [(0, 0)] * x.ndim
    for i in range(len(pads) // 2):
        cfg[x.ndim - 1 - i] = (int(pads[2 * i]), int(pads[2 * i + 1]))
    return jnp.pad(x, cfg, constant_values=value)


@_register("aten.max_pool2d_with_indices.default")
def _max_pool(ctx, x, kernel, stride=None, padding=(0, 0), dilation=(1, 1),
              ceil_mode=False):
    k, s = _pair(kernel), _pair(stride if stride else kernel)
    p, d = _pair(padding), _pair(dilation)
    H, W = x.shape[2], x.shape[3]
    oh = _pool_out_size(H, k[0], s[0], p[0], d[0], ceil_mode)
    ow = _pool_out_size(W, k[1], s[1], p[1], d[1], ceil_mode)
    hi_h = (oh - 1) * s[0] + d[0] * (k[0] - 1) + 1 - (H + p[0])
    hi_w = (ow - 1) * s[1] + d[1] * (k[1] - 1) + 1 - (W + p[1])
    out = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k[0], k[1]), (1, 1, s[0], s[1]),
        ((0, 0), (0, 0), (p[0], max(hi_h, p[0])), (p[1], max(hi_w, p[1]))),
        window_dilation=(1, 1, d[0], d[1]))
    return (out[:, :, :oh, :ow], None)


@_register("aten.avg_pool2d.default")
def _avg_pool(ctx, x, kernel, stride=None, padding=(0, 0), ceil_mode=False,
              count_include_pad=True, divisor_override=None):
    k, s, p = _pair(kernel), _pair(stride if stride else kernel), _pair(padding)
    H, W = x.shape[2], x.shape[3]
    oh = _pool_out_size(H, k[0], s[0], p[0], 1, ceil_mode)
    ow = _pool_out_size(W, k[1], s[1], p[1], 1, ceil_mode)
    hi_h = max((oh - 1) * s[0] + k[0] - (H + p[0]), p[0])
    hi_w = max((ow - 1) * s[1] + k[1] - (W + p[1]), p[1])
    pad_hw = ((p[0], hi_h), (p[1], hi_w))
    total = _reduce_window_2d(x, 0.0, jax.lax.add, k, s, pad_hw)[:, :, :oh, :ow]
    if divisor_override:
        return total / float(divisor_override)
    if count_include_pad:
        # explicit padding counts; the implicit ceil extension does not
        ones = jnp.pad(jnp.ones((1, 1, H, W), x.dtype),
                       ((0, 0), (0, 0), (p[0], p[0]), (p[1], p[1])),
                       constant_values=1.0)
        cnt_pad = ((0, max(hi_h - p[0], 0)), (0, max(hi_w - p[1], 0)))
    else:
        ones = jnp.ones((1, 1, H, W), x.dtype)
        cnt_pad = ((p[0], hi_h), (p[1], hi_w))
    cnt = _reduce_window_2d(ones, 0.0, jax.lax.add, k, s, cnt_pad)[:, :, :oh, :ow]
    return total / cnt


@_register("aten._adaptive_avg_pool2d.default",
           "aten.adaptive_avg_pool2d.default")
def _adaptive_avg_pool(ctx, x, output_size):
    oh, ow = _pair(output_size)
    Ah = jnp.asarray(_adaptive_matrix(oh, x.shape[2]))
    Aw = jnp.asarray(_adaptive_matrix(ow, x.shape[3]))
    return jnp.einsum("oh,bchw,pw->bcop", Ah, x.astype(jnp.float32), Aw,
                      precision=jax.lax.Precision.HIGHEST)


@_register("aten.upsample_bilinear2d.default")
def _upsample_bilinear(ctx, x, output_size, align_corners=False,
                       scale_factors=None):
    if output_size is None:
        output_size = [int(x.shape[2] * scale_factors[0]),
                       int(x.shape[3] * scale_factors[1])]
    oh, ow = int(output_size[0]), int(output_size[1])
    Ah = jnp.asarray(_interp_matrix(oh, x.shape[2], align_corners))
    Aw = jnp.asarray(_interp_matrix(ow, x.shape[3], align_corners))
    return jnp.einsum("oh,bchw,pw->bcop", Ah, x.astype(jnp.float32), Aw,
                      precision=jax.lax.Precision.HIGHEST)


@_register("aten.upsample_nearest2d.default")
def _upsample_nearest(ctx, x, output_size, scale_factors=None):
    if output_size is None:
        output_size = [int(x.shape[2] * scale_factors[0]),
                       int(x.shape[3] * scale_factors[1])]
    oh, ow = int(output_size[0]), int(output_size[1])
    ih = (np.arange(oh) * x.shape[2] // oh).astype(np.int32)
    iw = (np.arange(ow) * x.shape[3] // ow).astype(np.int32)
    return x[:, :, ih][:, :, :, iw]


@_register("aten.affine_grid_generator.default")
def _affine_grid(ctx, theta, size, align_corners=False):
    N, C, H, W = [int(s) for s in size]

    def base(n):
        if align_corners:
            return jnp.linspace(-1.0, 1.0, n)
        step = 2.0 / n
        return jnp.linspace(-1.0 + step / 2, 1.0 - step / 2, n)

    xs, ys = base(W), base(H)
    gx, gy = jnp.meshgrid(xs, ys)                       # [H, W]
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, ones], -1).reshape(1, H * W, 3)
    grid = jnp.einsum("bij,bkj->bki", theta.astype(jnp.float32),
                      jnp.broadcast_to(coords, (N, H * W, 3)),
                      precision=jax.lax.Precision.HIGHEST)
    return grid.reshape(N, H, W, 2)


@_register("aten.grid_sampler_2d.default")
def _grid_sampler(ctx, x, grid, interpolation_mode=0, padding_mode=0,
                  align_corners=False):
    if interpolation_mode != 0 or padding_mode != 0:
        raise NotImplementedError("only bilinear/zeros grid_sample bridged")
    from signal_tpu.ops.grid_sample import bilinear_grid_sample
    return bilinear_grid_sample(x, grid, align_corners=bool(align_corners))


@_register("aten.slice_scatter.default")
def _slice_scatter(ctx, x, src, dim=0, start=None, end=None, step=1):
    idx = [slice(None)] * x.ndim
    if end is not None and end > x.shape[dim]:
        end = None
    idx[dim] = slice(start, end, step)
    return x.at[tuple(idx)].set(src)


@_register("aten.select_scatter.default")
def _select_scatter(ctx, x, src, dim, index):
    idx = [slice(None)] * x.ndim
    idx[dim] = index
    return x.at[tuple(idx)].set(src)


@_register("aten.copy.default", "aten.copy_.default")
def _copy(ctx, dst, src, *a):
    return jnp.broadcast_to(src, dst.shape).astype(dst.dtype)


@_register("aten.dropout.default")
def _dropout(ctx, x, p=0.5, train=False):
    if train:
        return _native_dropout(ctx, x, p, True)[0]
    return x


@_register("aten.bernoulli.p")
def _bernoulli_p(ctx, x, p, generator=None):
    # F.dropout under functionalize decomposes to bernoulli(keep_p)+mul
    return jax.random.bernoulli(ctx.take_key(), p, x.shape).astype(x.dtype)


@_register("aten.native_dropout.default")
def _native_dropout(ctx, x, p, train):
    if not train or p == 0.0:
        return (x, jnp.ones_like(x, jnp.bool_))
    key = ctx.take_key()
    keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
    return (jnp.where(keep, x / (1.0 - p), 0.0), keep)


# ---------------------------------------------------------------------------
# the interpreter


@dataclass
class BridgedModule:
    """A torch module lowered to JAX.

    ``fn(params, *inputs, rng=None)`` is pure and jittable; ``params``
    maps the torch state_dict names to jnp arrays (running stats
    included). ``float_keys`` lists the float leaves (the
    differentiable subset). ``rng`` matters only if the module was
    traced with stochastic ops active (train-mode dropout).
    """

    fn: Callable
    params: Dict[str, jnp.ndarray]
    float_keys: Tuple[str, ...]
    n_inputs: int
    # the trace is shape-specialized; these are the only valid shapes
    input_specs: Tuple[Tuple[Tuple[int, ...], Any], ...] = ()

    def __call__(self, *inputs, rng=None):
        # rng is needed only when the module was traced in train mode
        # with stochastic ops (dropout) still active
        return self.fn(self.params, *inputs, rng=rng)


class _Ctx:
    def __init__(self, compute_dtype, rng=None):
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.rng = rng
        self._rng_count = 0

    def take_key(self):
        if self.rng is None:
            raise ValueError("this bridged module contains stochastic ops "
                             "(dropout); pass rng=jax.random.PRNGKey(...)")
        self._rng_count += 1
        return jax.random.fold_in(self.rng, self._rng_count)


def _interpret(graph, consts, ctx, env):
    """Execute an aten fx graph under the lowering table; ``env`` comes
    pre-seeded with the placeholder bindings."""
    import torch
    import torch.fx as fx

    def resolve(a):
        if isinstance(a, fx.Node):
            return env[a]
        if isinstance(a, (list, tuple)):
            return type(a)(resolve(x) for x in a)
        if isinstance(a, torch.Tensor):       # inlined constant
            return jnp.asarray(a.detach().numpy())
        return a

    for node in graph.nodes:
        if node.op == "placeholder":
            continue
        if node.op == "get_attr":
            env[node] = consts[node.target]
            continue
        if node.op == "output":
            return resolve(node.args[0])
        if node.op != "call_function":
            raise NotImplementedError(f"node op {node.op} ({node.target})")
        tgt = node.target
        if tgt is operator.getitem:
            env[node] = resolve(node.args[0])[node.args[1]]
            continue
        key = str(tgt)
        lowering = _LOWERINGS.get(key)
        if lowering is None:
            raise NotImplementedError(f"no lowering for aten op {key}")
        args = [resolve(a) for a in node.args]
        kwargs = {k: resolve(v) for k, v in node.kwargs.items()
                  if k not in ("device", "layout", "pin_memory",
                               "memory_format")}
        env[node] = lowering(ctx, *args, **kwargs)
    raise RuntimeError("graph had no output node")


def lower_torch_module(model, example_inputs: Sequence,
                       compute_dtype=jnp.float32) -> BridgedModule:
    """Trace ``model`` on ``example_inputs`` (torch tensors) and lower to
    a pure JAX function. The module's current train/eval mode is baked
    into the trace (use ``model.eval()`` for inference bridges)."""
    import torch
    import torch.utils._pytree as torch_pytree
    from torch.fx.experimental.proxy_tensor import make_fx
    from torch.func import functional_call, functionalize

    example_inputs = tuple(example_inputs)
    pb = dict(model.named_parameters())
    pb.update(dict(model.named_buffers()))

    def run(pb_, args_):
        return functional_call(model, pb_, args_)

    with torch.no_grad():
        gm = make_fx(functionalize(run), tracing_mode="real")(
            pb, example_inputs)

    # recover the flat-argument order (placeholder i ↔ flat leaf i);
    # labels must be pytree LEAVES, so encode as strings
    labels = ({k: "p:" + k for k in pb},
              tuple(f"i:{i}" for i in range(len(example_inputs))))
    flat_labels, _ = torch_pytree.tree_flatten(labels)
    placeholders = [n for n in gm.graph.nodes if n.op == "placeholder"]
    if len(placeholders) != len(flat_labels):
        raise RuntimeError(
            f"placeholder/leaf mismatch: {len(placeholders)} vs "
            f"{len(flat_labels)} — unsupported input structure")

    # constant tensors created inside forward() (e.g. hacnn's STN scale
    # matrices) appear as get_attr nodes on the traced module; keep
    # integer/bool constants (indices, masks) in their native dtype
    consts = {}
    for n in gm.graph.nodes:
        if n.op != "get_attr":
            continue
        t = getattr(gm, n.target).detach()
        if t.is_floating_point():
            t = t.to(torch.float32)   # fp64/bf16/half → TPU-friendly fp32
        consts[n.target] = jnp.asarray(t.numpy())

    params = {k: jnp.asarray(v.detach().numpy()) for k, v in pb.items()}
    float_keys = tuple(k for k, v in params.items()
                       if jnp.issubdtype(v.dtype, jnp.floating))
    graph = gm.graph
    n_in = len(example_inputs)
    specs = tuple((tuple(t.shape), _torch_dtype_to_jnp(t.dtype))
                  for t in example_inputs)
    del example_inputs  # don't pin the example torch tensors in fn's closure

    def fn(params_, *inputs, rng=None):
        if len(inputs) != n_in:
            raise TypeError(f"expected {n_in} inputs")
        env: Dict[Any, Any] = {}
        ph_iter = iter(placeholders)
        for label in flat_labels:
            node = next(ph_iter)
            kind, _, key = label.partition(":")
            env[node] = params_[key] if kind == "p" else inputs[int(key)]
        result = _interpret(graph, consts, _Ctx(compute_dtype, rng), env)
        if isinstance(result, (list, tuple)) and len(result) == 1:
            return result[0]
        return result

    return BridgedModule(fn=fn, params=params, float_keys=float_keys,
                         n_inputs=n_in, input_specs=specs)


@dataclass
class BridgedTrainModule:
    """A torch module lowered in TRAIN mode via ``torch.export``:
    BatchNorm normalizes with batch statistics and the running-stat
    updates come back functionally.

    ``fn(params, *inputs, rng=None)`` →
    ``(outputs, buffer_updates)`` where ``buffer_updates`` maps the
    mutated buffer names (``buffer_targets``) to their new values —
    merge them back into ``params`` between steps. ``rng`` is required
    only when the module contains stochastic ops (dropout).
    """

    fn: Callable
    params: Dict[str, jnp.ndarray]
    float_keys: Tuple[str, ...]
    buffer_targets: Tuple[str, ...]
    n_inputs: int

    def __call__(self, *inputs, rng=None):
        return self.fn(self.params, *inputs, rng=rng)


def lower_torch_module_train(model, example_inputs: Sequence,
                             compute_dtype=jnp.float32) -> BridgedTrainModule:
    """Trace ``model`` in train mode (``torch.export`` + core-aten
    decomposition, which functionalizes buffer mutation) and lower to a
    pure JAX step function. torch updates BN running stats inside the
    forward; here they return as explicit outputs."""
    import torch

    model = model.train()
    ep = torch.export.export(model, tuple(example_inputs), strict=False)
    ep = ep.run_decompositions()
    gm = ep.graph_module
    sig = ep.graph_signature

    params = {k: jnp.asarray(v.detach().numpy())
              for k, v in ep.state_dict.items()}
    consts = {}
    bindings: List[Tuple[str, Any]] = []   # ("param", name) | ("input", i)
    n_user = 0
    for spec in sig.input_specs:
        kind = spec.kind.name
        if kind in ("PARAMETER", "BUFFER"):
            bindings.append(("param", spec.target))
        elif kind == "CONSTANT_TENSOR":
            params[spec.target] = jnp.asarray(
                ep.constants[spec.target].detach().numpy())
            bindings.append(("param", spec.target))
        elif kind == "USER_INPUT":
            bindings.append(("input", n_user))
            n_user += 1
        else:
            raise NotImplementedError(f"input spec kind {kind}")

    out_specs = list(sig.output_specs)
    placeholders = [n for n in gm.graph.nodes if n.op == "placeholder"]
    if len(placeholders) != len(bindings):
        raise RuntimeError(f"placeholder/spec mismatch: "
                           f"{len(placeholders)} vs {len(bindings)}")
    float_keys = tuple(k for k, v in params.items()
                       if jnp.issubdtype(v.dtype, jnp.floating))
    buffer_targets = tuple(s.target for s in out_specs
                           if s.kind.name == "BUFFER_MUTATION")
    graph = gm.graph

    def fn(params_, *inputs, rng=None):
        if len(inputs) != n_user:
            raise TypeError(f"expected {n_user} inputs")
        env: Dict[Any, Any] = {}
        for node, (kind, key) in zip(placeholders, bindings):
            env[node] = params_[key] if kind == "param" else inputs[key]
        results = _interpret(graph, consts, _Ctx(compute_dtype, rng), env)
        updates, outs = {}, []
        for spec, val in zip(out_specs, results):
            if spec.kind.name == "BUFFER_MUTATION":
                updates[spec.target] = val
            else:
                outs.append(val)
        return (outs[0] if len(outs) == 1 else tuple(outs)), updates

    return BridgedTrainModule(fn=fn, params=params, float_keys=float_keys,
                              buffer_targets=buffer_targets, n_inputs=n_user)
