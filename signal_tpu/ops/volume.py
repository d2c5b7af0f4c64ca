"""GAM's Gram-volume, closed form.

The reference (`utils/volume.py:14-62` in maxingan2412/Signal) builds a
[B1, B2, 3, 3] stack of Gram matrices from pairwise dot products and runs
``torch.det`` (batched LU). On TPU the 3×3 determinant expands to a short
polynomial in the six dot-product maps — three GEMMs plus elementwise VPU
work, no LU, no tiny-matrix batching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gram_volume3(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """sqrt |det Gram([a_i, b_j, c_j])| for every (i, j) pair.

    a: [B1, D]; b, c: [B2, D]. Returns [B1, B2] fp32.

    Gram(i, j) = [[a·a, a·b, a·c],
                  [a·b, b·b, b·c],
                  [a·c, b·c, c·c]]
    with the cross terms mixing sample i (rows) and sample j (columns),
    exactly as the reference's expand/stack does.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c = c.astype(jnp.float32)

    hi = jax.lax.Precision.HIGHEST  # det cancellation needs true fp32 dots
    aa = jnp.sum(a * a, axis=-1)[:, None]          # [B1, 1]
    ab = jnp.matmul(a, b.T, precision=hi)          # [B1, B2]
    ac = jnp.matmul(a, c.T, precision=hi)          # [B1, B2]
    bb = jnp.sum(b * b, axis=-1)[None, :]          # [1, B2]
    bc = jnp.sum(b * c, axis=-1)[None, :]          # [1, B2]
    cc = jnp.sum(c * c, axis=-1)[None, :]          # [1, B2]

    det = (
        aa * (bb * cc - bc * bc)
        - ab * (ab * cc - bc * ac)
        + ac * (ab * bc - bb * ac)
    )
    # sqrt(|det|): |det| can touch 0 when modalities align — the goal of the
    # loss — where d|x|/dx is undefined and 1/(2·sqrt) blows up. The tiny eps
    # bounds the gradient (reference relies on torch's subgradient there).
    return jnp.sqrt(jnp.abs(det) + eps)
