"""Layout-friendly integer-factor bilinear upsampling (ops layer).

Lives in ops so both ops.depth_samplers and models.blocks can use it
without inverting the ops <- models layering (models.blocks re-exports
the private alias `_upsample_axis_lerp` for existing callers).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def upsample_axis_lerp(x, p: int, axis: int):
    """Exact bilinear p-x upsampling along one axis (half-pixel centers +
    edge clamp — jax.image.resize 'bilinear' semantics for integer
    factors) as phase-decomposed slice lerps.

    Why not jax.image.resize: its dot_general lowering makes XLA lay the
    operands out channel-minor, lane-padding C=8..32 up to 128 — measured
    25x HBM expansion (39 GB, OOM) on the [5,1856,2752,8] feature maps at
    the full-res operating point (docs/PERF.md).

    Phase interleave layout: the p phases are CONCATENATED along the
    flattened trailing dims T and un-merged with one free reshape
    ((n, p*T) -> (n*p, T)), never stacked on their own minor axis — a
    [..., n, p, C] stack puts (p, C) on the (sublane, lane) tiling and
    pads up to 51x at full-res (measured 9.74 GB for ONE feature-branch
    upsample at 1856x2752, round-3 OOM). When the upsampled axis IS the
    minor axis (no trailing dims), the axis is transposed with the
    second-minor dim first so the merge trick applies.
    """
    axis = axis % x.ndim
    n = x.shape[axis]

    if axis == x.ndim - 1:
        # borrow the second-minor axis as trailing dims (transpose in,
        # transpose out): a direct minor-axis interleave would stack a
        # p-wide minor dim (lane pad p -> 128)
        assert x.ndim >= 2, "minor-axis upsample needs a second axis"
        xt = jnp.swapaxes(x, -1, -2)
        return jnp.swapaxes(upsample_axis_lerp(xt, p, -2), -1, -2)

    lead = x.shape[:axis]
    trail = x.shape[axis + 1:]
    T = int(np.prod(trail))
    xf = x.reshape(*lead, n, T)

    def shifted(a):
        if a == 0:
            return xf
        if a == -1:
            return jnp.concatenate([xf[..., :1, :], xf[..., :n - 1, :]], -2)
        assert a == 1
        return jnp.concatenate([xf[..., 1:, :], xf[..., n - 1:, :]], -2)

    phases = []
    for q in range(p):
        src = (q + 0.5) / p - 0.5
        a = int(np.floor(src))
        f = src - a
        phases.append(((1.0 - f) * shifted(a) + f * shifted(a + 1))
                      .astype(x.dtype))
    y = jnp.concatenate(phases, axis=-1)       # [..., n, p*T]
    return y.reshape(*lead, n * p, *trail)     # free merge (row-major)
