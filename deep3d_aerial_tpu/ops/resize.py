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
    the full-res operating point (docs/PERF.md). Slices + elementwise
    keep the natural W-minor layout."""
    axis = axis % x.ndim
    n = x.shape[axis]

    def shifted(a):
        sl = [slice(None)] * x.ndim
        if a == 0:
            return x
        if a == -1:
            sl[axis] = slice(0, 1)
            first = x[tuple(sl)]
            sl[axis] = slice(0, n - 1)
            return jnp.concatenate([first, x[tuple(sl)]], axis)
        assert a == 1
        sl[axis] = slice(n - 1, n)
        last = x[tuple(sl)]
        sl[axis] = slice(1, n)
        return jnp.concatenate([x[tuple(sl)], last], axis)

    phases = []
    for q in range(p):
        src = (q + 0.5) / p - 0.5
        a = int(np.floor(src))
        f = src - a
        phases.append(((1.0 - f) * shifted(a) + f * shifted(a + 1))
                      .astype(x.dtype))
    y = jnp.stack(phases, axis=axis + 1)  # [..., n, p, ...]
    return y.reshape(*x.shape[:axis], n * p, *x.shape[axis + 1:])
