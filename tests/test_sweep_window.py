"""Geometry-adaptive sweep-kernel windows (ops/pallas_sweep.estimate_window).

The round-5 full-res E2E found that a REALISTIC survey (f=3727 px at
1856x2752, 0.45-footprint baselines) produces warp footprints the
default (32, 256) src window cannot cover — strict mode NaN-poisoned
every depth map. estimate_window sizes the window host-side from the
scene's rel projections + depth range; these tests pin the failure mode
(a per-tile footprint span the fixed window can't hold) and the fix
against the real coverage function.
"""

import numpy as np
import pytest

from deep3d_aerial_tpu.ops.pallas_sweep import (
    _round_up,
    chunk_origins_and_coverage,
    estimate_window,
)


def shift_rel(s):
    """Identity + depth-varying x-shift: x_src = x + s/d, so planes
    d in [1, 2] spread a tile's union footprint over s/2 px — the
    structural (non-knife-edge) version of the E2E coverage miss."""
    rel = np.eye(4, dtype=np.float64)
    rel[0, 3] = s
    return rel


def covered_uniform(rel, dmin, dmax, H, W, window, nr, nd=8):
    Hp, Wp = _round_up(H, 8), _round_up(max(W, 128), 128)
    rv = (H, W) if (Hp, Wp) != (H, W) else None
    dp = np.zeros((nd, Hp, Wp), np.float32)
    dp[:, :H, :W] = np.linspace(dmin, dmax, nd)[:, None, None]
    _, cov = chunk_origins_and_coverage(
        np.asarray(rel, np.float32).reshape(-1)[:12], dp, Hp, Wp, 8, 128,
        min(window[0], Hp), max(128, (min(window[1], Wp) // 128) * 128),
        nr, ref_valid=rv)
    return bool(cov)


def estimate_1stage(rel, dmin, dmax, H, W, nd=8):
    return estimate_window(np.asarray(rel)[None, None], dmin, dmax, (H, W),
                           ndepths=(nd,), ratios=(1.0,), num_depth=nd)


def test_wide_span_misses_default_window_and_estimator_fixes_it():
    """A 150-px per-chunk footprint span structurally exceeds the default
    256-lane window; the estimated window must cover it."""
    H, W = 16, 1024
    rel, dmin, dmax = shift_rel(300.0), 1.0, 2.0
    assert not covered_uniform(rel, dmin, dmax, H, W, (32, 256), 4)
    wh, ww, nr = estimate_1stage(rel, dmin, dmax, H, W)
    assert ww > 256
    assert covered_uniform(rel, dmin, dmax, H, W, (wh, ww), nr)


def test_estimated_window_monotone_in_disparity():
    widths = [estimate_1stage(shift_rel(s), 1.0, 2.0, 16, 1024)[1]
              for s in (40.0, 300.0, 600.0)]
    assert widths[0] <= widths[1] <= widths[2]
    assert widths[2] > widths[0]


def test_estimator_covers_what_it_promises_vertical():
    """Same structural case on the y axis (WIN_H + NR budget)."""
    H, W = 256, 128
    rel = np.eye(4, dtype=np.float64)
    rel[1, 3] = 120.0  # y_src = y + 120/d
    dmin, dmax = 1.0, 2.0
    assert not covered_uniform(rel, dmin, dmax, H, W, (32, 256), 4)
    wh, ww, nr = estimate_1stage(rel, dmin, dmax, H, W)
    assert wh > 32
    assert covered_uniform(rel, dmin, dmax, H, W, (wh, ww), nr)


def test_bench_geometry_keeps_default_window():
    """The bench-point geometry must not inflate the window (perf:
    bigger windows mean bigger DMAs)."""
    from __graft_entry__ import _example_inputs

    _, rel = _example_inputs(V=5, H=384, W=512)
    wh, ww, nr = estimate_window(
        np.asarray(rel), 80.0, 120.0, (384, 512),
        ndepths=(48, 32, 8), ratios=(4.0, 2.0, 1.0))
    assert (wh, ww, nr) == (32, 256, 4)


def test_sweep_win_env_threads_into_kernel(monkeypatch, rng):
    """SWEEP_WIN/SWEEP_NR env resolve at trace time in the chunk entry
    points (interpret mode; exactness vs the XLA oracle unchanged)."""
    import jax.numpy as jnp

    from deep3d_aerial_tpu.ops.pallas_sweep import sweep_corr_chunk_pallas
    from deep3d_aerial_tpu.ops.warp import plane_sweep_warp_single

    H, W, C = 16, 128, 8
    ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    rel = jnp.asarray(shift_rel(40.0), jnp.float32)
    depths = jnp.broadcast_to(jnp.linspace(1.0, 1.2, 4)[:, None, None],
                              (4, H, W)).astype(jnp.float32)

    monkeypatch.setenv("SWEEP_WIN", "40,384")
    monkeypatch.setenv("SWEEP_NR", "6")
    corr, cov = sweep_corr_chunk_pallas(ref, src, rel, depths,
                                        interpret=True)
    assert bool(cov)
    want = []
    for k in range(4):
        w = plane_sweep_warp_single(src, rel, depths[k], (H, W))
        want.append(np.asarray((w * ref).mean(-1)))
    np.testing.assert_allclose(np.asarray(corr), np.stack(want),
                               atol=1e-4, rtol=1e-4)
