"""Verify the sweep kernel's coverage flag holds at the production
operating point (1856x2752, 5 views, 48/32/8 cascade) for the bench
geometry — i.e. the full-res bench really exercises the kernel, not the
gather fallback (VERDICT round-2 weak #1).

chunk_origins_and_coverage is pure JAX, so this runs on CPU: for every
cascade stage it checks stage-1 uniform planes exactly, and stage-2/3
per-pixel windows centered at a grid of plausible depths (the cascade
narrows windows around the previous stage's prediction, so centers
spanning [dmin, dmax] bound the reachable geometry).

Usage: python scripts/check_coverage.py [H W]   (default 1856 2752)
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _drop_axon():
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        import jax._src.xla_bridge as _xb

        for name in list(getattr(_xb, "_backend_factories", {})):
            if "axon" in name:
                _xb._backend_factories.pop(name, None)
    except Exception:
        pass


def main():
    _drop_axon()
    import jax.numpy as jnp

    from __graft_entry__ import _example_inputs  # bench geometry
    from deep3d_aerial_tpu.ops.pallas_sweep import (
        _round_up,
        chunk_origins_and_coverage,
    )

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 1856
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 2752
    _, rel = _example_inputs(V=5, H=H, W=W)
    rel = np.asarray(rel)  # [3 stages, V-1, 4, 4]
    dmin, dmax = 80.0, 120.0
    ndepths = (48, 32, 8)
    ratios = (4.0, 2.0, 1.0)
    interval = (dmax - dmin) / 384.0
    chunk = 8

    all_ok = True
    for s, (nd, ratio) in enumerate(zip(ndepths, ratios)):
        scale = 2 ** (2 - s)
        Hs, Ws = H // scale, W // scale
        Hp, Wp = _round_up(Hs, 8), _round_up(Ws, 128)
        ref_valid = (Hs, Ws) if (Hp, Wp) != (Hs, Ws) else None
        if s == 0:
            centers = [None]
        else:
            centers = np.linspace(dmin, dmax, 5)
        for c in centers:
            if c is None:
                depths = np.broadcast_to(
                    np.linspace(dmin, dmax, nd)[:, None, None],
                    (nd, Hs, Ws)).astype(np.float32)
            else:
                win = nd * ratio * interval
                depths = np.broadcast_to(
                    (c + np.linspace(-win / 2, win / 2, nd))[:, None, None],
                    (nd, Hs, Ws)).astype(np.float32)
            depths_p = np.zeros((nd, Hp, Wp), np.float32)
            depths_p[:, :Hs, :Ws] = depths
            for k0 in range(0, nd, chunk):
                dc = jnp.asarray(depths_p[k0:k0 + chunk])
                for v in range(rel.shape[1]):
                    _, cov = chunk_origins_and_coverage(
                        jnp.asarray(rel[s, v], jnp.float32).reshape(-1)[:12],
                        dc, Hp, Wp, 8, 128, 32, 256, 4,
                        ref_valid=ref_valid,
                    )
                    ok = bool(cov)
                    all_ok &= ok
                    if not ok:
                        print(f"UNCOVERED stage{s+1} view{v} chunk@{k0} "
                              f"center={c}")
        print(f"stage{s+1} ({Hs}x{Ws} -> padded {Hp}x{Wp}, D={nd}): "
              f"{'COVERED' if all_ok else 'UNCOVERED'}")
    print("ALL COVERED" if all_ok else "COVERAGE FAILURES — kernel would "
          "fall back to the gather path")

    # Realistic survey geometry (r5 lesson: the bench _example_inputs
    # f=150*(W/512) is far below real aerial focals; the E2E's
    # f=130*(W/96) survey missed coverage at (32, 256)). Verify the
    # estimator-sized window covers it.
    ok2 = check_survey_geometry(H, W)
    return 0 if (all_ok and ok2) else 1


def check_survey_geometry(H, W):
    import jax.numpy as jnp

    from deep3d_aerial_tpu.geometry.camera import (
        Pose, proj_matrix, stage_relative_projections)
    from deep3d_aerial_tpu.ops.pallas_sweep import (
        _round_up, chunk_origins_and_coverage, estimate_window)

    f = 130.0 * (W / 96.0)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    R = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    fp = W / f * 100.0
    offsets = [(0, 0), (0.45 * fp, 0), (-0.45 * fp, 0),
               (0, 0.45 * fp * H / W), (0.45 * fp, 0.45 * fp * H / W)]
    projs = [proj_matrix(K, Pose(R, -R @ np.array([ox, oy, 100.0])))
             for ox, oy in offsets]
    rel = np.asarray(stage_relative_projections(np.stack(projs), 3))
    dmin, dmax = 90.0, 104.0
    wh, ww, nr = estimate_window(rel, dmin, dmax, (H, W),
                                 ndepths=(48, 32, 8), num_depth=384)
    print(f"survey geometry (f={f:.0f}): estimated window ({wh},{ww}) "
          f"NR={nr}")
    interval = (dmax - dmin) / 384.0
    ok = True
    for s, (nd, ratio) in enumerate(zip((48, 32, 8), (4.0, 2.0, 1.0))):
        scale = 2 ** (2 - s)
        Hs, Ws = H // scale, W // scale
        Hp, Wp = _round_up(Hs, 8), _round_up(max(Ws, 128), 128)
        rv = (Hs, Ws) if (Hp, Wp) != (Hs, Ws) else None
        centers = [None] if s == 0 else np.linspace(dmin, dmax, 3)
        for c in centers:
            if c is None:
                planes = np.linspace(dmin, dmax, nd)
            else:
                win = nd * ratio * interval
                planes = c + np.linspace(-win / 2, win / 2, nd)
            dp = np.zeros((nd, Hp, Wp), np.float32)
            dp[:, :Hs, :Ws] = planes[:, None, None]
            for v in range(rel.shape[1]):
                for k0 in range(0, nd, 8):
                    _, cov = chunk_origins_and_coverage(
                        jnp.asarray(rel[s, v], jnp.float32).reshape(-1)[:12],
                        jnp.asarray(dp[k0:k0 + 8]), Hp, Wp, 8, 128,
                        min(wh, Hp), max(128, (min(ww, Wp) // 128) * 128),
                        nr, ref_valid=rv)
                    ok &= bool(cov)
    print("survey geometry:", "COVERED with estimated window" if ok
          else "STILL UNCOVERED — estimator bug")
    return ok


if __name__ == "__main__":
    sys.exit(main())
