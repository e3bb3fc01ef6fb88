"""Native (C++) host kernels vs their NumPy fallbacks."""

import numpy as np
import pytest

from deep3d_aerial_tpu.utils.native import (
    dsm_reduce,
    grid_decimate_indices,
    load_native,
)

needs_native = pytest.mark.skipif(
    load_native() is None, reason="libaerial3d_native.so not built"
)

BBX = [0.0, 10.0, 0.0, 10.0, -5.0, 50.0]


@needs_native
def test_native_dsm_max_matches_numpy(rng):
    pts = np.stack([
        rng.uniform(0, 10, 5000), rng.uniform(0, 10, 5000),
        rng.uniform(0, 20, 5000)], -1).astype(np.float32)
    grid = dsm_reduce(pts, BBX, (1.0, 1.0), (10, 10), -9999.0, robust=False)

    # brute-force numpy
    ref = np.full((10, 10), -9999.0, np.float32)
    for x, y, z in pts:
        ix = int(np.floor(x / 1.0))
        iy = int(np.floor((10.0 - y) / 1.0))
        if 0 <= ix < 10 and 0 <= iy < 10:
            ref[iy, ix] = max(ref[iy, ix], z)
    assert np.allclose(grid, ref)


@needs_native
def test_native_robust_max_rejects_spike(rng):
    pts = np.concatenate([
        np.stack([np.full(50, 0.5), np.full(50, 9.5),
                  1.0 + 0.01 * np.arange(50)], 1),
        [[0.5, 9.5, 40.0]],
    ]).astype(np.float32)
    grid = dsm_reduce(pts, BBX, (1.0, 1.0), (10, 10), -9999.0, robust=True)
    assert grid[0, 0] < 5.0


@needs_native
def test_native_grid_decimate(rng):
    pts = np.stack([
        rng.uniform(0, 10, 2000), rng.uniform(0, 10, 2000),
        rng.uniform(0, 1, 2000)], -1).astype(np.float32)
    idx = grid_decimate_indices(pts, 1.0)
    assert idx is not None
    # one representative per occupied cell
    cells = set()
    for i in idx:
        c = (int(pts[i, 0]), int(pts[i, 1]))
        assert c not in cells
        cells.add(c)
    assert len(idx) <= 121
    assert len(idx) >= 90  # most cells occupied with 2000 random points


@needs_native
def test_dsm_pipeline_uses_native(rng):
    """The DSM stage produces identical semantics through the native path."""
    from deep3d_aerial_tpu.dsm import DSMConfig, DSMFromPointCloud

    pts = np.array([[0.5, 9.5, 1.0], [0.6, 9.6, 3.0], [9.5, 0.5, 7.0]],
                   np.float32)
    cfg = DSMConfig(cell_size=(1.0, 1.0), select_method="Max")
    grid = DSMFromPointCloud(cfg).create(pts, BBX)
    assert grid[0, 0] == 3.0 and grid[9, 9] == 7.0


def test_million_point_block_fast_paths(rng):
    """VERDICT #8 acceptance: a 1M-point block's host-side hot loops run in
    seconds — CSR visibility assembly, .mvs vertex serialization, DSM
    point reduction, and (native) mesh rasterization."""
    import time

    from deep3d_aerial_tpu.utils.csr import VisibilityCSR, remap_ids

    # bounds are generous: this box shares 4 cores with remote-compile
    # threads; the test guards against quadratic/per-point-loop behavior,
    # not absolute speed
    n = 1_000_000
    pts = np.column_stack([
        rng.uniform(0, 500, n), rng.uniform(0, 500, n),
        rng.uniform(0, 30, n)]).astype(np.float32)

    t0 = time.time()
    counts = rng.integers(2, 6, n).astype(np.int64)
    vals = rng.integers(1, 40, int(counts.sum())).astype(np.int32)
    csr = VisibilityCSR(vals, counts)
    mapped = remap_ids(csr, {i: i - 1 for i in range(1, 41)})
    t_csr = time.time() - t0
    assert len(mapped) == n and t_csr < 60.0, t_csr

    from deep3d_aerial_tpu.io.mvs_interface import _serialize_vertices

    t0 = time.time()
    blob = _serialize_vertices(pts, mapped, None)
    t_ser = time.time() - t0
    assert len(blob) > n * 20 and t_ser < 60.0, t_ser

    from deep3d_aerial_tpu.dsm.rasterize import DSMConfig, DSMFromPointCloud

    t0 = time.time()
    grid = DSMFromPointCloud(DSMConfig(cell_size=(1.0, 1.0))).create(
        pts, [0, 500, 0, 500, 0, 40])
    t_dsm = time.time() - t0
    assert grid.shape[0] >= 499 and t_dsm < 60.0, t_dsm
