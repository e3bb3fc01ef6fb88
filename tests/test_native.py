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
