import numpy as np
import pytest

from deep3d_aerial_tpu.dsm import DSMConfig, DSMFromMesh, DSMFromPointCloud
from deep3d_aerial_tpu.dsm.rasterize import moving_average_fill
from deep3d_aerial_tpu.io.geotiff import read_geotiff, write_geotiff, write_tfw

BBX = [0.0, 10.0, 0.0, 10.0, -5.0, 50.0]


def test_dsm_max(rng):
    pts = np.array([
        [0.5, 9.5, 1.0], [0.6, 9.6, 3.0],   # same cell -> max 3
        [9.5, 0.5, 7.0],                     # bottom-right cell
    ])
    cfg = DSMConfig(cell_size=(1.0, 1.0), select_method="Max")
    grid = DSMFromPointCloud(cfg).create(pts, BBX)
    assert grid.shape == (10, 10)
    assert grid[0, 0] == 3.0         # NW cell (x=0.5, y=9.5)
    assert grid[9, 9] == 7.0         # SE cell
    assert grid[5, 5] == cfg.nodata  # empty


def test_dsm_robust_max(rng):
    # 50 ground points at z~1 + one spike at z=40 in the same cell
    pts = np.concatenate([
        np.stack([np.full(50, 0.5), np.full(50, 9.5),
                  1.0 + 0.01 * np.arange(50)], 1),
        [[0.5, 9.5, 40.0]],
    ])
    cfg = DSMConfig(cell_size=(1.0, 1.0), select_method="Robust_Max")
    grid = DSMFromPointCloud(cfg).create(pts, BBX)
    assert grid[0, 0] < 5.0  # spike rejected
    cfg_max = DSMConfig(cell_size=(1.0, 1.0), select_method="Max")
    assert DSMFromPointCloud(cfg_max).create(pts, BBX)[0, 0] == 40.0


def test_dsm_moving_average_fill():
    cfg = DSMConfig(cell_size=(1.0, 1.0))
    grid = np.full((5, 5), cfg.nodata, np.float32)
    grid[0, 0] = 10.0
    grid[0, 2] = 20.0
    filled = moving_average_fill(grid, cfg)
    assert filled[0, 0] == 10.0  # valid cells untouched
    assert np.isclose(filled[0, 1], 15.0)  # mean of window neighbors
    assert np.isclose(filled[2, 1], 15.0)
    assert filled[4, 4] == cfg.nodata  # out of window reach


def test_dsm_from_mesh_flat_plane():
    # two triangles covering the whole bbx at z = 7
    verts = np.array([
        [0, 0, 7.0], [10, 0, 7.0], [10, 10, 7.0], [0, 10, 7.0]
    ])
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    cfg = DSMConfig(cell_size=(1.0, 1.0))
    grid = DSMFromMesh(cfg).create(verts, faces, BBX)
    valid = grid != cfg.nodata
    assert valid.mean() > 0.9
    assert np.allclose(grid[valid], 7.0)


def test_dsm_from_mesh_slope():
    verts = np.array([
        [0, 0, 0.0], [10, 0, 10.0], [10, 10, 10.0], [0, 10, 0.0]
    ])
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    cfg = DSMConfig(cell_size=(1.0, 1.0))
    grid = DSMFromMesh(cfg).create(verts, faces, BBX)
    # z equals x coordinate of the cell center
    for col in range(10):
        v = grid[5, col]
        if v != cfg.nodata:
            assert abs(v - (col + 0.5)) < 0.51


def test_geotiff_round_trip(tmp_path, rng):
    grid = rng.normal(size=(20, 30)).astype(np.float32)
    p = tmp_path / "dsm.tif"
    write_geotiff(p, grid, origin_xy=(500.0, 4200.0), cell_size=(0.2, 0.2),
                  nodata=-9999.0)
    back, origin, cell, nodata = read_geotiff(p)
    assert np.array_equal(back, grid)
    assert origin == (500.0, 4200.0)
    assert cell == (0.2, 0.2)
    assert nodata == -9999.0


def test_tfw(tmp_path):
    write_tfw(tmp_path / "dsm.tfw", (100.0, 200.0), (0.5, 0.5))
    lines = open(tmp_path / "dsm.tfw").read().splitlines()
    assert float(lines[0]) == 0.5
    assert float(lines[3]) == -0.5
    assert float(lines[4]) == 100.25  # center of first pixel
    assert float(lines[5]) == 199.75


def test_mesh_rasterize_native_matches_python(rng, monkeypatch):
    """Native rasterize_mesh_max agrees with the Python fallback."""
    from deep3d_aerial_tpu.dsm.rasterize import DSMConfig, rasterize_mesh
    from deep3d_aerial_tpu.utils import native as native_mod
    from deep3d_aerial_tpu.utils.native import (
        load_native, rasterize_mesh_native,
    )

    if load_native() is None:
        import pytest

        pytest.skip("native library not built")

    cfg = DSMConfig(cell_size=(1.0, 1.0))
    verts = np.column_stack([
        rng.uniform(0, 20, 60), rng.uniform(0, 20, 60),
        rng.uniform(1, 5, 60)]).astype(np.float64)
    from scipy.spatial import Delaunay

    faces = Delaunay(verts[:, :2]).simplices.astype(np.int32)
    bbx = [0, 20, 0, 20, 0, 10]
    rows = cols = 20

    native = rasterize_mesh_native(
        verts[faces], bbx, cfg.cell_size, (rows, cols), cfg.nodata)
    # force the pure-Python branch for the comparison side
    monkeypatch.setattr(native_mod, "rasterize_mesh_native",
                        lambda *a, **k: None)
    full = rasterize_mesh(verts, faces, bbx, cfg)
    assert native.shape == full.shape
    both = (native != cfg.nodata) & (full != cfg.nodata)
    assert both.mean() > 0.5
    np.testing.assert_allclose(native[both], full[both], atol=1e-4)
