import numpy as np

from deep3d_aerial_tpu.io.las import las_bbox, read_las, write_las
from deep3d_aerial_tpu.io.ply import write_ply
from deep3d_aerial_tpu.io.tiles import TiledPointCloud, bbox_intersects, tile_border


def test_las_round_trip(tmp_path, rng):
    pts = rng.uniform(-100, 100, size=(500, 3))
    col = rng.integers(0, 255, size=(500, 3)).astype(np.uint8)
    p = tmp_path / "t.las"
    write_las(p, pts, col)
    pts2, col2, header = read_las(p)
    assert header["version"] == (1, 2)
    assert header["point_format"] == 2
    assert header["count"] == 500
    assert np.allclose(pts2, pts, atol=0.001)  # mm quantization
    assert np.array_equal(col2, col)


def test_las_no_color(tmp_path, rng):
    pts = rng.uniform(0, 10, size=(50, 3))
    p = tmp_path / "p.las"
    write_las(p, pts)
    pts2, col2, header = read_las(p)
    assert col2 is None and header["point_format"] == 0
    assert np.allclose(pts2, pts, atol=0.001)


def test_las_bbox_header(tmp_path, rng):
    pts = rng.uniform(5, 15, size=(100, 3))
    p = tmp_path / "b.las"
    write_las(p, pts)
    bbox = las_bbox(p)
    assert np.isclose(bbox[0], pts[:, 0].min(), atol=1e-6)
    assert np.isclose(bbox[5], pts[:, 2].max(), atol=1e-6)


def test_tile_border_cache(tmp_path, rng):
    pts = rng.uniform(0, 5, size=(20, 3)).astype(np.float32)
    p = tmp_path / "c.ply"
    write_ply(p, pts)
    b1 = tile_border(str(p))
    assert (tmp_path / "c.ply.bbox.json").exists()
    b2 = tile_border(str(p))  # cached path
    assert np.allclose(b1, b2)


def test_bbox_intersects():
    assert bbox_intersects([0, 2, 0, 2], [1, 3, 1, 3])
    assert not bbox_intersects([0, 1, 0, 1], [2, 3, 0, 1])


def test_tiled_point_cloud(tmp_path, rng):
    # two tiles in disjoint xy regions
    a = np.stack([rng.uniform(0, 10, 200), rng.uniform(0, 10, 200),
                  rng.uniform(0, 1, 200)], -1)
    b = np.stack([rng.uniform(100, 110, 300), rng.uniform(0, 10, 300),
                  rng.uniform(0, 1, 300)], -1)
    write_las(tmp_path / "a.las", a)
    write_ply(tmp_path / "b.ply", b.astype(np.float32))

    tc = TiledPointCloud(str(tmp_path))
    assert len(tc.paths) == 2

    sel = tc.tiles_in([0, 20, 0, 20, -5, 5])
    assert len(sel) == 1 and sel[0].endswith("a.las")

    pts, _ = tc.load_block([0, 20, 0, 20, -5, 5])
    assert 150 < len(pts) <= 200
    pts_all, _ = tc.load_block([-10, 200, -10, 20, -5, 5])
    assert len(pts_all) == 500
