import numpy as np

from deep3d_aerial_tpu.io.ply import read_ply, write_ply


def test_ply_round_trip_full(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    col = rng.integers(0, 256, size=(100, 3)).astype(np.uint8)
    p = tmp_path / "cloud.ply"
    write_ply(p, pts, nrm, col)
    pts2, nrm2, col2 = read_ply(p)
    assert np.array_equal(pts2, pts)
    assert np.array_equal(nrm2, nrm)
    assert np.array_equal(col2, col)


def test_ply_points_only(tmp_path, rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    p = tmp_path / "p.ply"
    write_ply(p, pts)
    pts2, nrm2, col2 = read_ply(p)
    assert np.array_equal(pts2, pts)
    assert nrm2 is None and col2 is None


def test_ply_header_is_standard(tmp_path, rng):
    p = tmp_path / "h.ply"
    write_ply(p, np.zeros((3, 3), np.float32), colors=np.zeros((3, 3), np.uint8))
    head = open(p, "rb").read(200).split(b"end_header")[0].decode()
    assert "format binary_little_endian 1.0" in head
    assert "element vertex 3" in head
    assert "property uchar red" in head
