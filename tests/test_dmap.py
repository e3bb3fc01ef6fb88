import numpy as np

from deep3d_aerial_tpu.io.dmap import (
    DepthDataRaw,
    read_colmap_array,
    read_dmap,
    write_dmap,
)


def test_dmap_round_trip(tmp_path, rng):
    depth = rng.uniform(50, 150, (48, 64)).astype(np.float32)
    normal = rng.normal(size=(48, 64, 3)).astype(np.float32)
    conf = rng.uniform(0, 1, (48, 64)).astype(np.float32)
    data = DepthDataRaw(
        image_file_name="images/im_01.png",
        neighbor_ids=[2, 5, 7],
        image_size=(96, 128),
        K=np.diag([100.0, 100.0, 1.0]),
        R=np.eye(3),
        C=np.array([1.0, 2.0, 3.0]),
        d_min=50.0, d_max=150.0,
        depth=depth, normal=normal, confidence=conf,
    )
    p = tmp_path / "d.dmap"
    write_dmap(p, data)
    back = read_dmap(p)
    assert back.image_file_name == data.image_file_name
    assert back.neighbor_ids == [2, 5, 7]
    assert back.image_size == (96, 128)
    assert np.allclose(back.K, data.K)
    assert np.allclose(back.C, data.C)
    assert np.array_equal(back.depth, depth)
    assert np.array_equal(back.normal, normal)
    assert np.array_equal(back.confidence, conf)


def test_dmap_depth_only(tmp_path, rng):
    depth = rng.uniform(1, 2, (8, 8)).astype(np.float32)
    data = DepthDataRaw("x.png", [], (8, 8), np.eye(3), np.eye(3),
                        np.zeros(3), 1.0, 2.0, depth)
    p = tmp_path / "d.dmap"
    write_dmap(p, data)
    back = read_dmap(p)
    assert back.normal is None and back.confidence is None
    assert np.array_equal(back.depth, depth)


def test_dmap_reference_writer_compat(tmp_path, rng):
    """Our reader parses files produced by the REFERENCE's writer.

    (The reference's own ImportDepthDataRaw is broken — unbound `normalMap`
    when the normal bit is unset and a `headerType & (4 != 0)` precedence
    bug — so the writer defines the format; dmap_io.py:173-228.)
    """
    import sys

    sys.path.insert(0, "/root/reference")
    np.float = float
    np.int = int
    from IO import dmap_io

    depth = rng.uniform(10, 20, (16, 24)).astype(np.float32)
    normal = rng.normal(size=(16, 24, 3)).astype(np.float32)
    conf = rng.uniform(0, 1, (16, 24)).astype(np.float32)
    p = tmp_path / "ref.dmap"
    dmap_io.ExportDepthDataRaw(
        str(p), "im.png", [1, 2], (32, 48),
        np.diag([5.0, 5.0, 1.0]), np.eye(3), np.array([0.5, 0.5, 9.0]),
        10.0, 20.0, depth, normal, conf,
    )
    back = read_dmap(p)
    assert back.image_file_name == "im.png"
    assert back.neighbor_ids == [1, 2]
    assert back.image_size == (32, 48)
    assert np.allclose(back.K, np.diag([5.0, 5.0, 1.0]))
    assert back.d_min == 10.0 and back.d_max == 20.0
    assert np.allclose(back.depth, depth)
    assert np.allclose(back.normal, normal)
    assert np.allclose(back.confidence, conf)


def test_colmap_array(tmp_path, rng):
    arr = rng.normal(size=(10, 6)).astype(np.float32)
    p = tmp_path / "photometric.bin"
    with open(p, "wb") as f:
        f.write(b"6&10&1&")
        # COLMAP stores (w, h, c) fortran-order == row-major [h, w] payload
        arr.astype("<f4").tofile(f)
    back = read_colmap_array(p)
    assert np.allclose(back, arr)
