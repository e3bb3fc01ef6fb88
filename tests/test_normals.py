import jax.numpy as jnp
import numpy as np

from deep3d_aerial_tpu.ops.normals import (
    backproject_cam,
    depth_gradient_weights,
    normals_from_depth,
)


def test_flat_plane_normals():
    """A fronto-parallel plane has normals (0, 0, -1) (facing the camera)."""
    K_inv = jnp.asarray(np.linalg.inv(
        np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])), jnp.float32)
    depth = jnp.full((48, 64), 50.0)
    n = np.asarray(normals_from_depth(depth, K_inv))
    inner = n[5:-5, 5:-5]
    assert np.allclose(inner[..., 0], 0, atol=1e-3)
    assert np.allclose(inner[..., 1], 0, atol=1e-3)
    assert np.allclose(inner[..., 2], -1, atol=1e-3)


def test_sloped_plane_normals():
    """A plane tilted in camera x: z_cam = d0 + s * x_cam. Its normal must
    tilt accordingly and stay unit length + camera-facing."""
    f = 100.0
    K = np.array([[f, 0, 32], [0, f, 24], [0, 0, 1]])
    K_inv = np.linalg.inv(K)
    s = 0.3
    d0 = 50.0
    gx, gy = np.meshgrid(np.arange(64, dtype=np.float64),
                         np.arange(48, dtype=np.float64))
    # z = d0 + s * x_cam, x_cam = (u - cx) z / f  =>  z (1 - s(u-cx)/f) = d0
    depth = d0 / (1.0 - s * (gx - 32) / f)
    n = np.asarray(normals_from_depth(
        jnp.asarray(depth, jnp.float32), jnp.asarray(K_inv, jnp.float32)))
    inner = n[10:-10, 10:-10]
    assert np.allclose(np.linalg.norm(inner, axis=-1), 1.0, atol=1e-4)
    # expected normal direction ~ (-s, 0, 1)/|..| flipped to face camera
    expected = np.array([-s, 0.0, 1.0])
    expected /= np.linalg.norm(expected)
    if expected[2] > 0:
        expected = -expected
    dots = np.abs(inner @ expected)
    assert dots.min() > 0.999
    assert (inner[..., 2] <= 0).all()


def test_invalid_depth_default_normal():
    K_inv = jnp.eye(3)
    depth = jnp.zeros((8, 8))
    n = np.asarray(normals_from_depth(depth, K_inv))
    assert np.allclose(n, np.array([0, 0, -1.0]))


def test_backproject_roundtrip():
    K = np.array([[80.0, 0, 16], [0, 80.0, 12], [0, 0, 1]])
    depth = jnp.full((24, 32), 10.0)
    pts = np.asarray(backproject_cam(depth, jnp.asarray(np.linalg.inv(K), jnp.float32)))
    # center pixel maps to the optical axis
    assert np.allclose(pts[12, 16], [0, 0, 10.0], atol=1e-5)


def test_gradient_weights_low_at_edges():
    img = np.zeros((16, 16), np.float32)
    img[:, 8:] = 1.0
    w = np.asarray(depth_gradient_weights(jnp.asarray(img)))
    assert w[8, 8] < 0.1  # at the step edge
    assert w[8, 2] > 0.9  # flat region


def test_depth_from_normal_plane_fixed_point():
    """A perfect plane (depth + analytic normals) is a fixed point of the
    normal-guided propagation (reference compute_depth_by_normal,
    compute_normals.py:84)."""
    import jax.numpy as jnp

    from deep3d_aerial_tpu.ops.normals import (
        depth_from_normal,
        normals_from_depth,
    )

    H, W = 24, 32
    K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1.0]],
                 np.float32)
    K_inv = np.linalg.inv(K).astype(np.float32)
    # slanted plane in camera coords: n . X = c  =>  depth = c / (ray . n)
    n = np.array([0.2, -0.1, 1.0])
    n = n / np.linalg.norm(n)
    c = 100.0
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    ray = np.stack([(gx - K[0, 2]) / K[0, 0],
                    (gy - K[1, 2]) / K[1, 1],
                    np.ones_like(gx)], -1)
    depth = (c / (ray @ n)).astype(np.float32)
    normal = np.broadcast_to(n.astype(np.float32), (H, W, 3))
    img = np.ones((H, W), np.float32)

    out = depth_from_normal(jnp.asarray(depth), jnp.asarray(normal),
                            jnp.asarray(K), jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out), depth, rtol=1e-5)

    # and the forward op recovers the plane normal in the interior
    est = np.asarray(normals_from_depth(jnp.asarray(depth),
                                        jnp.asarray(K_inv)))
    interior = est[4:-4, 4:-4]
    cos = np.abs(interior @ n)
    assert (cos > 0.999).mean() > 0.95


def test_depth_from_normal_denoises_plane():
    """Propagation pulls noisy depth toward the local-plane consensus."""
    import jax.numpy as jnp

    from deep3d_aerial_tpu.ops.normals import depth_from_normal

    rng = np.random.default_rng(0)
    H, W = 24, 32
    K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1.0]],
                 np.float32)
    depth = np.full((H, W), 100.0, np.float32)
    noisy = depth + rng.normal(0, 0.5, size=(H, W)).astype(np.float32)
    normal = np.broadcast_to(
        np.array([0, 0, 1.0], np.float32), (H, W, 3))
    img = np.ones((H, W), np.float32)
    out = np.asarray(depth_from_normal(
        jnp.asarray(noisy), jnp.asarray(normal), jnp.asarray(K),
        jnp.asarray(img)))
    err_in = np.abs(noisy - depth).mean()
    err_out = np.abs(out - depth).mean()
    assert err_out < 0.55 * err_in
