"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (set BEFORE jax import)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from deep3d_aerial_tpu.geometry.camera import Camera, Pose  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_pose(rng, dist=100.0):
    """A camera ~`dist` above the origin looking mostly downward."""
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(0, 0.3)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    R_jitter = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
    # canonical: camera z looks toward -z world (down), x right, y toward -y
    R_down = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    R_cw = R_jitter @ R_down
    center = np.array([rng.uniform(-5, 5), rng.uniform(-5, 5), dist])
    return Pose(R_cw, -R_cw @ center)


def toy_camera(width=64, height=48, f=80.0):
    return Camera(
        camera_id=1, width=width, height=height,
        fx=f, fy=f, cx=width / 2.0, cy=height / 2.0,
    )
