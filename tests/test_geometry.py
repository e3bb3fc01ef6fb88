import numpy as np
import pytest

from deep3d_aerial_tpu.geometry.camera import (
    AXIS_ROTATIONS,
    Pose,
    proj_matrix,
    qvec2rotmat,
    rotmat2qvec,
    stage_proj_pyramid,
)
from tests.conftest import random_pose, toy_camera


def test_axis_rotations_orthonormal():
    for name, O in AXIS_ROTATIONS.items():
        assert np.allclose(O @ O.T, np.eye(3)), name
        assert np.isclose(abs(np.linalg.det(O)), 1.0), name


@pytest.mark.parametrize("axes", sorted(AXIS_ROTATIONS))
@pytest.mark.parametrize("rotation", ["Rcw", "Rwc"])
@pytest.mark.parametrize("translation", ["tcw", "twc"])
def test_convention_round_trip(rng, axes, rotation, translation):
    pose = random_pose(rng)
    R, t = pose.to_convention(axes, rotation, translation)
    back = Pose.from_convention(R, t, axes, rotation, translation)
    assert np.allclose(back.R_cw, pose.R_cw, atol=1e-12)
    assert np.allclose(back.t_cw, pose.t_cw, atol=1e-9)


def test_project_unproject_round_trip(rng):
    pose = random_pose(rng)
    cam = toy_camera()
    pts = rng.uniform(-10, 10, size=(100, 3))
    uv, depth = pose.world_to_image(cam.K, pts)
    assert (depth > 0).all()
    back = pose.image_to_world(cam.K, uv, depth)
    assert np.allclose(back, pts, atol=1e-8)


def test_two_view_transfer(rng):
    """A world point projected in two cameras is consistent through
    unproject(cam1) -> project(cam2)."""
    p1, p2 = random_pose(rng), random_pose(rng)
    cam = toy_camera()
    pts = rng.uniform(-8, 8, size=(50, 3))
    uv1, d1 = p1.world_to_image(cam.K, pts)
    world = p1.image_to_world(cam.K, uv1, d1)
    uv2, d2 = p2.world_to_image(cam.K, world)
    uv2_direct, d2_direct = p2.world_to_image(cam.K, pts)
    assert np.allclose(uv2, uv2_direct, atol=1e-7)
    assert np.allclose(d2, d2_direct, atol=1e-8)


def test_proj_matrix_matches_manual(rng):
    pose = random_pose(rng)
    cam = toy_camera()
    P = proj_matrix(cam.K, pose)
    pts = rng.uniform(-5, 5, size=(20, 3))
    h = np.concatenate([pts, np.ones((20, 1))], axis=1)
    proj = (P @ h.T).T
    uv = proj[:, :2] / proj[:, 2:3]
    uv_ref, d_ref = pose.world_to_image(cam.K, pts)
    assert np.allclose(uv, uv_ref, atol=1e-8)
    assert np.allclose(proj[:, 2], d_ref, atol=1e-9)


def test_stage_pyramid_scaling(rng):
    pose = random_pose(rng)
    cam = toy_camera()
    P = proj_matrix(cam.K, pose)
    stages = stage_proj_pyramid(P, 3)
    assert np.allclose(stages[2], P)
    assert np.allclose(stages[1][:2, :], P[:2, :] / 2)
    assert np.allclose(stages[0][:2, :], P[:2, :] / 4)
    # bottom rows untouched -> depths invariant across stages
    assert np.allclose(stages[0][2:, :], P[2:, :])


def test_quaternion_round_trip(rng):
    for _ in range(20):
        pose = random_pose(rng)
        q = rotmat2qvec(pose.R_cw)
        assert np.allclose(qvec2rotmat(q), pose.R_cw, atol=1e-10)
        assert q[0] >= 0
