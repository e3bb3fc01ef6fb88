import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep3d_aerial_tpu.geometry.camera import (
    proj_matrix,
    stage_relative_projections,
)
from deep3d_aerial_tpu.models import build_model
from deep3d_aerial_tpu.parallel import (
    make_mesh,
    make_train_step,
    shard_batch,
    use_mesh,
)
from deep3d_aerial_tpu.parallel.train_step import make_infer_step, make_optimizer
from tests.conftest import random_pose, toy_camera

B, V, H, W = 4, 3, 32, 32
DMIN, DMAX = 80.0, 120.0


def make_batch(rng):
    cam = toy_camera(width=W, height=H, f=60.0)
    imgs, rels = [], []
    for b in range(B):
        projs = [proj_matrix(cam.K, random_pose(rng)) for _ in range(V)]
        rels.append(stage_relative_projections(np.stack(projs), 3))
        imgs.append(rng.normal(size=(V, H, W, 3)).astype(np.float32))
    return {
        "imgs": jnp.asarray(np.stack(imgs)),
        "rel_projs": jnp.asarray(np.stack(rels), jnp.float32),
        "depth_min": jnp.full((B,), DMIN),
        "depth_max": jnp.full((B,), DMAX),
        "depth_gt": jnp.full((B, H, W), 100.0),
        "mask": jnp.ones((B, H, W)),
    }


def test_devices_available():
    assert len(jax.devices()) >= 8  # virtual CPU mesh


def test_sharded_train_step_matches_single(rng):
    batch = make_batch(rng)
    model = build_model("casmvsnet", ndepths=(8, 8, 8), num_depth=32)
    # SGD: first-step RMSprop updates are ~sign(g) and amplify benign
    # reduction-order noise between layouts; SGD keeps deltas O(lr * dg)
    import optax

    tx = optax.sgd(1e-3)
    params = model.init(
        jax.random.PRNGKey(0), batch["imgs"][0], batch["rel_projs"][0],
        DMIN, DMAX,
    )
    opt0 = tx.init(params)

    # single-device step
    step1 = make_train_step(model, tx, pair_weight=0.0)
    p1, _, logs1 = step1(params, opt0, batch)

    # dp4 x sp2 sharded step
    mesh = make_mesh({"dp": 4, "sp": 2})
    with use_mesh(mesh):
        step2 = make_train_step(model, tx, pair_weight=0.0, mesh=mesh)
        sharded = shard_batch(batch, mesh, "dp")
        p2, _, logs2 = step2(params, opt0, sharded)

    assert np.isclose(float(logs1["total"]), float(logs2["total"]), rtol=1e-4)
    # updated parameters agree across layouts. An untrained cascade's
    # gradients are chaotic (soft-argmax over near-uniform probabilities
    # amplifies fp32 reduction-order noise between layouts), so compare the
    # UPDATE DIRECTION per leaf, not exact values: a wrong collective would
    # produce wildly different or misscaled updates.
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    flat0 = jax.tree_util.tree_leaves(params)
    for a, b, p0 in zip(flat1, flat2, flat0):
        u1 = np.asarray(a) - np.asarray(p0)
        u2 = np.asarray(b) - np.asarray(p0)
        n1 = np.linalg.norm(u1)
        n2 = np.linalg.norm(u2)
        if n1 < 1e-12 and n2 < 1e-12:
            continue
        # comparable magnitude and aligned direction
        assert 0.5 < (n2 + 1e-12) / (n1 + 1e-12) < 2.0
        cos = float(np.sum(u1 * u2) / ((n1 * n2) + 1e-24))
        assert cos > 0.8, f"update direction diverged (cos={cos})"


def test_sharded_infer_matches_single(rng):
    batch = make_batch(rng)
    model = build_model("casmvsnet", ndepths=(8, 8, 8), num_depth=32)
    params = model.init(
        jax.random.PRNGKey(0), batch["imgs"][0], batch["rel_projs"][0],
        DMIN, DMAX,
    )
    infer1 = make_infer_step(model)
    out1 = infer1(params, batch["imgs"], batch["rel_projs"],
                  batch["depth_min"], batch["depth_max"])

    mesh = make_mesh({"dp": 4})
    infer2 = make_infer_step(model, mesh=mesh)
    out2 = infer2(params, batch["imgs"], batch["rel_projs"],
                  batch["depth_min"], batch["depth_max"])
    assert np.allclose(out1["depth"], out2["depth"], rtol=1e-4, atol=1e-4)


def test_mesh_construction():
    mesh = make_mesh({"dp": 2, "sp": 4})
    assert mesh.axis_names == ("dp", "sp")
    assert mesh.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        make_mesh({"dp": 128})
