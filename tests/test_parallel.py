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
    # SINGLE-stage model: the multi-stage cascade re-samples depth windows
    # around the previous stage's depth, so fp-noise between layouts shifts
    # bilinear gather cells discretely and gradients are not comparable.
    # One stage has no resampling feedback -> layouts must agree closely.
    # depth_shards=2: the blocked-depth 'sp' design — the SAME graph runs
    # single-device and dp x sp sharded (constraints ON), so gradients
    # must match across layouts.
    model = build_model("casmvsnet", ndepths=(8,), num_depth=32,
                        depth_shards=2)
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
    step1 = make_train_step(model, tx, num_stages=1, pair_weight=0.0)
    p1, _, logs1 = step1(params, opt0, batch)

    # dp4 x sp2 sharded step
    mesh = make_mesh({"dp": 4, "sp": 2})
    with use_mesh(mesh):
        step2 = make_train_step(model, tx, num_stages=1, pair_weight=0.0,
                                mesh=mesh)
        sharded = shard_batch(batch, mesh, "dp")
        p2, _, logs2 = step2(params, opt0, sharded)

    assert np.isclose(float(logs1["total"]), float(logs2["total"]), rtol=1e-4)
    # Compare the GLOBAL update across layouts. Per-leaf comparison is
    # degenerate: several leaves have mathematically-zero gradients (e.g. the
    # score-conv bias under softmax shift invariance), so those leaves carry
    # pure reduction-order noise. The global update is dominated by the real
    # gradients; a wrong collective (missing psum, double-count) would break
    # norm ratio or direction badly.
    # exclude the score-conv bias leaves: softmax shift-invariance makes
    # their true gradient 0, so the computed value is catastrophic-
    # cancellation noise whose magnitude depends on reduction order.
    def flat_updates(p_new):
        paths_new = jax.tree_util.tree_flatten_with_path(p_new)[0]
        paths_old = jax.tree_util.tree_flatten_with_path(params)[0]
        out = []
        for (path, a), (_, p0) in zip(paths_new, paths_old):
            key = jax.tree_util.keystr(path)
            if "prob" in key and "bias" in key:
                continue
            out.append((np.asarray(a) - np.asarray(p0)).ravel())
        return np.concatenate(out)

    u1 = flat_updates(p1)
    u2 = flat_updates(p2)
    n1, n2 = np.linalg.norm(u1), np.linalg.norm(u2)
    assert 0.9 < n2 / n1 < 1.1, (n1, n2)
    cos = float(u1 @ u2 / (n1 * n2))
    assert cos > 0.99, f"global update direction diverged (cos={cos})"


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


def test_adamvs_streaming_sp_matches_single(rng):
    """The flagship streaming model under dp x sp: blocked scans + exact
    online-softmax merge — sharded inference must match single-device."""
    batch = make_batch(rng)
    model = build_model("adamvs", ndepths=(8, 8, 8), num_depth=32,
                        depth_shards=2, plane_chunk=4)
    params = model.init(
        jax.random.PRNGKey(0), batch["imgs"][0], batch["rel_projs"][0],
        DMIN, DMAX,
    )
    infer1 = make_infer_step(model)
    out1 = infer1(params, batch["imgs"], batch["rel_projs"],
                  batch["depth_min"], batch["depth_max"])

    mesh = make_mesh({"dp": 4, "sp": 2})
    infer2 = make_infer_step(model, mesh=mesh)
    out2 = infer2(params, batch["imgs"], batch["rel_projs"],
                  batch["depth_min"], batch["depth_max"])
    assert np.allclose(out1["depth"], out2["depth"], rtol=1e-4, atol=1e-4)


def test_depth_shards_merge_exact(rng):
    """depth_shards changes only the recurrence blocking, not the softmax:
    with a regularizer-free check the merged online softmax must equal the
    unblocked one. Here: a 1-block vs 2-block casmvsnet stage-1 forward on
    identical params differs only through the blocked 3D regularizer."""
    from deep3d_aerial_tpu.models.cascade import OnlineSoftmaxState

    D, H, W = 16, 4, 4
    scores = jnp.asarray(rng.normal(size=(D, H, W)).astype(np.float32))
    depths = jnp.asarray(np.linspace(80, 120, D, dtype=np.float32))
    dvals = jnp.broadcast_to(depths[:, None, None], (D, H, W))

    # sequential update over all D
    st = OnlineSoftmaxState.init((H, W))
    for d in range(D):
        st = OnlineSoftmaxState.update(st, scores[d], dvals[d])
    depth_seq, conf_seq = OnlineSoftmaxState.finalize(st)

    # two blocks merged
    sts = []
    for blk in (range(0, 8), range(8, 16)):
        s = OnlineSoftmaxState.init((H, W))
        for d in blk:
            s = OnlineSoftmaxState.update(s, scores[d], dvals[d])
        sts.append(s)
    stacked = tuple(jnp.stack([a[i] for a in sts]) for i in range(4))
    depth_m, conf_m = OnlineSoftmaxState.finalize(
        OnlineSoftmaxState.merge_axis0(stacked))
    assert np.allclose(depth_seq, depth_m, rtol=1e-6, atol=1e-5)
    assert np.allclose(conf_seq, conf_m, rtol=1e-6, atol=1e-6)


def test_mesh_construction():
    mesh = make_mesh({"dp": 2, "sp": 4})
    assert mesh.axis_names == ("dp", "sp")
    assert mesh.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        make_mesh({"dp": 128})
