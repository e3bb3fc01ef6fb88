import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep3d_aerial_tpu.geometry.camera import (
    proj_matrix,
    stage_relative_projections,
)
from deep3d_aerial_tpu.models import build_model
from deep3d_aerial_tpu.parallel.train_step import make_optimizer, make_train_step
from deep3d_aerial_tpu.train.losses import cascade_depth_loss, smooth_l1
from deep3d_aerial_tpu.train.metrics import (
    abs_depth_error,
    interval_accuracy,
    normal_angle_error,
)
from deep3d_aerial_tpu.train.trainer import parse_lr_epochs
from tests.conftest import toy_camera
from tests.test_pipeline import render_view, terrain_z

H, W, V = 32, 48, 3


def textured_batch(rng, b=2):
    """Real multi-view geometry + rendered texture + GT depth."""
    from deep3d_aerial_tpu.geometry.camera import Pose

    cam_K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    imgs, rels, gts = [], [], []
    for k in range(b):
        views = []
        projs = []
        gt = None
        for v in range(V):
            R_down = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
            c = np.array([v * 6.0 - 6 + k, k * 3.0, 100.0])
            pose = Pose(R_down, -R_down @ c)
            import tests.test_pipeline as tp

            old = (tp.W_IMG, tp.H_IMG)
            tp.W_IMG, tp.H_IMG = W, H
            img = render_view(pose, cam_K)
            tp.W_IMG, tp.H_IMG = old
            views.append(np.dstack([img.astype(np.float32) / 255.0] * 3))
            projs.append(proj_matrix(cam_K, pose))
            if v == 0:
                # GT depth of the ref view
                gx, gy = np.meshgrid(np.arange(W, dtype=np.float64),
                                     np.arange(H, dtype=np.float64))
                Kinv = np.linalg.inv(cam_K)
                rays = np.stack([gx, gy, np.ones_like(gx)], -1) @ Kinv.T @ pose.R_wc.T
                t = pose.center
                depth = (0.0 - t[2]) / rays[..., 2]
                for _ in range(30):
                    wpt = t + rays * depth[..., None]
                    depth = (terrain_z(wpt[..., 0], wpt[..., 1]) - t[2]) / rays[..., 2]
                gt = depth.astype(np.float32)
        imgs.append(np.stack(views))
        rels.append(stage_relative_projections(np.stack(projs), 3))
        gts.append(gt)
    return {
        "imgs": jnp.asarray(np.stack(imgs)),
        "rel_projs": jnp.asarray(np.stack(rels), jnp.float32),
        "depth_min": jnp.full((b,), 90.0),
        "depth_max": jnp.full((b,), 110.0),
        "depth_gt": jnp.asarray(np.stack(gts)),
        "mask": jnp.ones((b, H, W)),
    }


def test_smooth_l1():
    assert float(smooth_l1(jnp.float32(0.5), jnp.float32(0.0))) == 0.125
    assert float(smooth_l1(jnp.float32(3.0), jnp.float32(0.0))) == 2.5


def test_parse_lr_epochs():
    assert parse_lr_epochs("10,12,14:2") == ((10, 12, 14), 0.5)


def test_metrics_basic():
    est = jnp.full((4, 4), 10.0)
    gt = jnp.full((4, 4), 10.2)
    mask = jnp.ones((4, 4), bool)
    assert np.isclose(float(abs_depth_error(est, gt, mask, interval=0.1)), 0.2)
    assert float(interval_accuracy(est, gt, mask, 1.0, 0.1)) == 0.0
    assert float(interval_accuracy(est, gt, mask, 3.0, 0.1)) == 1.0

    n1 = jnp.asarray(np.tile([0, 0, 1.0], (4, 4, 1)), jnp.float32)
    n2 = jnp.asarray(np.tile([0, 1.0, 0], (4, 4, 1)), jnp.float32)
    assert np.isclose(float(normal_angle_error(n1, n2, mask)), 90.0)


def test_metrics_outlier_cap():
    est = jnp.array([[10.0, 100.0]])
    gt = jnp.array([[10.0, 10.0]])
    mask = jnp.ones((1, 2), bool)
    # 90-unit error > 100 * 0.1 interval -> excluded
    assert np.isclose(float(abs_depth_error(est, gt, mask, interval=0.1)), 0.0)


def test_cascade_loss_weights(rng):
    outputs = {
        f"stage{k}": {"depth": jnp.full((H, W), 100.0 + k)} for k in (1, 2, 3)
    }
    gt = [jnp.full((H, W), 100.0)] * 3
    mask = [jnp.ones((H, W))] * 3
    logs = cascade_depth_loss(outputs, gt, mask, stage_weights=(0.5, 1.0, 2.0),
                              pair_weight=0.0)
    # smooth-l1 of errors 1,2,3 = 0.5, 1.5, 2.5; weighted 0.25+1.5+5.0
    assert np.isclose(float(logs["total"]), 6.75)


@pytest.mark.slow
def test_training_reduces_loss(rng):
    """A few optimizer steps on a textured synthetic scene reduce the loss —
    gradients flow end-to-end through warp + cost volume + 3D CNN."""
    batch = textured_batch(rng, b=2)
    model = build_model("casmvsnet", ndepths=(8, 8, 8), num_depth=32)
    tx = make_optimizer(2e-4, kind="adam")
    params = model.init(
        jax.random.PRNGKey(0), batch["imgs"][0], batch["rel_projs"][0],
        90.0, 110.0,
    )
    opt_state = tx.init(params)
    step = make_train_step(model, tx, pair_weight=0.0)

    losses = []
    for i in range(8):
        params, opt_state, logs = step(params, opt_state, batch)
        losses.append(float(logs["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_normal_aware_loss_term(rng):
    """normal_weight adds a (1 - cos) term against normals derived from
    the predicted depth (normal-aware training mode)."""
    import jax
    import jax.numpy as jnp

    from deep3d_aerial_tpu.models import build_model
    from deep3d_aerial_tpu.parallel.train_step import (
        make_optimizer, make_train_step,
    )

    batch = textured_batch(rng, b=1)
    B, _, Hh, Ww = batch["imgs"].shape[:4]
    batch["normal_gt"] = np.tile(
        np.array([0, 0, -1.0], np.float32), (B, Hh, Ww, 1))
    K = np.array([[100.0, 0, Ww / 2], [0, 100.0, Hh / 2], [0, 0, 1]],
                 np.float32)
    batch["K_inv"] = np.tile(np.linalg.inv(K), (B, 1, 1))

    model = build_model("casmvsnet", ndepths=(8, 8, 8), num_depth=32)
    tx = make_optimizer(1e-3, kind="adam")
    params = model.init(jax.random.PRNGKey(0), batch["imgs"][0],
                        batch["rel_projs"][0], 90.0, 110.0)
    opt = tx.init(params)
    step = make_train_step(model, tx, pair_weight=0.0, normal_weight=1.0)
    _, _, logs = step(params, opt, batch)
    assert "normal_loss" in logs
    assert 0.0 <= float(logs["normal_loss"]) <= 2.0
    assert np.isfinite(float(logs["total"]))


def test_best_checkpoint_selection(tmp_path):
    """best_checkpoint picks the lowest val-error name; latest_checkpoint
    the newest epoch (reference err-in-name scheme, train_whu.py:214-219)."""
    from deep3d_aerial_tpu.train.checkpoint import (best_checkpoint,
                                                    latest_checkpoint)

    for name in ("model_000001_2.5000", "model_000002_1.2500",
                 "model_000003_1.9000"):
        (tmp_path / name).mkdir()
    assert best_checkpoint(str(tmp_path)).endswith("model_000002_1.2500")
    assert latest_checkpoint(str(tmp_path)).endswith("model_000003_1.9000")
    # no error-suffixed names -> fall back to newest
    empty = tmp_path / "plain"
    empty.mkdir()
    (empty / "model_000004").mkdir()
    assert best_checkpoint(str(empty)).endswith("model_000004")


def test_merge_matching_params_partial_warm_start():
    """Partial warm start ports shape-matched leaves and keeps init where
    shapes differ (the ndepths-dependent per-view 2D regularizer conv —
    a 16/8/8 toy checkpoint warm-starting a 48/32/8 run)."""
    import numpy as np

    from deep3d_aerial_tpu.train.checkpoint import merge_matching_params

    init = {
        "feat": {"kernel": np.zeros((3, 3, 8, 8), np.float32)},
        "reg": {"kernel": np.zeros((3, 3, 48, 48), np.float32)},
        "new_head": {"bias": np.zeros((4,), np.float32)},
    }
    warm = {
        "feat": {"kernel": np.ones((3, 3, 8, 8), np.float32)},
        "reg": {"kernel": np.ones((3, 3, 16, 16), np.float32)},
        "old_head": {"bias": np.ones((2,), np.float32)},
    }
    merged, n_ok, n_skip, skipped = merge_matching_params(init, warm)
    assert n_ok == 1 and n_skip == 1
    assert merged["feat"]["kernel"].sum() == 3 * 3 * 8 * 8   # ported
    assert merged["reg"]["kernel"].sum() == 0.0              # kept at init
    assert merged["new_head"]["bias"].shape == (4,)          # init-only kept
    assert "reg" in skipped[0]
