"""Channel-first full-res feature path (feature_net.multi_view_features)
== the vmap/NHWC path, end to end through the whole model.

The CF path is the 1856x2752 memory fix (NHWC feature maps lane-pad
16-51x at full res — docs/PERF.md round-3); it must be numerically
identical at any size, so equivalence is checked at test size by forcing
the loop threshold to 0."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3d_aerial_tpu.models import build_model, feature_net
from tests.test_models import DMAX, DMIN, make_inputs, tiny_kwargs


@pytest.mark.parametrize("name,warp", [
    ("adamvs", "xla"),
    ("adamvs", "pallas"),
    ("msrednet", "xla"),
])
def test_cf_feature_path_matches_vmap(rng, monkeypatch, name, warp):
    if warp == "pallas":
        monkeypatch.setenv("PALLAS_INTERPRET", "1")
    imgs, projs = make_inputs(rng)
    kw = dict(tiny_kwargs(name), warp_impl=warp)
    model = build_model(name, **kw)
    params = model.init(jax.random.PRNGKey(0), imgs, projs, DMIN, DMAX)
    ref = model.apply(params, imgs, projs, DMIN, DMAX)

    monkeypatch.setattr(feature_net, "FEATS_LOOP_THRESHOLD", 0)
    cf = model.apply(params, imgs, projs, DMIN, DMAX)
    atol = 2e-3 if warp == "pallas" else 1e-4
    np.testing.assert_allclose(np.asarray(cf["depth"]),
                               np.asarray(ref["depth"]),
                               atol=atol, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cf["photometric_confidence"]),
                               np.asarray(ref["photometric_confidence"]),
                               atol=1e-4, rtol=1e-3)


def test_cf_param_tree_matches_vmap(rng, monkeypatch):
    """Loop-mode params are checkpoint-interchangeable with vmap-mode
    (same tree, same shapes)."""
    imgs, projs = make_inputs(rng)
    model = build_model("adamvs", **tiny_kwargs("adamvs"))
    p_vmap = model.init(jax.random.PRNGKey(0), imgs, projs, DMIN, DMAX)
    monkeypatch.setattr(feature_net, "FEATS_LOOP_THRESHOLD", 0)
    p_loop = model.init(jax.random.PRNGKey(0), imgs, projs, DMIN, DMAX)
    a = jax.tree.map(lambda x: x.shape, p_vmap)
    b = jax.tree.map(lambda x: x.shape, p_loop)
    assert a == b


@pytest.mark.parametrize("name", ["adamvs", "msrednet"])
def test_split_feature_path_matches_vmap(rng, monkeypatch, name):
    """FEATS_SPLIT=1 (ref un-vmapped + srcs vmapped, no stacked [V,...]
    tensor — the r5 trace's slice/relayout lever) must match the default
    vmap path bit-for-bit in params and numerically in outputs."""
    monkeypatch.setenv("FEATS_SPLIT", "1")
    imgs, projs = make_inputs(rng)
    model = build_model(name, **tiny_kwargs(name))
    p_split = model.init(jax.random.PRNGKey(0), imgs, projs, DMIN, DMAX)
    out_split = model.apply(p_split, imgs, projs, DMIN, DMAX)

    monkeypatch.setenv("FEATS_SPLIT", "0")
    p_vmap = model.init(jax.random.PRNGKey(0), imgs, projs, DMIN, DMAX)
    assert (jax.tree.map(lambda x: x.shape, p_split)
            == jax.tree.map(lambda x: x.shape, p_vmap))
    out_vmap = model.apply(p_vmap, imgs, projs, DMIN, DMAX)
    np.testing.assert_allclose(np.asarray(out_split["depth"]),
                               np.asarray(out_vmap["depth"]),
                               atol=1e-4, rtol=1e-4)


def test_split_feature_path_gradients(rng, monkeypatch):
    """The split path must stay differentiable (pair branch custom_vjp
    takes the stage-1 ViewStack as a pytree argument)."""
    monkeypatch.setenv("FEATS_SPLIT", "1")
    imgs, projs = make_inputs(rng)
    model = build_model("adamvs", **tiny_kwargs("adamvs"))
    params = model.init(jax.random.PRNGKey(0), imgs, projs, DMIN, DMAX)

    def loss(p):
        out = model.apply(p, imgs, projs, DMIN, DMAX)
        return jnp.mean(out["depth"]) + jnp.mean(
            out["stage1"]["pair_results"])

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
