"""Parity tests for the strip-tiled channel-first conv kernels
(ops/pallas_cf_conv) and the tier-2 tiled RedStep4 composition built on
them (ops/pallas_red4.red_step4_tiled) — the full-res msrednet path.

Interpret mode on CPU; the real-Mosaic compile happens on-chip
(scripts/microbench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3d_aerial_tpu.models.cost_reg import RedStep4
from deep3d_aerial_tpu.ops.pallas_cf_conv import cf_conv3x3
from deep3d_aerial_tpu.ops.pallas_red4 import (
    red_step4_reference,
    red_step4_tiled,
    red_step4_tiled_ok,
)


def _oracle(x, K, b, mode):
    xh = jnp.transpose(x, (1, 2, 0))[None].astype(jnp.float32)
    dn = ("NHWC", "HWIO", "NHWC")
    if mode == "same":
        o = jax.lax.conv_general_dilated(xh, K, (1, 1), "SAME",
                                         dimension_numbers=dn)
    elif mode == "down":
        o = jax.lax.conv_general_dilated(xh, K, (2, 2), "SAME",
                                         dimension_numbers=dn)
    else:
        o = jax.lax.conv_transpose(xh, K, (2, 2), "SAME",
                                   dimension_numbers=dn)
    return jnp.transpose(o[0] + b, (2, 0, 1))


@pytest.mark.parametrize("mode", ["same", "down", "up"])
@pytest.mark.parametrize("Ci,Co", [(8, 16), (16, 8)])
def test_cf_conv_matches_lax(rng, mode, Ci, Co):
    H, W = 32, 64
    x = jnp.asarray(rng.standard_normal((Ci, H, W)), jnp.float32)
    K = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Co,)) * 0.1, jnp.float32)
    got = cf_conv3x3(x, K, b, mode=mode, relu=False, img_h=H,
                     precision="f32x3", interpret=True)
    ref = _oracle(x, K, b, mode)
    np.testing.assert_allclose(
        np.asarray(got[:, :ref.shape[1], :]), np.asarray(ref),
        atol=2e-4, rtol=1e-4)


def test_cf_conv_relu_and_row_mask(rng):
    """img_h < Hp: pad rows must leave zero (the GN-glue invariant), and
    the conv at row img_h-1 must see zeros below (SAME edge semantics)."""
    Ci, Co, H, Hp, W = 8, 8, 24, 32, 64
    x = np.zeros((Ci, Hp, W), np.float32)
    x[:, :H, :] = rng.standard_normal((Ci, H, W))
    x = jnp.asarray(x)
    K = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Co,)), jnp.float32)
    got = cf_conv3x3(x, K, b, mode="same", relu=True, img_h=H,
                     precision="f32x3", interpret=True)
    ref = jnp.maximum(_oracle(x[:, :H, :], K, b, "same"), 0.0)
    np.testing.assert_allclose(np.asarray(got[:, :H, :]), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
    assert float(jnp.max(jnp.abs(got[:, H:, :]))) == 0.0


@pytest.mark.parametrize("mode", ["same", "down", "up"])
def test_cf_conv_column_slabs(rng, mode):
    """W > slab runs as overlapping column slabs; the stitched result
    must equal the single-slab kernel (slab width covers the image)."""
    Ci, Co, H, W = 8, 8, 32, 160
    x = jnp.asarray(rng.standard_normal((Ci, H, W)), jnp.float32)
    K = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Co,)), jnp.float32)
    kw = dict(mode=mode, relu=False, img_h=H, precision="f32x3",
              interpret=True)
    got = cf_conv3x3(x, K, b, slab=96, **kw)
    ref = _oracle(x, K, b, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def _red4_case(rng, H, W, Cin=8):
    mod = RedStep4(dtype=jnp.float32)
    cost = jnp.asarray(rng.standard_normal((H, W, Cin)), jnp.float32)
    s_hwc = mod.init_states(H, W)
    params = mod.init(jax.random.PRNGKey(0), cost, *s_hwc)["params"]
    states = [jnp.asarray(
        rng.standard_normal((c, H >> l, W >> l)) * 0.5, jnp.float32)
        for l, c in enumerate((8, 16, 32, 64))]
    return params, cost, states


@pytest.mark.parametrize("H,W", [(32, 64), (40, 72)])
def test_red_step4_tiled_matches_flax(rng, H, W):
    """Tier-2 composition == flax oracle, including non-16-multiple
    heights (the row-padding invariant end to end)."""
    assert red_step4_tiled_ok(H, W, 8)
    params, cost, states = _red4_case(rng, H, W)
    outs = red_step4_tiled(params, cost, *states,
                           precision="f32x3", interpret=True)
    refs = red_step4_reference(params, cost, *states, dtype=jnp.float32)
    for name, a, b in zip(("score", "s1", "s2", "s3", "s4"), outs, refs):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
            err_msg=f"mismatch in {name}")


def test_red_step4_tiled_grads(rng):
    """Tier-2 custom VJP (flax backward) == oracle gradients."""
    from jax import flatten_util

    params, cost, states = _red4_case(rng, 32, 64)

    def loss(fn, p, c):
        outs = fn(p, c)
        return sum(jnp.sum(o * o) for o in outs)

    gf = jax.grad(lambda p, c: loss(
        lambda pp, cc: red_step4_tiled(pp, cc, *states, precision="f32x3",
                                       interpret=True), p, c),
        argnums=(0, 1))(params, cost)
    gr = jax.grad(lambda p, c: loss(
        lambda pp, cc: red_step4_reference(pp, cc, *states,
                                           dtype=jnp.float32), p, c),
        argnums=(0, 1))(params, cost)
    fp, _ = flatten_util.ravel_pytree(gf[0])
    rp, _ = flatten_util.ravel_pytree(gr[0])
    np.testing.assert_allclose(np.asarray(fp), np.asarray(rp),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               atol=2e-3, rtol=2e-3)


def test_red_step4_tiled_gate():
    assert red_step4_tiled_ok(1856, 2752, 8)   # the production point
    assert red_step4_tiled_ok(464, 688, 8)
    assert not red_step4_tiled_ok(30, 64, 8)   # H % 8
    assert not red_step4_tiled_ok(16, 16, 8)   # below floor


def test_module_selects_tiled(rng, monkeypatch):
    """RedStep4(impl='pallas') falls through to the tiled kernel when
    the whole-plane tier declines, and still matches flax."""
    import deep3d_aerial_tpu.ops.pallas_red4 as red4

    monkeypatch.setattr(red4, "red_step4_ok", lambda *a, **k: False)
    H, W, Cin = 32, 64, 8
    pall = RedStep4(impl="pallas", interpret=True)
    flax_m = RedStep4()
    cost = jnp.asarray(rng.standard_normal((H, W, Cin)), jnp.float32)
    s_cf = pall.init_states(H, W)
    s_hwc = flax_m.init_states(H, W)
    params = flax_m.init(jax.random.PRNGKey(1), cost, *s_hwc)
    outs = pall.apply(params, cost, *s_cf)
    refs = flax_m.apply(params, cost, *s_hwc)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(refs[0]),
                               atol=1e-4, rtol=1e-4)
    for a, b in zip(outs[1:], refs[1:]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(jnp.transpose(b, (2, 0, 1))),
            atol=1e-4, rtol=1e-4)
