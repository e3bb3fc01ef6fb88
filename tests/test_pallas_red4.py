"""Parity tests for the fused RedStep4 (msrednet) regularizer kernel
(ops/pallas_red4) against the flax oracle (models/cost_reg.RedStep4).

Runs in interpret mode on CPU; the real-Mosaic compile + perf check
happens on the chip (scripts/microbench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import flatten_util

from deep3d_aerial_tpu.models.cost_reg import RedStep4
from deep3d_aerial_tpu.ops.pallas_red4 import (
    red_step4_fused,
    red_step4_ok,
    red_step4_reference,
)

H, W = 32, 64


def make_case(rng, Cin, dtype=jnp.float32, h=H, w=W):
    mod = RedStep4(dtype=dtype)
    cost = jnp.asarray(rng.standard_normal((h, w, Cin)), jnp.float32)
    states_hwc = mod.init_states(h, w)
    params = mod.init(jax.random.PRNGKey(0), cost, *states_hwc)["params"]
    states = [jnp.asarray(
        rng.standard_normal((c, h >> l, w >> l)) * 0.5, jnp.float32)
        for l, c in enumerate((8, 16, 32, 64))]
    return params, cost, states


@pytest.mark.parametrize("Cin", [8, 16, 32])
def test_red_step4_matches_flax(rng, Cin):
    params, cost, states = make_case(rng, Cin)
    outs = red_step4_fused(params, cost, *states,
                           precision="f32x3", interpret=True)
    refs = red_step4_reference(params, cost, *states, dtype=jnp.float32)
    names = ("score", "s1", "s2", "s3", "s4")
    for name, a, b in zip(names, outs, refs):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4,
            err_msg=f"mismatch in {name}")


def test_red_step4_nonsquare(rng):
    """Rectangular plane + the level widths going narrow (W/8 = 12)."""
    params, cost, states = make_case(rng, 8, h=48, w=96)
    outs = red_step4_fused(params, cost, *states,
                           precision="f32x3", interpret=True)
    refs = red_step4_reference(params, cost, *states, dtype=jnp.float32)
    for a, b in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_red_step4_chained_planes(rng):
    """States chained across planes stay in parity (the real call
    pattern: one kernel invocation per depth plane)."""
    params, cost, states = make_case(rng, 8)
    f = list(states)
    r = list(states)
    for _ in range(3):
        c = jnp.asarray(np.random.default_rng(3).standard_normal((H, W, 8)),
                        jnp.float32)
        fo = red_step4_fused(params, c, *f, precision="f32x3",
                             interpret=True)
        ro = red_step4_reference(params, c, *r, dtype=jnp.float32)
        f, r = list(fo[1:]), list(ro[1:])
        np.testing.assert_allclose(np.asarray(fo[0]), np.asarray(ro[0]),
                                   atol=2e-4, rtol=3e-4)
    for a, b in zip(f, r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=3e-4)


def test_red_step4_grads_match_flax(rng):
    """The custom VJP (flax backward) gives the oracle's gradients."""
    params, cost, states = make_case(rng, 8)

    def loss_fused(p, c):
        outs = red_step4_fused(p, c, *states, precision="f32x3",
                               interpret=True)
        return sum(jnp.sum(o * o) for o in outs)

    def loss_ref(p, c):
        outs = red_step4_reference(p, c, *states, dtype=jnp.float32)
        return sum(jnp.sum(o * o) for o in outs)

    gf = jax.grad(loss_fused, argnums=(0, 1))(params, cost)
    gr = jax.grad(loss_ref, argnums=(0, 1))(params, cost)
    fp, _ = flatten_util.ravel_pytree(gf[0])
    rp, _ = flatten_util.ravel_pytree(gr[0])
    np.testing.assert_allclose(np.asarray(fp), np.asarray(rp),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               atol=2e-3, rtol=2e-3)


def test_red_step4_ok_gate():
    assert red_step4_ok(384, 512, 8, jnp.bfloat16)
    assert red_step4_ok(96, 128, 32, jnp.float32)
    assert not red_step4_ok(40, 64, 8)        # H % 16
    assert not red_step4_ok(1856, 2752, 8)    # full-res: over VMEM tier


@pytest.mark.parametrize("shards", [1, 2])
def test_streaming_sweep_red4_matches_flax(rng, monkeypatch, shards):
    """msrednet's streaming recurrence with the fused RedStep4 kernel
    (interpret mode) == the flax path: the production call pattern
    (variance cost, nn.scan over plane chunks, CF states, optional
    blocked-depth axis -> unrolled kernel calls)."""
    import flax.linen as nn

    from deep3d_aerial_tpu.models.cascade import streaming_sweep
    from tests.test_pallas_sweep import _mv_scene

    monkeypatch.setenv("PALLAS_INTERPRET", "1")
    h, w, V, D = 32, 64, 3, 8
    ref, srcs, rels, _, _ = _mv_scene(rng, h, w, V=V)
    depths = jnp.broadcast_to(
        jnp.linspace(96.0, 104.0, D)[:, None, None], (D, h, w))

    class _Sweep(nn.Module):
        impl: str

        @nn.compact
        def __call__(self, depths, ref, srcs, rels):
            reg = RedStep4(dtype=jnp.float32, impl=self.impl,
                           interpret=True, name="red")
            return streaming_sweep(
                reg=reg, cost_mode="variance", up=False, depths=depths,
                ref_feat=ref, src_feats=srcs, rel_projs=rels, weights=None,
                plane_chunk=4, depth_shards=shards, warp_impl="xla")

    oracle = _Sweep(impl="flax")
    params = oracle.init(jax.random.PRNGKey(0), depths, ref, srcs, rels)
    d_ref, c_ref = oracle.apply(params, depths, ref, srcs, rels)
    d_k, c_k = _Sweep(impl="pallas").apply(params, depths, ref, srcs, rels)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_ref),
                               atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref),
                               atol=1e-4, rtol=1e-3)


def test_module_pallas_impl_matches_flax(rng):
    """cost_reg.RedStep4(impl='pallas') == impl='flax' modulo layout, in
    interpret mode — the module-level integration (state layouts, param
    reuse, fallback shapes)."""
    Cin = 8
    pall = RedStep4(impl="pallas", interpret=True)
    flax_m = RedStep4()
    cost = jnp.asarray(rng.standard_normal((H, W, Cin)), jnp.float32)
    s_cf = pall.init_states(H, W)
    s_hwc = flax_m.init_states(H, W)
    params = flax_m.init(jax.random.PRNGKey(1), cost, *s_hwc)
    outs = pall.apply(params, cost, *s_cf)
    refs = flax_m.apply(params, cost, *s_hwc)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(refs[0]),
                               atol=5e-5, rtol=1e-4)
    for a, b in zip(outs[1:], refs[1:]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(jnp.transpose(b, (2, 0, 1))),
            atol=5e-5, rtol=1e-4)
