"""End-to-end tests of the prepared-operand / channel-first kernel handoff.

With PALLAS_INTERPRET=1 the EXACT production graph runs on CPU: prepared
sweep operands (padded + pre-transposed outside the scan), the fused sweep
kernel emitting channel-first cost at the RedStep2 buffer width, and the
fused RedStep2 kernel consuming it with zero relayouts (docs/PERF.md
round-3 lever). The oracle is the identical-math XLA gather + flax path.

Reference semantics under test: the AdaMVS streaming recurrence
(/root/reference/mvs/mvs_cas/models/adamvs.py:492-529).
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep3d_aerial_tpu.models.cascade import streaming_sweep
from deep3d_aerial_tpu.models.cost_reg import RedStep2
from tests.test_pallas_sweep import _mv_scene

H, W, V, D = 32, 160, 3, 8  # W unaligned: pads to 256 (= red pad_width)


class _Sweep(nn.Module):
    impl: str            # RedStep2 impl: 'flax' | 'pallas'
    warp_impl: str       # 'xla' | 'pallas'
    up: bool = True
    depth_shards: int = 1

    @nn.compact
    def __call__(self, depths, ref, srcs, rels, weights):
        reg = RedStep2(up=self.up, dtype=jnp.float32, impl=self.impl,
                       interpret=True, name="red")
        return streaming_sweep(
            reg=reg, cost_mode="correlation", up=self.up, depths=depths,
            ref_feat=ref, src_feats=srcs, rel_projs=rels, weights=weights,
            plane_chunk=4, depth_shards=self.depth_shards,
            warp_impl=self.warp_impl)


def _scene(rng):
    ref, srcs, rels, _, weights = _mv_scene(rng, H, W, V=V)
    depths = jnp.broadcast_to(
        jnp.linspace(96.0, 104.0, D)[:, None, None], (D, H, W))
    return ref, srcs, rels, depths, weights


def test_sweep_strict_matches_cond_path(rng, monkeypatch):
    """SWEEP_STRICT=1 (no in-graph gather fallback — the full-res HBM
    lever, cascade._sweep_strict) is bit-identical to the cond path when
    coverage holds, and NaN-poisons the outputs when it cannot."""
    monkeypatch.setenv("PALLAS_INTERPRET", "1")
    ref, srcs, rels, depths, weights = _scene(rng)
    mod = _Sweep(impl="flax", warp_impl="pallas")
    params = mod.init(jax.random.PRNGKey(0), depths, ref, srcs, rels,
                      weights)
    d0, c0 = mod.apply(params, depths, ref, srcs, rels, weights)
    monkeypatch.setenv("SWEEP_STRICT", "1")
    d1, c1 = mod.apply(params, depths, ref, srcs, rels, weights)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    # coverage failure -> NaN-poisoned output (coverage is hard to break
    # with real geometry — off-image footprints are trivially covered —
    # so force the flag)
    import deep3d_aerial_tpu.ops.pallas_sweep as ps
    from deep3d_aerial_tpu.models import cascade

    real = ps.sweep_cost_chunk_pallas

    def uncovered(*a, **kw):
        cost, _ = real(*a, **kw)
        return cost, jnp.bool_(False)

    monkeypatch.setattr(cascade, "sweep_cost_chunk_pallas", uncovered,
                        raising=False)
    monkeypatch.setattr(ps, "sweep_cost_chunk_pallas", uncovered)
    db, _ = mod.apply(params, depths, ref, srcs, rels, weights)
    assert np.isnan(np.asarray(db)).any()


@pytest.mark.parametrize("shards", [1, 2])
def test_handoff_matches_xla_flax(rng, monkeypatch, shards):
    monkeypatch.setenv("PALLAS_INTERPRET", "1")
    monkeypatch.setenv("SWEEP_PREPARED", "1")  # A/B path under test
    ref, srcs, rels, depths, weights = _scene(rng)
    oracle_mod = _Sweep(impl="flax", warp_impl="xla", depth_shards=shards)
    params = oracle_mod.init(jax.random.PRNGKey(0), depths, ref, srcs,
                             rels, weights)
    d_ref, c_ref = oracle_mod.apply(params, depths, ref, srcs, rels, weights)

    fused_mod = _Sweep(impl="pallas", warp_impl="pallas",
                       depth_shards=shards)
    d_f, c_f = fused_mod.apply(params, depths, ref, srcs, rels, weights)

    assert d_f.shape == d_ref.shape == (2 * H, 2 * W)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_ref),
                               rtol=1e-3, atol=1e-4)


def test_handoff_gradients_match(rng, monkeypatch):
    """The composed custom VJPs (sweep-cost kernel + RedStep2 kernel) give
    the same parameter gradients as the pure XLA/flax formulation."""
    monkeypatch.setenv("PALLAS_INTERPRET", "1")
    monkeypatch.setenv("SWEEP_PREPARED", "1")  # A/B path under test
    ref, srcs, rels, depths, weights = _scene(rng)
    oracle_mod = _Sweep(impl="flax", warp_impl="xla")
    params = oracle_mod.init(jax.random.PRNGKey(0), depths, ref, srcs,
                             rels, weights)
    fused_mod = _Sweep(impl="pallas", warp_impl="pallas")

    def loss(mod):
        def f(p):
            d, c = mod.apply(p, depths, ref, srcs, rels, weights)
            return jnp.mean(d * d) + jnp.mean(c)
        return f

    g_ref = jax.grad(loss(oracle_mod))(params)
    g_f = jax.grad(loss(fused_mod))(params)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_f = jax.tree_util.tree_leaves(g_f)
    assert len(flat_ref) == len(flat_f)
    for a, b in zip(flat_ref, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


def test_casmvsnet_variance_kernel_matches_gather(rng, monkeypatch):
    """The volume-model kernel path (cascade._variance_volume_pallas,
    mode='variance') matches the gather build through the WHOLE CasMVSNet
    forward (reference variance aggregation, cas_mvsnet.py:45-60)."""
    monkeypatch.setenv("PALLAS_INTERPRET", "1")
    import numpy as _np

    from __graft_entry__ import _example_inputs
    from deep3d_aerial_tpu.models import build_model

    imgs, rel = _example_inputs(V=3, H=64, W=128)
    m_x = build_model("casmvsnet", ndepths=(8, 8, 8), num_depth=32,
                      warp_impl="xla")
    params = jax.jit(m_x.init)(jax.random.PRNGKey(0), imgs, rel, 80.0, 120.0)
    out_x = m_x.apply(params, imgs, rel, 80.0, 120.0)

    m_p = build_model("casmvsnet", ndepths=(8, 8, 8), num_depth=32,
                      warp_impl="pallas")
    out_p = m_p.apply(params, imgs, rel, 80.0, 120.0)

    _np.testing.assert_allclose(_np.asarray(out_p["depth"]),
                                _np.asarray(out_x["depth"]),
                                rtol=1e-4, atol=1e-4)
