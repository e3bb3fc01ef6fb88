"""Component-level timing of the AdaMVS inference path on the real chip.

Decomposes the bench operating point (5 views, 48/32/8 cascade, H x W)
into its compute components and times each with the same data-dependent
chain methodology as bench.py (the only honest clock through the axon
relay — see docs/PERF.md).

Usage:  python scripts/microbench.py [component ...]
Env:    MB_H, MB_W (default 384x512), MB_DTYPE (float32|bfloat16),
        MB_UNROLL (scan unroll), MB_LONG (chain length)
Prints one JSON line per component: {"name", "ms", ...}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def chain_time(step, fetch, args, n_short=1, n_long=4, reps=2):
    """step(feedback, *args) -> (out, scalar_feedback); returns s/iter."""
    import jax.numpy as jnp

    def run(n):
        fb = jnp.float32(0.0)
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out, fb = step(fb, *args)
        _ = float(fetch(out))
        return time.perf_counter() - t0

    run(1); run(1)  # compile + warm
    ts = min(run(n_short) for _ in range(reps))
    tl = min(run(n_long) for _ in range(reps))
    return max((tl - ts) / (n_long - n_short), 1e-9)


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deep3d_aerial_tpu.models.cost_reg import CostRegNet2D, RedStep2
    from deep3d_aerial_tpu.models.feature_net import FeatureNet
    from deep3d_aerial_tpu.models.cascade import (
        correlation_cost_plane, streaming_sweep,
    )
    from deep3d_aerial_tpu.ops.warp import plane_sweep_warp_single

    H = int(os.environ.get("MB_H", "384"))
    W = int(os.environ.get("MB_W", "512"))
    n_long = int(os.environ.get("MB_LONG", "4"))
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        os.environ.get("MB_DTYPE", "float32")
    ]
    V = 5
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # stage shapes (AdaMVS: 1/4, 1/2, 1/1 resolution; 4b/2b/b channels, b=8)
    S = {
        1: (H // 4, W // 4, 32, 48),
        2: (H // 2, W // 2, 16, 32),
        3: (H, W, 8, 8),
    }

    def rnd(*shape, dt=None):
        return jnp.asarray(rng.standard_normal(shape), dt or dtype)

    # TRUE aerial-geometry relative projections (same construction as
    # __graft_entry__._example_inputs / bench.py): random-rotation-jitter
    # matrices are NOT rotations — their footprints blow past the pallas
    # kernel windows, so isolated sweeps silently fell back to the gather
    # path and reported gather-path times (round-2 microbench bug)
    from deep3d_aerial_tpu.geometry.camera import (Pose, proj_matrix,
                                                   stage_relative_projections)

    K_cam = np.array([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1.0]])
    rng_g = np.random.default_rng(1)
    projs = []
    for _v in range(V):
        R_down = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
        center = np.array([rng_g.uniform(-8, 8), rng_g.uniform(-8, 8), 100.0])
        projs.append(proj_matrix(K_cam, Pose(R_down, -R_down @ center)))
    REL = stage_relative_projections(np.stack(projs), 3)  # [3, V-1, 4, 4]

    def rel_mats(stage):
        """[V-1, 4, 4] source-vs-ref mats at stage resolution (1: /4 ...)."""
        return jnp.asarray(REL[stage - 1], jnp.float32)

    results = {}
    want = set(sys.argv[1:])

    def bench(name, make):
        if want and name not in want:
            return
        step, fetch, args = make()
        dt = chain_time(step, fetch, args, n_long=n_long)
        results[name] = dt * 1e3
        print(json.dumps({"name": name, "ms": round(dt * 1e3, 2)}), flush=True)

    # ---- features: 5 views full pyramid -------------------------------
    def mk_feat():
        model = nn.vmap(FeatureNet, in_axes=0, out_axes=0,
                        variable_axes={"params": None},
                        split_rngs={"params": False})(
            base_channels=8, arch="branch", norm="group", dtype=dtype)
        imgs = rnd(V, H, W, 3, dt=jnp.float32)
        params = jax.jit(model.init)(key, imgs)

        @jax.jit
        def step(fb, imgs):
            o = model.apply(params, imgs + fb)
            return o[0], jnp.float32(jnp.mean(o[0][0, 0, 0, :]) * 1e-12)

        return step, jax.jit(lambda o: o[0, 0, 0, 0]), (imgs,)

    bench("features", mk_feat)

    # ---- stage1 pair branch: warp+corr volume + 2D reg, x4 views ------
    def mk_pair():
        h, w, c, d = S[1]
        reg = CostRegNet2D(norm="group", dtype=dtype)
        vol0 = rnd(h, w, d)
        params = jax.jit(reg.init)(key, vol0)
        src = rnd(4, h, w, c)
        ref = rnd(h, w, c)
        rels = rel_mats(1)
        depths = jnp.linspace(80.0, 120.0, d)

        @jax.jit
        def step(fb, src, ref, rels):
            def one_view(sf, r):
                def corr_plane(dp):
                    wp = plane_sweep_warp_single(sf, r, dp, (h, w))
                    return (wp * ref).mean(-1)
                corr = jax.lax.map(
                    corr_plane,
                    jnp.broadcast_to(depths[:, None, None] + fb, (d, h, w)))
                return reg.apply(params, jnp.transpose(corr, (1, 2, 0)))
            scores = jax.vmap(one_view)(src, rels)
            return scores, jnp.float32(jnp.mean(scores) * 1e-12)

        return step, jax.jit(lambda o: o[0, 0, 0, 0]), (src, ref, rels)

    bench("pair_branch", mk_pair)

    # ---- pair branch as the model runs it: pallas corr volumes + vmapped
    # 2D hourglass (adamvs.pair_corr_volumes + _PairBranch) --------------
    def mk_pair_pallas():
        from deep3d_aerial_tpu.models.adamvs import (_PairBranch,
                                                     pair_corr_volumes)

        h, w, c, d = S[1]
        f1 = rnd(V, h, w, c)
        rels = rel_mats(1)
        depths = jnp.linspace(80.0, 120.0, d)

        class Pair(nn.Module):
            @nn.compact
            def __call__(self, f1, rels):
                corr = pair_corr_volumes(f1, rels, depths,
                                         warp_impl="pallas")
                VmapPair = nn.vmap(
                    _PairBranch, in_axes=(0, None), out_axes=0,
                    variable_axes={"params": None},
                    split_rngs={"params": False})
                return VmapPair(norm="group", dtype=dtype, name="pair")(
                    corr, depths)

        model = Pair()
        params = jax.jit(model.init)(key, f1, rels)

        @jax.jit
        def step(fb, f1, rels):
            conf, pd = model.apply(params, f1 + fb, rels)
            return conf, jnp.float32(jnp.mean(pd) * 1e-12)

        return step, jax.jit(lambda o: o[0, 0, 0]), (f1, rels)

    bench("pair_branch_pallas", mk_pair_pallas)

    # ---- the 2D hourglass alone (4 views, vmapped shared params) -------
    def mk_pair_reg():
        h, w, c, d = S[1]
        reg = nn.vmap(CostRegNet2D, in_axes=0, out_axes=0,
                      variable_axes={"params": None},
                      split_rngs={"params": False})(norm="group", dtype=dtype)
        vols = rnd(4, h, w, d)
        params = jax.jit(reg.init)(key, vols)

        @jax.jit
        def step(fb, vols):
            o = reg.apply(params, vols + fb)
            return o, jnp.float32(jnp.mean(o) * 1e-12)

        return step, jax.jit(lambda o: o[0, 0, 0, 0]), (vols,)

    bench("pair_reg2d", mk_pair_reg)

    # ---- warp-only: the gathers at each stage -------------------------
    def mk_warp(stage, chunk=1):
        h, w, c, d = S[stage]

        def make():
            src = rnd(4, h, w, c)
            rels = rel_mats(stage)
            depths = jnp.linspace(80.0, 120.0, d)

            @jax.jit
            def step(fb, src, rels):
                def plane(dp):
                    warped = jax.vmap(
                        lambda sf, r: plane_sweep_warp_single(sf, r, dp, (h, w))
                    )(src, rels)
                    return warped.sum(0)
                acc = jax.lax.map(
                    lambda dp: plane(dp),
                    jnp.broadcast_to(depths[:, None, None] + fb, (d, h, w)),
                    batch_size=min(chunk, d))
                o = acc.sum(0)
                return o, jnp.float32(jnp.mean(o) * 1e-12)

            return step, jax.jit(lambda o: o[0, 0, 0]), (src, rels)

        return make

    for s in (1, 2, 3):
        bench(f"warp_s{s}", mk_warp(s))
    for s in (1, 2, 3):
        bench(f"warp_s{s}_c8", mk_warp(s, chunk=8))

    # ---- recurrent sweeps (cost build + RedStep2 + online softmax) ----
    def mk_sweep(stage, warp_impl="xla", red_impl="flax", windowed=False):
        h, w, c, d = S[stage]

        def make():
            up = stage < 3
            reg = RedStep2(up=up, dtype=dtype)
            ref = rnd(h, w, c)
            src = rnd(4, h, w, c)
            rels = rel_mats(stage)
            weights = jnp.ones((4, h, w), jnp.float32)
            if windowed:
                # per-pixel depth windows like the REAL stage-2/3 handoff
                # (a smooth center map): the pallas kernel's window origins
                # become per-tile dynamic — measures the cost the
                # broadcast-linspace variant hides
                from deep3d_aerial_tpu.ops.depth_samplers import (
                    window_depth_samples)

                yy, xx = np.meshgrid(np.linspace(-1, 1, h),
                                     np.linspace(-1, 1, w), indexing="ij")
                center = jnp.asarray(100.0 + 6.0 * (yy + 0.5 * xx),
                                     jnp.float32)
                depths = window_depth_samples(center, d, 40.0 / d)
            else:
                depths = jnp.linspace(80.0, 120.0, d)

            class Sweep(nn.Module):
                @nn.compact
                def __call__(self, ref, src, rels, weights, depths):
                    r = RedStep2(up=up, dtype=dtype, impl=red_impl,
                                 name="red")
                    return streaming_sweep(
                        reg=r, cost_mode="correlation", up=up, depths=depths,
                        ref_feat=ref, src_feats=src, rel_projs=rels,
                        weights=weights, init_states=r.init_states(h, w),
                        warp_impl=warp_impl)

            model = Sweep()
            params = jax.jit(model.init)(key, ref, src, rels, weights, depths)

            @jax.jit
            def step(fb, ref, src, rels, weights):
                depth, conf = model.apply(params, ref + fb, src, rels,
                                          weights, depths)
                return depth, jnp.float32(jnp.mean(depth) * 1e-12)

            return step, jax.jit(lambda o: o[0, 0]), (ref, src, rels, weights)

        return make

    for s in (1, 2, 3):
        bench(f"sweep_s{s}", mk_sweep(s))
    for s in (1, 2, 3):
        bench(f"sweep_s{s}_pallas", mk_sweep(s, warp_impl="pallas"))
    for s in (1, 2, 3):
        bench(f"sweep_s{s}_full",
              mk_sweep(s, warp_impl="pallas", red_impl="pallas"))
    for s in (2, 3):
        bench(f"sweep_s{s}_full_win",
              mk_sweep(s, warp_impl="pallas", red_impl="pallas",
                       windowed=True))

    # ---- RedStep2-only chain (no warp): isolates the GRU cost ---------
    def mk_red(stage, red_impl="flax"):
        h, w, c, d = S[stage]

        def make():
            up = stage < 3
            costs = rnd(d, h, w, c)

            class RedChain(nn.Module):
                @nn.compact
                def __call__(self, costs):
                    r = RedStep2(up=up, dtype=dtype, impl=red_impl,
                                 name="red")
                    states = r.init_states(h, w)

                    ScanRed = nn.scan(
                        _Step, variable_broadcast="params",
                        split_rngs={"params": False},
                        in_axes=0, out_axes=0)
                    (_, out), scores = ScanRed(up=up)(
                        (states, jnp.float32(0)), costs)
                    return scores

            class _Step(nn.Module):
                up: bool

                @nn.compact
                def __call__(self, carry, cost):
                    states, acc = carry
                    r = RedStep2(up=self.up, dtype=dtype, impl=red_impl,
                                 name="red")
                    out = r(cost, *states)
                    score, new_states = out[0], tuple(out[1:])
                    return (new_states, acc + jnp.mean(score)), score.sum()

            model = RedChain()
            params = jax.jit(model.init)(key, costs)

            @jax.jit
            def step(fb, costs):
                s = model.apply(params, costs + fb)
                return s, jnp.float32(jnp.mean(s) * 1e-12)

            return step, jax.jit(lambda o: o[0]), (costs,)

        return make

    for s in (1, 2, 3):
        bench(f"red_s{s}", mk_red(s))
    for s in (1, 2, 3):
        bench(f"red_s{s}_pallas", mk_red(s, red_impl="pallas"))

    # ---- RedStep4 chain (msrednet regularizer) -------------------------
    def mk_red4(stage, red_impl="flax"):
        from deep3d_aerial_tpu.models.cost_reg import RedStep4

        h, w, c, d = S[stage]

        def make():
            costs = rnd(d, h, w, c)

            class _Step4(nn.Module):
                @nn.compact
                def __call__(self, carry, cost):
                    states, acc = carry
                    r = RedStep4(dtype=dtype, impl=red_impl, name="red")
                    out = r(cost, *states)
                    return ((tuple(out[1:]), acc + jnp.mean(out[0])),
                            out[0].sum())

            class Red4Chain(nn.Module):
                @nn.compact
                def __call__(self, costs):
                    r = RedStep4(dtype=dtype, impl=red_impl, name="red")
                    states = r.init_states(h, w)
                    ScanRed = nn.scan(
                        _Step4, variable_broadcast="params",
                        split_rngs={"params": False},
                        in_axes=0, out_axes=0)
                    (_, out), scores = ScanRed()(
                        (states, jnp.float32(0)), costs)
                    return scores

            model = Red4Chain()
            params = jax.jit(model.init)(key, costs)

            @jax.jit
            def step(fb, costs):
                s = model.apply(params, costs + fb)
                return s, jnp.float32(jnp.mean(s) * 1e-12)

            return step, jax.jit(lambda o: o[0]), (costs,)

        return make

    if os.environ.get("MB_RED4", "0") == "1":
        for s in (1, 2, 3):
            bench(f"red4_s{s}", mk_red4(s))
        for s in (1, 2, 3):
            bench(f"red4_s{s}_pallas", mk_red4(s, red_impl="pallas"))

    total = sum(results.values())
    print(json.dumps({"name": "TOTAL_ms", "ms": round(total, 2),
                      "H": H, "W": W,
                      "dtype": os.environ.get("MB_DTYPE", "float32")}))


if __name__ == "__main__":
    main()
