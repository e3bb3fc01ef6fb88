"""On-chip parity: column-slab tiled RedStep2 (pallas_red.red_step2_tiled)
vs the single-call fused kernel (already oracle-validated on-chip) at a
width where both apply, on real Mosaic. Then a full-res-width tiled run
(no single-call possible) checked against itself across slab widths —
slab choice must not change the result.

Usage: python scripts/check_red_tiled.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deep3d_aerial_tpu.models.cost_reg import RedStep2
    from deep3d_aerial_tpu.ops.pallas_red import (
        pad_width, red_step2_fused, red_step2_tiled,
    )

    rng = np.random.default_rng(0)
    ok = True

    def case(H, W, Cin, up, slab, ref_fn_name):
        nonlocal ok
        mod = RedStep2(up=up, dtype=jnp.float32)
        cost = jnp.asarray(rng.standard_normal((H, W, Cin)), jnp.float32)
        s1h, s2h = mod.init_states(H, W)
        params = mod.init(jax.random.PRNGKey(0), cost, s1h, s2h)["params"]
        Wp = pad_width(W)
        s1 = np.zeros((8, H, Wp), np.float32)
        s1[..., :W] = rng.standard_normal((8, H, W)) * 0.5
        s2 = np.zeros((16, H // 2, Wp // 2), np.float32)
        s2[..., : W // 2] = rng.standard_normal((16, H // 2, W // 2)) * 0.5
        s1, s2 = jnp.asarray(s1), jnp.asarray(s2)
        kw = dict(up=up, precision="f32x3")
        a = jax.jit(lambda c, x, y: red_step2_tiled(
            params, c, x, y, slab=slab, **kw))(cost, s1, s2)
        if ref_fn_name == "single":
            b = jax.jit(lambda c, x, y: red_step2_fused(
                params, c, x, y, **kw))(cost, s1, s2)
        else:  # tiled at a different slab width
            b = jax.jit(lambda c, x, y: red_step2_tiled(
                params, c, x, y, slab=256, **kw))(cost, s1, s2)
        names = ("score", "s1n", "s2n")
        for n, x, y in zip(names, a, b):
            d = float(jnp.max(jnp.abs(x.astype(jnp.float32)
                                      - y.astype(jnp.float32))))
            line = (f"H={H} W={W} Cin={Cin} up={up} slab={slab} "
                    f"vs {ref_fn_name}: {n} maxdiff={d:.2e}")
            print(line, flush=True)
            if d > 1e-4:
                ok = False

    # tiled(256) vs single-call at W=440 (pad 512; 2 slabs, clamped edges)
    case(64, 440, 8, True, 256, "single")
    case(64, 440, 16, False, 256, "single")
    # full-res stage-3 width: tiled(512) vs tiled(256) — slab-invariance
    case(64, 2752, 8, True, 512, "tiled256")

    print("OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
