"""On-chip parity + timing for the fused RedStep4 kernel (ops/pallas_red4)
vs a TRUE-CPU flax oracle.

JAX_PLATFORMS=cpu does NOT give CPU in this container (the axon plugin
overrides it and 'reference' convs run on the MXU — docs/PERF.md parity
trap), so the oracle is computed in a separate env-stripped subprocess
(.npz handoff) and compared in the chip process.

Usage:  python scripts/check_red4.py            # full: oracle + chip
        python scripts/check_red4.py --oracle   # (internal) oracle phase
Env:    R4_H, R4_W, R4_CIN (default 384 512 8), R4_PREC (f32x3),
        R4_IMPL=fused|tiled (tier-1 whole-plane vs tier-2 strip/slab
        composition — the full-res msrednet path)
"""

import os
import subprocess
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

H = int(os.environ.get("R4_H", "384"))
W = int(os.environ.get("R4_W", "512"))
CIN = int(os.environ.get("R4_CIN", "8"))
PREC = os.environ.get("R4_PREC", "f32x3")
IMPL = os.environ.get("R4_IMPL", "fused")
NPZ = f"/tmp/red4_oracle_{H}x{W}x{CIN}.npz"


def make_case():
    rng = np.random.default_rng(7)
    cost = rng.standard_normal((H, W, CIN)).astype(np.float32)
    states = [rng.standard_normal((c, H >> l, W >> l)).astype(np.float32)
              * 0.5 for l, c in enumerate((8, 16, 32, 64))]
    return cost, states


def oracle():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as _xb

    for name in list(getattr(_xb, "_backend_factories", {})):
        if "axon" in name:
            _xb._backend_factories.pop(name, None)
    assert jax.default_backend() == "cpu", jax.default_backend()
    import jax.numpy as jnp

    from deep3d_aerial_tpu.models.cost_reg import RedStep4
    from deep3d_aerial_tpu.ops.pallas_red4 import red_step4_reference

    cost, states = make_case()
    mod = RedStep4(dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(cost),
                      *mod.init_states(H, W))["params"]
    outs = red_step4_reference(params, jnp.asarray(cost),
                               *map(jnp.asarray, states), dtype=jnp.float32)
    import pickle

    np.savez(NPZ, **{f"out{i}": np.asarray(o) for i, o in enumerate(outs)})
    with open(NPZ + ".params", "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)
    print("[oracle] wrote", NPZ)


def chip():
    import pickle
    import time

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from deep3d_aerial_tpu.ops.pallas_red4 import (
        red_step4_fused,
        red_step4_tiled,
    )

    data = np.load(NPZ)
    with open(NPZ + ".params", "rb") as f:
        params = pickle.load(f)
    cost, states = make_case()
    impl = red_step4_tiled if IMPL == "tiled" else red_step4_fused
    fn = jax.jit(lambda c, *s: impl(
        params, c, *s, precision=PREC))
    outs = fn(jnp.asarray(cost), *map(jnp.asarray, states))
    ok = True
    for i, name in enumerate(("score", "s1", "s2", "s3", "s4")):
        a = np.asarray(outs[i], np.float32)
        b = data[f"out{i}"]
        d = float(np.max(np.abs(a - b)))
        print(f"[chip] {name}: maxdiff {d:.3e}")
        ok &= d < (5e-5 if PREC == "f32x3" else 3e-2)

    # timing: chained kernel invocations (state feedback), relay-honest
    def chain(n):
        s = [jnp.asarray(x) for x in states]
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(jnp.asarray(cost), *s)
            s = list(out[1:])
        _ = float(out[0][0, 0])
        return time.perf_counter() - t0

    chain(1); chain(1)
    t1 = min(chain(1) for _ in range(2))
    t4 = min(chain(4) for _ in range(2))
    ms = (t4 - t1) / 3 * 1e3
    print(f"[chip] {IMPL} red4 step @ {H}x{W} Cin={CIN}: {ms:.2f} ms/plane")
    print("PARITY OK" if ok else "PARITY FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if "--oracle" in sys.argv:
        oracle()
    elif os.path.exists(NPZ):
        chip()
    else:
        env = {k: v for k, v in os.environ.items()
               if k != "PALLAS_AXON_POOL_IPS"}
        env["JAX_PLATFORMS"] = "cpu"
        subprocess.run([sys.executable, __file__, "--oracle"], env=env,
                       check=True)
        chip()
