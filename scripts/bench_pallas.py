"""On-chip A/B: pallas sweep-corr kernel vs XLA gather at AdaMVS stage
shapes. Chain timing (docs/PERF.md). Usage:
    python scripts/bench_pallas.py [s1 s2 s3] [--check]
Env: MB_H/MB_W bench frame size (default 384x512), MB_LONG chain length.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deep3d_aerial_tpu.ops.pallas_sweep import (
        sweep_corr_chunk_pallas, sweep_corr_chunk_reference,
    )

    H = int(os.environ.get("MB_H", "384"))
    W = int(os.environ.get("MB_W", "512"))
    n_long = int(os.environ.get("MB_LONG", "4"))
    check = "--check" in sys.argv
    want = {a for a in sys.argv[1:] if not a.startswith("-")}

    # AdaMVS stage shapes: (h, w, C, D, chunk)
    stages = {
        "s1": (H // 4, W // 4, 32, 48, 8),
        "s2": (H // 2, W // 2, 16, 32, 8),
        "s3": (H, W, 8, 8, 8),
    }
    rng = np.random.default_rng(0)

    def rel_mat():
        # gentle MVS-pair relative projection (overlap-selected views):
        # near-identity rotation block, moderate disparity, near-unit pz row
        m = np.eye(4)
        m[:2, :3] += rng.normal(0, 3e-4, (2, 3))
        m[2, :2] = rng.normal(0, 1e-6, 2)
        m[0, 3] = rng.normal(0, 200)  # ~2 px disparity at d~100
        m[1, 3] = rng.normal(0, 100)
        return jnp.asarray(m, jnp.float32)

    def chain_time(step, fetch, args):
        def run(n):
            fb = jnp.float32(0.0)
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out, fb = step(fb, *args)
            _ = float(fetch(out))
            return time.perf_counter() - t0
        run(1); run(1)
        ts = min(run(1) for _ in range(2))
        tl = min(run(n_long) for _ in range(2))
        return max((tl - ts) / (n_long - 1), 1e-9)

    for name, (h, w, c, d, K) in stages.items():
        if want and name not in want:
            continue
        ref = jnp.asarray(rng.standard_normal((h, w, c)), jnp.float32)
        src = jnp.asarray(rng.standard_normal((h, w, c)), jnp.float32)
        rel = rel_mat()
        base = 100.0 + 2.0 * jnp.sin(
            jnp.arange(h)[:, None] * 0.05 + jnp.arange(w)[None, :] * 0.03)
        # narrow refinement-style windows around base
        planes = jnp.stack(
            [base + 0.25 * (i - d / 2) for i in range(d)]).astype(jnp.float32)
        chunks = planes.reshape(d // K, K, h, w)

        @jax.jit
        def pallas_step(fb, ref, src, rel, chunks):
            def one_chunk(dc):
                corr, cov = sweep_corr_chunk_pallas(
                    ref, src, rel, dc + fb, tile=(8, 128),
                    window=(32, 256) if w > 128 else (32, 128))
                return corr, cov
            corrs, covs = jax.lax.map(one_chunk, chunks)
            o = corrs.reshape(-1, *corrs.shape[2:])  # [d, h, w]
            return (o, covs), jnp.float32(jnp.mean(o) * 1e-12)

        @jax.jit
        def xla_step(fb, ref, src, rel, planes):
            corr = sweep_corr_chunk_reference(ref, src, rel, planes + fb)
            return corr, jnp.float32(jnp.mean(corr) * 1e-12)

        if check:
            (corr_p, covs), _ = pallas_step(
                jnp.float32(0), ref, src, rel, chunks)
            corr_x, _ = xla_step(jnp.float32(0), ref, src, rel, planes)
            corr_p = np.asarray(corr_p).reshape(d, h, w)
            corr_x = np.asarray(corr_x).reshape(d, h, w)
            err = np.abs(corr_p - corr_x)
            print(json.dumps({
                "name": f"{name}_check", "covered": bool(np.all(covs)),
                "maxdiff": float(err.max()),
                "p999": float(np.quantile(err, 0.999)),
                "frac_gt_1e3": float((err > 1e-3).mean())}), flush=True)

        tp = chain_time(pallas_step, jax.jit(lambda o: o[0][0, 0, 0]),
                        (ref, src, rel, chunks))
        tx = chain_time(xla_step, jax.jit(lambda o: o[0, 0, 0]),
                        (ref, src, rel, planes))
        print(json.dumps({
            "name": name, "pallas_ms": round(tp * 1e3, 2),
            "xla_ms": round(tx * 1e3, 2),
            "speedup": round(tx / tp, 2)}), flush=True)


if __name__ == "__main__":
    main()
