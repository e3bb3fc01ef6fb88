"""Capture a jax.profiler device trace of the flagship AdaMVS forward at
the bench operating point (bf16 + both Pallas kernels), then feed the
output dir to scripts/trace_breakdown.py. Runs on the real chip; the
axon relay supports profiling (verified round 2)."""
import os, sys, glob
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from __graft_entry__ import _example_inputs
from deep3d_aerial_tpu.models import build_model
from deep3d_aerial_tpu.utils.profiling import profile_fn

m = build_model("adamvs", ndepths=(48, 32, 8), num_depth=384,
                dtype=jnp.bfloat16, warp_impl="pallas", red_impl="pallas",
                plane_chunk=8, depth_shards=1)
imgs, rel = _example_inputs(V=5, H=384, W=512)
params = jax.jit(m.init)(jax.random.PRNGKey(0), imgs, rel, 80.0, 120.0)
step = jax.jit(lambda p, i, r: m.apply(p, i, r, 80.0, 120.0)["depth"])
dt, _ = profile_fn(step, params, imgs, rel, warmup=3, iters=3,
                   trace_dir="/tmp/trace_out")
print("mean s/iter:", dt)
print(glob.glob("/tmp/trace_out/**/*", recursive=True)[:10])
