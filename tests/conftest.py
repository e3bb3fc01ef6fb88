"""Test env: force a pure-CPU JAX with 8 virtual devices.

The container's sitecustomize registers a remote-TPU PJRT plugin in every
python process when PALLAS_AXON_POOL_IPS is set, and that plugin overrides
JAX_PLATFORMS=cpu (jax.devices() still returns the TPU). Tests must NOT
touch the single shared TPU chip (slow remote compiles, exclusive claims),
so if the plugin env is present we re-exec pytest once with it stripped.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The sitecustomize-registered remote-TPU ("axon") PJRT plugin overrides
# JAX_PLATFORMS=cpu. Drop its backend factory before any backend initializes
# so tests run on the pure in-process CPU backend and never claim the chip.
try:  # noqa: E402
    import jax

    # jax was already imported by sitecustomize with JAX_PLATFORMS=axon in the
    # env, so the config snapshot must be updated, not just os.environ.
    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as _xb

    for _name in list(getattr(_xb, "_backend_factories", {})):
        if "axon" in _name:
            _xb._backend_factories.pop(_name, None)
except Exception:  # pragma: no cover - plugin absent in clean envs
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from deep3d_aerial_tpu.geometry.camera import Camera, Pose  # noqa: E402


def _n_memory_maps() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # pragma: no cover - non-Linux
        return 0


# The round-4 suite-order SIGSEGV/SIGABRT in test_pallas_red (rc=134 at
# ~69%, green in isolation): every XLA:CPU executable pins ~13+ mmap
# regions of JIT'd code (interpret-mode Pallas programs pin far more),
# the suite compiles hundreds of unique programs, and the process runs
# into vm.max_map_count (65530 here) — the NEXT big compile's mmap
# fails inside backend_compile_and_load and LLVM aborts. Crash point is
# whichever large compile crosses the line, hence "order-dependent".
# jax.clear_caches() provably releases the maps (probe: 1236 -> 518
# after 60 compiles). Guard: clear the cache whenever headroom shrinks.
_MAP_GUARD_THRESHOLD = 20_000


@pytest.fixture(autouse=True)
def _mmap_guard():
    yield
    if _n_memory_maps() > _MAP_GUARD_THRESHOLD:
        import gc

        import jax

        jax.clear_caches()
        gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_pose(rng, dist=100.0):
    """A camera ~`dist` above the origin looking mostly downward."""
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(0, 0.3)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    R_jitter = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
    # canonical: camera z looks toward -z world (down), x right, y toward -y
    R_down = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    R_cw = R_jitter @ R_down
    center = np.array([rng.uniform(-5, 5), rng.uniform(-5, 5), dist])
    return Pose(R_cw, -R_cw @ center)


def toy_camera(width=64, height=48, f=80.0):
    return Camera(
        camera_id=1, width=width, height=height,
        fx=f, fy=f, cx=width / 2.0, cy=height / 2.0,
    )
