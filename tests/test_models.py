import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep3d_aerial_tpu.geometry.camera import (
    proj_matrix,
    stage_relative_projections,
)
from deep3d_aerial_tpu.models import build_model
from deep3d_aerial_tpu.models.cascade import OnlineSoftmaxState
from deep3d_aerial_tpu.ops.depth_samplers import (
    uniform_depth_samples,
    window_depth_samples,
)
from tests.conftest import random_pose, toy_camera

V, H, W = 3, 64, 96
DMIN, DMAX = 80.0, 120.0


def make_inputs(rng):
    cam = toy_camera(width=W, height=H, f=120.0)
    imgs = jnp.asarray(rng.normal(size=(V, H, W, 3)).astype(np.float32))
    projs = []
    for v in range(V):
        pose = random_pose(rng, dist=100.0)
        projs.append(proj_matrix(cam.K, pose))
    rel = stage_relative_projections(np.stack(projs), 3)  # [3, V-1, 4, 4]
    return imgs, jnp.asarray(rel, jnp.float32)


def tiny_kwargs(name):
    # small depth counts (divisible by 8 for the 3D hourglass)
    return dict(ndepths=(16, 8, 8), num_depth=64)


@pytest.mark.parametrize("name", ["casmvsnet", "ucsnet", "msrednet", "adamvs"])
def test_model_forward_shapes(rng, name):
    imgs, projs = make_inputs(rng)
    model = build_model(name, **tiny_kwargs(name))
    params = model.init(jax.random.PRNGKey(0), imgs, projs, DMIN, DMAX)
    out = model.apply(params, imgs, projs, DMIN, DMAX)

    assert out["depth"].shape == (H, W)
    assert out["photometric_confidence"].shape == (H, W)
    d = np.array(out["depth"])
    assert np.isfinite(d).all()
    # soft-argmax depths stay within the hypothesis range
    assert d.min() >= DMIN - 25.0 and d.max() <= DMAX + 25.0
    c = np.array(out["photometric_confidence"])
    assert np.isfinite(c).all() and c.min() >= 0.0 and c.max() <= 1.0 + 1e-5
    assert "stage1" in out and "stage3" in out


@pytest.mark.parametrize("name", ["casmvsnet", "adamvs"])
def test_model_jit(rng, name):
    imgs, projs = make_inputs(rng)
    model = build_model(name, **tiny_kwargs(name))
    params = model.init(jax.random.PRNGKey(0), imgs, projs, DMIN, DMAX)
    fn = jax.jit(lambda p, i, pr: model.apply(p, i, pr, DMIN, DMAX)["depth"])
    d1 = fn(params, imgs, projs)
    d2 = fn(params, imgs, projs)
    assert np.allclose(d1, d2)


def test_adamvs_has_pair_outputs(rng):
    imgs, projs = make_inputs(rng)
    model = build_model("adamvs", **tiny_kwargs("adamvs"))
    params = model.init(jax.random.PRNGKey(0), imgs, projs, DMIN, DMAX)
    out = model.apply(params, imgs, projs, DMIN, DMAX)
    assert out["stage1"]["pair_results"].shape == (V - 1, H // 4, W // 4)
    assert out["stage1"]["pair_confidence"].shape == (V - 1, H // 4, W // 4)


def test_online_softmax_equals_batch_softmax(rng):
    """The streaming accumulator must equal an exact softmax soft-argmax."""
    D, h, w = 12, 5, 7
    scores = jnp.asarray(rng.normal(size=(D, h, w)).astype(np.float32) * 30.0)
    depths = jnp.asarray(rng.uniform(50, 150, size=(D, h, w)).astype(np.float32))

    state = OnlineSoftmaxState.init((h, w))
    for d in range(D):
        state = OnlineSoftmaxState.update(state, scores[d], depths[d])
    depth_stream, conf_stream = OnlineSoftmaxState.finalize(state)

    prob = jax.nn.softmax(scores, axis=0)
    depth_exact = jnp.sum(prob * depths, axis=0)
    conf_exact = prob.max(axis=0)

    assert np.allclose(depth_stream, depth_exact, rtol=1e-5, atol=1e-4)
    assert np.allclose(conf_stream, conf_exact, rtol=1e-5, atol=1e-6)


def test_online_softmax_no_overflow():
    """Huge scores (that would overflow raw exp, as in the reference's
    streaming loop) stay finite."""
    state = OnlineSoftmaxState.init((2, 2))
    for s in [500.0, 900.0, 100.0]:
        state = OnlineSoftmaxState.update(
            state, jnp.full((2, 2), s), jnp.full((2, 2), 100.0)
        )
    depth, conf = OnlineSoftmaxState.finalize(state)
    assert np.isfinite(depth).all() and np.isclose(depth[0, 0], 100.0)
    assert np.isfinite(conf).all()


def test_depth_samplers():
    u = uniform_depth_samples(10.0, 20.0, 11)
    assert np.allclose(u, np.linspace(10, 20, 11))

    center = jnp.full((4, 4), 100.0)
    w = window_depth_samples(center, 8, 1.0)
    assert w.shape == (8, 4, 4)
    assert np.isclose(w[0, 0, 0], 96.0) and np.isclose(w[-1, 0, 0], 104.0)
    # uniform spacing
    steps = np.diff(np.array(w[:, 0, 0]))
    assert np.allclose(steps, steps[0])


def test_cascade_refines_toward_gt(rng):
    """With a textured synthetic scene, an untrained CasMVSNet stage-1 (plain
    variance cost, identity-ish regularizer at init) should still localize
    depth roughly at the photo-consistent plane when given strong texture.
    We verify the full pipeline is at least depth-sensitive: outputs vary
    when the scene depth changes."""
    cam = toy_camera(width=W, height=H, f=120.0)
    imgs, projs = make_inputs(rng)
    model = build_model("casmvsnet", **tiny_kwargs("casmvsnet"))
    params = model.init(jax.random.PRNGKey(0), imgs, projs, DMIN, DMAX)
    out1 = model.apply(params, imgs, projs, DMIN, DMAX)["depth"]
    out2 = model.apply(params, imgs, projs, DMIN + 15.0, DMAX + 15.0)["depth"]
    assert not np.allclose(out1, out2, atol=0.5)


def test_window_confidence_matches_naive(rng):
    """4-window probability-sum confidence vs a direct per-pixel loop
    (reference head, cas_mvsnet.py:72-76)."""
    from deep3d_aerial_tpu.models.cascade import window_confidence

    D, h, w = 10, 6, 7
    scores = rng.normal(size=(D, h, w)).astype(np.float32)
    prob = np.exp(scores) / np.exp(scores).sum(0, keepdims=True)
    out = np.asarray(window_confidence(jnp.asarray(prob)))

    padded = np.pad(prob, ((1, 2), (0, 0), (0, 0)))
    for y in range(h):
        for x in range(w):
            idx = int(np.clip((prob[:, y, x] * np.arange(D)).sum(), 0, D - 1))
            expected = padded[idx:idx + 4, y, x].sum()
            assert np.isclose(out[y, x], expected, atol=1e-5), (y, x)


def test_convlstm_cell_gates(rng):
    """ConvLSTM parity block (reference module.py:100-135)."""
    import jax
    import jax.numpy as jnp

    from deep3d_aerial_tpu.models.blocks import ConvLSTMCell

    H, W, C = 8, 8, 4
    cell = ConvLSTMCell(hidden=C)
    x = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    h = jnp.zeros((H, W, C))
    c = jnp.zeros((H, W, C))
    params = cell.init(jax.random.PRNGKey(0), x, h, c)
    h1, c1, o = cell.apply(params, x, h, c)
    assert h1.shape == c1.shape == o.shape == (H, W, C)
    # |h| <= |tanh(c)| * sigmoid in (0, 1)
    assert np.all(np.abs(np.asarray(h1)) <= np.abs(np.tanh(np.asarray(c1))) + 1e-6)
    # recurrent state evolves
    h2, c2, _ = cell.apply(params, x, h1, c1)
    assert not np.allclose(np.asarray(h1), np.asarray(h2))


def test_deform_conv_zero_offsets_match_plain(rng):
    """With zero-initialized offset/mask convs, DeformConv2d at init is a
    plain 3x3 conv with sigmoid(0)=0.5 modulation (reference
    module.py:350-448 behavior)."""
    import jax
    import jax.numpy as jnp

    from deep3d_aerial_tpu.models.blocks import DeformConv2d

    H, W, C = 10, 12, 3
    x = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    mod = DeformConv2d(features=5)
    params = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(params, x)
    assert y.shape == (H, W, 5)

    # manual check: taps = shifted clones of x * 0.5 contracted by w
    w = np.asarray(params["params"]["w"]["kernel"])[0, 0]  # [9C, 5]
    b = np.asarray(params["params"]["w"]["bias"])
    taps = []
    xp = np.asarray(x)
    for t in range(9):
        ky, kx = t // 3 - 1, t % 3 - 1
        gy = np.clip(np.arange(H)[:, None] + ky, 0, H - 1)
        gx = np.clip(np.arange(W)[None, :] + kx, 0, W - 1)
        taps.append(xp[gy, gx] * 0.5)
    stacked = np.concatenate(taps, -1)
    expect = stacked @ w + b
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4, atol=1e-5)


def test_window_confidence_matches_reference_numerics(rng):
    """Numeric parity with the reference confidence head
    (cas_mvsnet.py:72-76): 4 * avg_pool3d(pad(prob, (1,2)), (4,1,1))
    gathered at the TRUNCATED expected depth index."""
    import jax.numpy as jnp

    from deep3d_aerial_tpu.models.cascade import window_confidence

    D, Hh, Ww = 16, 6, 7
    logits = rng.standard_normal((D, Hh, Ww)).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(0, keepdims=True)

    # reference computation in numpy
    padded = np.concatenate(
        [np.zeros((1, Hh, Ww), np.float32), prob,
         np.zeros((2, Hh, Ww), np.float32)], 0)
    sum4 = np.stack([padded[i:i + 4].sum(0) for i in range(D)])
    idx = (prob * np.arange(D, dtype=np.float32)[:, None, None]).sum(0)
    idx = np.clip(idx.astype(np.int64), 0, D - 1)  # torch .long() truncates
    expect = np.take_along_axis(sum4, idx[None], axis=0)[0]

    ours = np.asarray(window_confidence(jnp.asarray(prob)))
    np.testing.assert_allclose(ours, expect, rtol=1e-5, atol=1e-6)


def test_window_confidence_matches_reference_torch_oracle(rng):
    """Numeric parity of the confidence head with the reference's exact
    torch formulation (cas_mvsnet.py:72-76): 4*avg_pool3d over D padded
    (1,2), expected-index truncated to long, clamped, gathered."""
    import torch
    import torch.nn.functional as F

    from deep3d_aerial_tpu.models.cascade import window_confidence

    D, H, W = 16, 7, 9
    scores = rng.normal(size=(D, H, W)).astype(np.float32) * 3
    prob = np.exp(scores) / np.exp(scores).sum(0, keepdims=True)

    pv = torch.from_numpy(prob)[None]  # [1, D, H, W]
    sum4 = 4 * F.avg_pool3d(
        F.pad(pv.unsqueeze(1), pad=(0, 0, 0, 0, 1, 2)),
        (4, 1, 1), stride=1, padding=0).squeeze(1)
    idx = (pv * torch.arange(D, dtype=torch.float32)[None, :, None, None]
           ).sum(1).long().clamp(0, D - 1)
    expect = torch.gather(sum4, 1, idx.unsqueeze(1)).squeeze(1)[0].numpy()

    got = np.asarray(window_confidence(jnp.asarray(prob)))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("p,h,w,c", [(2, 5, 7, 3), (4, 6, 5, 8), (8, 4, 4, 2)])
def test_upsample_bilinear_int_matches_resize(rng, p, h, w, c):
    """The phase-decomposed lerp upsampler (layout-friendly replacement
    for jax.image.resize in the feature net — docs/PERF.md) is EXACT vs
    jax.image.resize bilinear at integer factors, including edges and
    leading batch dims."""
    from deep3d_aerial_tpu.models.blocks import (
        upsample_bilinear_int,
        upsample_nearest2x,
    )

    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    got = upsample_bilinear_int(x, p)
    want = jax.image.resize(x, (2, h * p, w * p, c), method="bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-6)
    got_n = upsample_nearest2x(x)
    want_n = jax.image.resize(x, (2, h * 2, w * 2, c), method="nearest")
    np.testing.assert_array_equal(np.asarray(got_n), np.asarray(want_n))


@pytest.mark.parametrize("shape,target", [
    ((6, 8), (12, 16)),     # 2x lerp path
    ((6, 8), (24, 32)),     # 4x lerp path
    ((6, 8), (6, 8)),       # identity path
    ((7, 9), (13, 15)),     # non-integer -> jax.image.resize fallback
    ((5, 6, 8), (12, 16)),  # leading plane-stack dim (the in-scan dvs case)
])
def test_resize_bilinear_fast_paths_match_resize(rng, shape, target):
    """ops.depth_samplers.resize_bilinear routes identity / integer-factor
    upsamples through the layout-friendly slice-lerp (used for the
    inter-stage depth/weight handoffs and the in-scan depth-value
    upsample) — must match jax.image.resize bilinear exactly."""
    from deep3d_aerial_tpu.ops.depth_samplers import resize_bilinear

    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    got = resize_bilinear(x, target)
    want = jax.image.resize(x, x.shape[:-2] + target, method="bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-6)
