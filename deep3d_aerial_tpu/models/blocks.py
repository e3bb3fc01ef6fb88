"""Flax building blocks for the cascade MVS networks (NHWC / NDHWC layouts).

Functional re-design of the reference torch modules
(/root/reference/mvs/mvs_cas/models/module.py): conv ± norm ± relu in 2D/3D,
exact-2x transposed convs, the ConvGRU cell used by the recurrent cost
regularizers, and the fused upsample-merge block.

Norm layers default to GroupNorm (groups = C//8, reference ConvGnReLU
module.py:317-325): identical behavior in train and eval, no cross-device
batch statistics to synchronize — the TPU-native choice. BatchNorm can be
selected via `norm='batch'` for strict-parity experiments.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _norm_layer(norm: str, dtype) -> Optional[Callable]:
    if norm == "group":
        return lambda c: nn.GroupNorm(num_groups=max(1, c // 8), dtype=dtype)
    if norm == "layer":
        return lambda c: nn.LayerNorm(dtype=dtype)
    if norm == "batch":
        # inference-style BN (running stats folded); use_running_average fixed
        return lambda c: nn.BatchNorm(use_running_average=True, dtype=dtype)
    if norm == "none":
        return None
    raise ValueError(f"unknown norm {norm!r}")


class ConvBlock(nn.Module):
    """Conv (any rank) + optional norm + optional relu."""

    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    norm: str = "group"
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = (self.kernel,) * self.ndim
        s = (self.stride,) * self.ndim
        norm = _norm_layer(self.norm, self.dtype)
        x = nn.Conv(
            self.features, k, strides=s, padding="SAME",
            use_bias=(norm is None), dtype=self.dtype,
        )(x)
        if norm is not None:
            x = norm(self.features)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DeconvBlock(nn.Module):
    """Exact-2x (or stride-1) transposed conv + optional norm + relu."""

    features: int
    kernel: int = 3
    stride: int = 2
    relu: bool = True
    norm: str = "group"
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = (self.kernel,) * self.ndim
        s = (self.stride,) * self.ndim
        norm = _norm_layer(self.norm, self.dtype)
        x = nn.ConvTranspose(
            self.features, k, strides=s, padding="SAME",
            use_bias=(norm is None), dtype=self.dtype,
        )(x)
        if norm is not None:
            x = norm(self.features)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DeconvFuse(nn.Module):
    """Upsample 2x, concat with the skip branch, fuse with a conv.

    Reference DeConv2dFuse (module.py:495-513).
    """

    features: int
    norm: str = "group"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, skip, x):
        x = DeconvBlock(self.features, norm=self.norm, dtype=self.dtype)(x)
        x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBlock(self.features, norm=self.norm, dtype=self.dtype)(x)
        return x


class ConvGRUCell(nn.Module):
    """Convolutional GRU over 2D feature maps (reference module.py:5-51).

    h' = u * h + (1 - u) * tanh(conv([x, r * h]))
    with r, u = sigmoid(conv([x, h])) split in two.
    """

    hidden: int
    kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h):
        k = (self.kernel, self.kernel)
        gates = nn.Conv(2 * self.hidden, k, padding="SAME", dtype=self.dtype,
                        name="gates")(jnp.concatenate([x, h], axis=-1))
        r, u = jnp.split(gates, 2, axis=-1)
        r = nn.sigmoid(r)
        u = nn.sigmoid(u)
        c = nn.Conv(self.hidden, k, padding="SAME", dtype=self.dtype,
                    name="cand")(jnp.concatenate([x, r * h], axis=-1))
        c = jnp.tanh(c)
        h_new = u * h + (1.0 - u) * c
        return h_new


# canonical home is the ops layer (ops.resize); re-exported here for
# existing callers
from ..ops.resize import upsample_axis_lerp as _upsample_axis_lerp  # noqa: E402


def upsample_bilinear_int(x, p: int):
    """Bilinear p-x spatial upsampling of [..., H, W, C], exactly matching
    jax.image.resize(..., method='bilinear') for integer factors (tested)
    without its layout-hostile dot_general lowering."""
    return _upsample_axis_lerp(_upsample_axis_lerp(x, p, -3), p, -2)


def upsample_nearest2x(x):
    """Nearest 2x upsampling of [..., H, W, C] — identical to
    jax.image.resize(..., method='nearest') at integer scale (floor of
    half-pixel centers = index // 2), lowered as repeats."""
    return jnp.repeat(jnp.repeat(x, 2, axis=-3), 2, axis=-2)


def avgpool_branch(x, pool: int, features: int, norm: str, dtype, name: str):
    """AvgPool(p) -> 1x1 conv -> bilinear upsample back (AdaMVS context
    branch, adamvs.py:75-97)."""
    H, W = x.shape[-3], x.shape[-2]
    y = nn.avg_pool(x, (pool, pool), strides=(pool, pool))
    y = ConvBlock(features, kernel=1, norm=norm, dtype=dtype, name=name)(y)
    if y.shape[-3] * pool == H and y.shape[-2] * pool == W:
        return upsample_bilinear_int(y, pool)
    y = jax.image.resize(y, (*y.shape[:-3], H, W, y.shape[-1]), method="bilinear")
    return y


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM cell (reference module.py:100-135): one fused
    4-gate conv over [x, h]; returns (h_new, c_new, o)."""

    hidden: int
    kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h, c):
        k = (self.kernel, self.kernel)
        gates = nn.Conv(4 * self.hidden, k, padding="SAME", dtype=self.dtype,
                        name="gates")(jnp.concatenate([x, h], axis=-1))
        ai, af, ao, ag = jnp.split(gates, 4, axis=-1)
        i = nn.sigmoid(ai)
        f = nn.sigmoid(af)
        o = nn.sigmoid(ao)
        g = jnp.tanh(ag)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new, o


class DeformConv2d(nn.Module):
    """Modulated deformable convolution v2 (reference module.py:350-448):
    a 3x3 conv whose kxk taps are shifted by learned per-pixel offsets
    (bilinear-sampled) and scaled by learned modulation masks. NHWC
    functional form: sample the k*k deformed taps, stack them into the
    channel dim, and apply the weight as a 1x1 grouped contraction —
    the gather is vectorized jnp (no per-tap python loops at trace time
    beyond the static k*k)."""

    features: int
    kernel: int = 3
    modulation: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        H, W, C = x.shape[-3:]
        k = self.kernel
        N = k * k
        off = nn.Conv(2 * N, (3, 3), padding="SAME", dtype=self.dtype,
                      kernel_init=nn.initializers.zeros,
                      name="p_conv")(x)  # [.., H, W, 2N] (dy, dx packed)
        if self.modulation:
            m = nn.sigmoid(nn.Conv(N, (3, 3), padding="SAME",
                                   dtype=self.dtype,
                                   kernel_init=nn.initializers.zeros,
                                   name="m_conv")(x))
        gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32),
                              indexing="ij")
        r = (k - 1) / 2.0
        taps = []
        for t in range(N):
            ky, kx = t // k - r, t % k - r
            py = gy + ky + off[..., t]
            px = gx + kx + off[..., N + t]
            py = jnp.clip(py, 0.0, H - 1.0)
            px = jnp.clip(px, 0.0, W - 1.0)
            y0 = jnp.floor(py)
            x0 = jnp.floor(px)
            fy = py - y0
            fx = px - x0
            y0 = y0.astype(jnp.int32)
            x0 = x0.astype(jnp.int32)
            y1 = jnp.minimum(y0 + 1, H - 1)
            x1 = jnp.minimum(x0 + 1, W - 1)
            flat = x.reshape(-1, C)

            def tap(yi, xi):
                return jnp.take(flat, (yi * W + xi).reshape(-1),
                                axis=0).reshape(H, W, C)

            v = ((1 - fy) * (1 - fx))[..., None] * tap(y0, x0) \
                + ((1 - fy) * fx)[..., None] * tap(y0, x1) \
                + (fy * (1 - fx))[..., None] * tap(y1, x0) \
                + (fy * fx)[..., None] * tap(y1, x1)
            if self.modulation:
                v = v * m[..., t:t + 1]
            taps.append(v)
        stacked = jnp.concatenate(taps, axis=-1)  # [H, W, N*C]
        # the deformable conv's kxk weight applied as 1x1 over stacked taps
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="w")(stacked)
