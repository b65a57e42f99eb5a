"""Bilinear resize with PyTorch-exact semantics, NHWC.

The reference uses both conventions:
  * `F.interpolate(..., mode='bilinear')` (align_corners=False) for 2x decoder
    upsampling (Experiments/nets/UNext.py:310-352)
  * `F.interpolate(..., size=..., mode='bilinear', align_corners=True)` for
    shape-fixup of skip tensors (UNext.py:312,327,342,348) and deep-supervision
    head upsampling (Experiments/utils.py:360-366)

Implemented as explicit gather+lerp (separable, one axis at a time) so both
conventions are bit-defined; XLA lowers the gathers to cheap dynamic-slices
for the common integer-ratio cases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_weights(in_size: int, out_size: int, align_corners: bool):
    if out_size == 1:
        src = jnp.zeros((1,), jnp.float32)
    elif align_corners:
        src = jnp.arange(out_size, dtype=jnp.float32) * (
            (in_size - 1) / (out_size - 1)
        )
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, None)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    frac = jnp.clip(src - lo.astype(jnp.float32), 0.0, 1.0)
    return lo, hi, frac


def _resize_axis(x: jax.Array, axis: int, out_size: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    lo, hi, frac = _axis_weights(in_size, out_size, align_corners)
    a = jnp.take(x, lo, axis=axis)
    b = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape).astype(x.dtype)
    return a * (1 - frac) + b * frac


def resize_bilinear(
    x: jax.Array, out_hw: tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Bilinear resize of NHWC tensor to (H', W')."""
    x = _resize_axis(x, 1, out_hw[0], align_corners)
    x = _resize_axis(x, 2, out_hw[1], align_corners)
    return x


def upsample_bilinear_2x(x: jax.Array, align_corners: bool = False) -> jax.Array:
    """F.interpolate(scale_factor=2, mode='bilinear') equivalent."""
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners)


def _cubic_weights(t, a=-0.75):
    """Keys cubic convolution kernel (torch bicubic, A=-0.75)."""
    at = jnp.abs(t)
    w1 = (a + 2) * at ** 3 - (a + 3) * at ** 2 + 1
    w2 = a * at ** 3 - 5 * a * at ** 2 + 8 * a * at - 4 * a
    return jnp.where(at <= 1, w1, jnp.where(at < 2, w2, 0.0))


def _resize_axis_cubic(x, axis, out_size, align_corners):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if align_corners and out_size > 1:
        src = jnp.arange(out_size, dtype=jnp.float32) * ((in_size - 1) / (out_size - 1))
    else:
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (in_size / out_size) - 0.5
    base = jnp.floor(src).astype(jnp.int32)
    out = None
    for k in range(-1, 3):
        idx = jnp.clip(base + k, 0, in_size - 1)
        wk = _cubic_weights(src - (base + k).astype(jnp.float32))
        shape = [1] * x.ndim
        shape[axis] = out_size
        term = jnp.take(x, idx, axis=axis) * wk.reshape(shape).astype(x.dtype)
        out = term if out is None else out + term
    return out


def resize_bicubic(
    x: jax.Array, out_hw: tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """torch F.interpolate(..., mode='bicubic') equivalent (NHWC), separable
    Keys cubic with clamped borders."""
    x = _resize_axis_cubic(x, 1, out_hw[0], align_corners)
    return _resize_axis_cubic(x, 2, out_hw[1], align_corners)
