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


def _upsample2_axis(x: jax.Array, axis: int):
    """2x bilinear along one axis, align_corners=False, gather-free.

    The source pattern is periodic with period 2 — out[2i] = 0.25*x[i-1] +
    0.75*x[i], out[2i+1] = 0.75*x[i] + 0.25*x[i+1] (borders clamped) — so it
    lowers to shifted slices + an interleave reshape. On v5e the generic
    jnp.take form was 13.7 ms/step of UNext b512 (28% of the model, gathers
    are NOT turned into dynamic-slices by XLA); this form is bytes-bound.
    Product/sum ordering matches the gather path bit-for-bit."""
    from jax import lax

    lo = jnp.concatenate(
        [lax.slice_in_dim(x, 0, 1, axis=axis),
         lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)], axis=axis
    )
    hi = jnp.concatenate(
        [lax.slice_in_dim(x, 1, None, axis=axis),
         lax.slice_in_dim(x, x.shape[axis] - 1, None, axis=axis)], axis=axis
    )
    c1 = jnp.asarray(0.25, x.dtype)
    c3 = jnp.asarray(0.75, x.dtype)
    even = lo * c1 + x * c3
    odd = x * c3 + hi * c1
    y = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return y.reshape(shape)


def _resize_axis(x: jax.Array, axis: int, out_size: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if not align_corners and out_size == 2 * in_size:
        return _upsample2_axis(x, axis)
    lo, hi, frac = _axis_weights(in_size, out_size, align_corners)
    a = jnp.take(x, lo, axis=axis)
    b = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape).astype(x.dtype)
    return a * (1 - frac) + b * frac


def _upsample2_hw(x: jax.Array):
    """Exact-2x bilinear as a depthwise lhs-dilated conv.

    Replicate-pad by 1, depthwise conv with the separable 4-tap bilinear
    kernel on the 2x-dilated input, crop 2 — XLA's conv emitter handles the
    interleaving internally. Measured v5e b512: 1.6 vs 7.9 ms (56^2 c16)
    and 6.4 vs 11.1 ms (112^2 c16) against the phase+unpack form, and
    bit-identical output (the 1.0/0.25/0.75 taps and zero terms are exact).
    """
    from jax import lax

    c = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    t = jnp.asarray([0.25, 0.75, 0.75, 0.25], x.dtype)
    k = (t[:, None] * t[None, :])[:, :, None, None] * jnp.ones(
        (1, 1, 1, c), x.dtype
    )
    y = lax.conv_general_dilated(
        xp, k, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return y[:, 2:-2, 2:-2, :]


def _upsample2_phases(x: jax.Array):
    """Fused 2x-both-axes bilinear (align_corners=False), gather-free,
    returned as the four phase blocks on channels (= the s2d frame of the
    output; see upsample2_to_frame).

    One replicate-pad, four 4-tap phase maps (a single XLA fusion) —
    instead of two sequential per-axis passes each with their own
    shifted-copy materializations. Accumulation order differs from the
    separable two-pass form by one rounding (products fused), within 1e-7
    of the torch oracle in fp32."""
    from jax import lax

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    h, w = x.shape[1], x.shape[2]

    def sl(di, dj):
        return lax.slice(
            xp, (0, 1 + di, 1 + dj, 0),
            (xp.shape[0], 1 + di + h, 1 + dj + w, xp.shape[3]),
        )

    c11 = jnp.asarray(0.0625, x.dtype)   # 0.25*0.25
    c13 = jnp.asarray(0.1875, x.dtype)   # 0.25*0.75
    c33 = jnp.asarray(0.5625, x.dtype)   # 0.75*0.75
    xmm, xm0, xm1 = sl(-1, -1), sl(-1, 0), sl(-1, 1)
    x0m, x00, x01 = sl(0, -1), sl(0, 0), sl(0, 1)
    x1m, x10, x11 = sl(1, -1), sl(1, 0), sl(1, 1)
    ee = c11 * xmm + c13 * xm0 + c13 * x0m + c33 * x00
    eo = c13 * xm0 + c11 * xm1 + c33 * x00 + c13 * x01
    oe = c13 * x0m + c33 * x00 + c11 * x1m + c13 * x10
    oo = c33 * x00 + c13 * x01 + c13 * x10 + c11 * x11
    return jnp.concatenate([ee, eo, oe, oo], axis=-1)


def upsample2_to_frame(x: jax.Array) -> jax.Array:
    """2x bilinear upsample emitted AS an s2d frame (ops/s2d.py layout).

    The four interpolation phases of an exact-2x bilinear upsample are
    precisely the four position blocks of the output's space-to-depth frame,
    so a consumer that works in the frame (conv1x1/conv3x3/elementwise) can
    skip the interleave relayout entirely: (B,H,W,C) -> (B,H,W,4C) with
    s2d.unpack(result) == upsample_bilinear_2x(x)."""
    return _upsample2_phases(x)


def resize_bilinear(
    x: jax.Array, out_hw: tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Bilinear resize of NHWC tensor to (H', W')."""
    if (not align_corners and out_hw[0] == 2 * x.shape[1]
            and out_hw[1] == 2 * x.shape[2]):
        return _upsample2_hw(x)
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
