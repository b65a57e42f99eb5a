"""Pooling / nearest-resampling ops, NHWC, TPU-first.

All window sizes used by the reference models are powers of two that divide
the spatial dims exactly (224/256 inputs), so pooling is implemented as
reshape+reduce — pure VPU work that XLA fuses freely — with a
`lax.reduce_window` fallback for non-divisible shapes.

Reference semantics being reproduced (see /root/reference):
  * torch.nn.AvgPool2d(s) / MaxPool2d(s): kernel=s, stride=s, no padding
    (ACC_UNet/ACC_UNet.py:90-133, 360-361, 552).
  * torch.nn.Upsample(scale_factor=s) default mode='nearest'
    (ACC_UNet/ACC_UNet.py:90, 360).
  * HANC concat along dim=2 then .view back to channels — which interleaves
    the (2k-1) pyramid variants *per input channel*
    (ACC_UNet/ACC_UNet.py:87-138).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pool_reshape(x: jax.Array, s: int, reducer) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s, c)
    return reducer(x, axis=(2, 4))


def avg_pool2d(x: jax.Array, s: int) -> jax.Array:
    """AvgPool kernel=s stride=s (NHWC)."""
    if s == 1:
        return x
    b, h, w, c = x.shape
    if h % s == 0 and w % s == 0:
        return _pool_reshape(x, s, jnp.mean)
    out = lax.reduce_window(x, 0.0, lax.add, (1, s, s, 1), (1, s, s, 1), "VALID")
    return out / float(s * s)


def max_pool2d(x: jax.Array, s: int) -> jax.Array:
    """MaxPool kernel=s stride=s (NHWC)."""
    if s == 1:
        return x
    b, h, w, c = x.shape
    if h % s == 0 and w % s == 0:
        return _pool_reshape(x, s, jnp.max)
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, s, s, 1), (1, s, s, 1), "VALID"
    )


def upsample_nearest(x: jax.Array, s: int) -> jax.Array:
    """Nearest-neighbour upsample by integer factor s (NHWC).

    Matches torch.nn.Upsample(scale_factor=s, mode='nearest') for integer s.
    """
    if s == 1:
        return x
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, s, w, s, c))
    return x.reshape(b, h * s, w * s, c)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool2d(1) then squeeze: (B,H,W,C) -> (B,C)."""
    return jnp.mean(x, axis=(1, 2))


def hanc_features(x: jax.Array, k: int) -> jax.Array:
    """Hierarchical Aggregation of Neighborhood Context feature stack.

    For k>=2 builds [x, up(avg_2^i(x)), up(max_2^i(x)) for i=1..k-1] and
    interleaves them per channel, returning (B, H, W, C*(2k-1)) where channel
    c*(2k-1)+j holds variant j of input channel c in the order
    [identity, avg2, avg4, ..., max2, max4, ...].

    This reproduces exactly the reference's concat-on-H-then-view trick
    (ACC_UNet/ACC_UNet.py:87-138): torch concatenates the (2k-1) maps along
    the H axis of an NCHW tensor and views the result back as
    (B, (2k-1)*C, H, W), which is the same per-channel interleaving.
    """
    if k == 1:
        return x
    variants = [x]
    for i in range(1, k):
        variants.append(upsample_nearest(avg_pool2d(x, 2 ** i), 2 ** i))
    for i in range(1, k):
        variants.append(upsample_nearest(max_pool2d(x, 2 ** i), 2 ** i))
    b, h, w, c = x.shape
    stacked = jnp.stack(variants, axis=-1)  # (B,H,W,C,2k-1)
    return stacked.reshape(b, h, w, c * (2 * k - 1))


def interleave_channels(a: jax.Array, b: jax.Array) -> jax.Array:
    """Channel-interleave two NHWC tensors: out[..., 2c]=a[...,c], 2c+1=b.

    Reproduces the reference MLFC merge `torch.cat([x_c, x], dim=2).view(...)`
    (ACC_UNet/ACC_UNet.py:492-516).
    """
    bb, h, w, c = a.shape
    return jnp.stack([a, b], axis=-1).reshape(bb, h, w, 2 * c)
