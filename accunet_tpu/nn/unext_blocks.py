"""UNeXt tokenized-MLP building blocks (flax.linen, NHWC).

Parity targets (/root/reference/Experiments/nets/UNext.py):
  * axial shift — pad 2, chunk channels into 5 torch-style, roll each chunk
    by −2..+2 along H (then W), crop back (:78-109). With |shift| ≤ pad the
    circular roll over the padded tensor is exactly a zero-filled shift, so
    it is implemented here as static pad+slice (cheap, fusable).
  * shiftmlp — shift_H → fc1 → 3x3 depthwise conv → GELU → shift_W → fc2
    (:38-113)
  * shiftedBlock — x + mlp(LayerNorm(x)) (:117-147; drop_path=0 in the zoo)
  * DWConv tokens→NHWC→3x3 dw conv→tokens (:150-161)
  * OverlapPatchEmbed — k3 s2 p1 conv + LayerNorm over tokens (:163-203)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _torch_chunk_sizes(c: int, n: int) -> list[int]:
    """torch.chunk semantics: ceil(c/n) per chunk, remainder in the last."""
    size = -(-c // n)
    sizes = []
    left = c
    while left > 0:
        take = min(size, left)
        sizes.append(take)
        left -= take
    while len(sizes) < n:
        sizes.append(0)
    return sizes


def axial_shift(x: jax.Array, axis: int, shift_size: int = 5) -> jax.Array:
    """Zero-filled per-chunk shifts along `axis` (1=H, 2=W for NHWC).

    A per-chunk spatial shift is a depthwise conv with a one-hot kernel —
    one clean XLA op instead of shift_size misaligned lane slices + a lane
    concat (which cost 3.7 ms/step in UNext b512's dblock2_0 alone on v5e).
    Bit-exact: multiplying by the 1.0 tap and summing zero taps is the
    identity, and conv 'SAME' zero-padding matches the zero fill."""
    import numpy as np
    from jax import lax

    pad = shift_size // 2
    c = x.shape[-1]
    sizes = _torch_chunk_sizes(c, shift_size)
    onehot = np.zeros((shift_size, 1, 1, c), np.float32)
    start = 0
    for size, s in zip(sizes, range(-pad, pad + 1)):
        # out[i] = x[i - s]: cross-correlation tap index k = pad - s
        onehot[pad - s, 0, 0, start:start + size] = 1.0
        start += size
    k = jnp.asarray(onehot, x.dtype)
    if axis == 2:
        k = k.transpose(1, 0, 2, 3)
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


class DWConv(nn.Module):
    """3x3 depthwise conv applied to a token sequence (B,N,C) via (B,H,W,C)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, H: int, W: int):
        from accunet_tpu.nn.acc_blocks import DepthwiseConv

        b, n, c = x.shape
        y = x.reshape(b, H, W, c)
        # custom-VJP depthwise (ops/pallas/dwconv2d): identical forward and
        # param layout to nn.Conv(feature_group_count=c), but the backward
        # avoids XLA's pathological depthwise weight-gradient
        y = DepthwiseConv(self.dim, 3, self.dtype, name="dwconv")(y)
        return y.reshape(b, H * W, self.dim)


class ShiftMLP(nn.Module):
    hidden_features: int
    out_features: int
    shift_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, H: int, W: int, train: bool = False):
        b, n, c = x.shape
        xs = axial_shift(x.reshape(b, H, W, c), axis=1, shift_size=self.shift_size)
        x = xs.reshape(b, H * W, c)
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = DWConv(self.hidden_features, self.dtype, name="dwconv")(x, H, W)
        x = jax.nn.gelu(x, approximate=False)
        h = x.shape[-1]
        xs = axial_shift(x.reshape(b, H, W, h), axis=2, shift_size=self.shift_size)
        x = xs.reshape(b, H * W, h)
        return nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)


class ShiftedBlock(nn.Module):
    dim: int
    mlp_ratio: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, H: int, W: int, train: bool = False):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = ShiftMLP(
            int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp"
        )(y, H, W, train)
        return x + y


class OverlapPatchEmbed(nn.Module):
    embed_dim: int
    patch_size: int = 3
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size // 2
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            dtype=self.dtype,
            name="proj",
        )(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x, h, w
