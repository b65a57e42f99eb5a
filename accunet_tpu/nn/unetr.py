"""UNETR decoder blocks — the three load-bearing modules from the vendored
MONAI tree (SURVEY.md §2.7), rebuilt 2D-NHWC.

Parity targets:
  * UnetResBlock — conv→IN→lrelu ×2 with 1x1(+IN) residual when shape
    changes (monai/networks/blocks/dynunet_block.py:25-113)
  * UnetrBasicBlock — wrapper over UnetResBlock (unetr_block.py:209-263)
  * UnetrUpBlock — transposed-conv upsample + concat skip + UnetResBlock
    (unetr_block.py:22-88); the SegMamba family always uses
    upsample_kernel_size=(1,2,2) i.e. a pure H/W 2x upsample
  * UnetOutBlock — 1x1 conv head (dynunet_block.py:247)

Design note: every Conv3d in the reference SegMamba stack uses kernel
(1,k,k) / stride (1,2,2) on a depth-1 volume (the 2D wrapper unsqueezes a
fake depth axis, flagship :1323-1325), so these blocks are implemented as 2D
NHWC ops — identical math, no wasted depth dimension. Instance norm is
per-sample/per-channel over H,W without affine params (torch InstanceNorm2d
defaults, which MONAI's "instance" factory uses).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.models.acc_unet import ConvTranspose2x2

Dtype = Any


def instance_norm(x, eps=1e-5):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = ((x - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def lrelu(x):
    return jax.nn.leaky_relu(x, 0.01)


class UnetResBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # all three convs are bias-free: MONAI's get_conv_layer defaults to
        # bias=False (dynunet_block.py:279) and UnetResBlock doesn't override
        k = self.kernel_size
        out = nn.Conv(
            self.out_channels, (k, k), strides=(self.stride, self.stride),
            padding="SAME", use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        out = lrelu(instance_norm(out))
        out = nn.Conv(
            self.out_channels, (k, k), padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        out = instance_norm(out)
        residual = x
        if self.in_channels != self.out_channels or self.stride != 1:
            residual = nn.Conv(
                self.out_channels, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="conv3",
            )(residual)
            residual = instance_norm(residual)
        return lrelu(out + residual)


class UnetrBasicBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return UnetResBlock(
            self.in_channels, self.out_channels, self.kernel_size, self.stride,
            self.dtype, name="layer",
        )(x)


class UnetrUpBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        up = ConvTranspose2x2(
            self.in_channels, self.out_channels, self.dtype, use_bias=False,
            name="transp_conv",
        )(x)
        out = jnp.concatenate([up, skip], axis=-1)
        return UnetResBlock(
            2 * self.out_channels, self.out_channels, self.kernel_size, 1,
            self.dtype, name="conv_block",
        )(out)


class UnetOutBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.out_channels, (1, 1), use_bias=True, dtype=self.dtype, name="conv"
        )(x)
