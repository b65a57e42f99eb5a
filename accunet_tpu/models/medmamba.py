"""MedMamba (VSSM) classification backbone and SpatialMamba classifier.

Parity targets:
  * VSSM — patch embed 4x4 + LN, VSSLayers of SS_Conv_SSM blocks with
    PatchMerging2D downsamples, final LN + avgpool + Linear head
    (/root/reference/Experiments/nets/MedMamba.py:530-765)
  * SpatialMamba classifier — conv Stem (3x3 s2 chain + residual, then
    expand 4x + 1x1, Experiments/utils.py:943-985 [vendored, commented]),
    stages of SpatialMambaBlock (+KANFFN variant), DownSampling convs,
    head (nets/spatialmamba.py:538-655); Backbone_SpatialMamba exposes the
    per-stage features (nets/spatialmamba.py:658+)
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.nn.ss2d import SSConvSSM
from accunet_tpu.nn.ssm import SpatialMambaBlock

Dtype = Any


class PatchMerging2D(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        y = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(y)


class VSSM(nn.Module):
    """MedMamba backbone/classifier."""

    n_channels: int = 3
    num_classes: int = 2
    patch_size: int = 4
    depths: Sequence[int] = (2, 2, 4, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        p = self.patch_size
        x = nn.Conv(
            self.dims[0], (p, p), strides=(p, p), padding="VALID", dtype=dt,
            name="patch_embed_proj",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="patch_embed_norm")(x)

        for i, depth in enumerate(self.depths):
            for j in range(depth):
                x = SSConvSSM(
                    self.dims[i], self.d_state, dt, name=f"layers_{i}_blocks_{j}"
                )(x, train)
            if i < len(self.depths) - 1:
                x = PatchMerging2D(self.dims[i], dt, name=f"layers_{i}_downsample")(x)

        # no final LayerNorm: the reference ships with `self.norm` commented
        # out (MedMamba.py:708) and pools the raw last-stage output
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=dt, name="head")(x).astype(jnp.float32)


class SpatialMambaStem(nn.Module):
    """utils.py Stem (shipped commented, :944-984): conv 3x3 s2 -> residual
    double conv -> 3x3 s2 expand 4x -> 1x1 project; bias-free ConvLayers."""

    embed_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        half = self.embed_dim // 2

        def cl(feat, k, s, name, act=True):
            return _ConvLayer(
                feat, k, s, use_act=act, use_bias=False, dtype=dt, name=name
            )

        y = cl(half, 3, 2, "conv1")(x, train)
        y2 = cl(half, 3, 1, "conv2_0")(y, train)
        y2 = cl(half, 3, 1, "conv2_1", act=False)(y2, train)
        y = y + y2
        y = cl(self.embed_dim * 4, 3, 2, "conv3_0")(y, train)
        y = cl(self.embed_dim, 1, 1, "conv3_1", act=False)(y, train)
        return y


class _ConvLayer(nn.Module):
    """utils.py ConvLayer (shipped commented, :916-940): conv (+BN) (+ReLU)."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    use_norm: bool = True
    use_act: bool = True
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=[(p, p), (p, p)],
            feature_group_count=self.groups, use_bias=self.use_bias,
            dtype=self.dtype, name="conv",
        )(x)
        if self.use_norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="norm",
            )(x)
        return jax.nn.relu(x) if self.use_act else x


class SpatialMambaDownSampling(nn.Module):
    """utils.py DownSampling (shipped commented, :986-1012): inverted
    bottleneck 1x1 expand (8*dim) -> depthwise 3x3 stride 2 -> 1x1 project
    to 2*dim with BN; ReLU on the first two, none on the last."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(2 * self.dim * 4.0)
        x = _ConvLayer(mid, 1, use_norm=False, dtype=self.dtype, name="conv_0")(x, train)
        x = _ConvLayer(
            mid, 3, 2, groups=mid, use_norm=False, dtype=self.dtype, name="conv_1"
        )(x, train)
        return _ConvLayer(
            2 * self.dim, 1, use_act=False, dtype=self.dtype, name="conv_2"
        )(x, train)


class SpatialMamba(nn.Module):
    """Spatial-Mamba classifier (nets/spatialmamba.py:538-655)."""

    n_channels: int = 3
    num_classes: int = 1000
    depths: Sequence[int] = (2, 4, 8, 4)
    dims: Sequence[int] = (64, 128, 256, 512)
    d_state: int = 1
    use_kan_ffn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        dt = self.dtype
        x = SpatialMambaStem(self.dims[0], dt, name="patch_embed")(
            x.astype(dt), train
        )
        features = []
        for i, depth in enumerate(self.depths):
            if i > 0:
                # the reference attaches DownSampling to the END of stage
                # i-1 (SpatialMambaLayer(downsample=DownSampling)) — same
                # position between stages, named accordingly for porting
                x = SpatialMambaDownSampling(
                    self.dims[i - 1], dt, name=f"layers_{i - 1}_downsample"
                )(x, train)
            for j in range(depth):
                x = SpatialMambaBlock(
                    self.dims[i], d_state=self.d_state, dtype=dt,
                    name=f"layers_{i}_blocks_{j}",
                )(x)
            features.append(x)
        if return_features:
            return tuple(features)
        x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm")(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=dt, name="head")(x).astype(jnp.float32)


def Backbone_SpatialMamba(**kw):
    """Feature-pyramid variant (nets/spatialmamba.py:658+)."""
    model = SpatialMamba(**kw)
    return model
