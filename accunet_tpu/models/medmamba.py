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
    embed_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        half = self.embed_dim // 2

        def conv_bn_act(y, feat, k, s, name, act=True):
            p = k // 2
            y = nn.Conv(
                feat, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                use_bias=False, dtype=dt, name=f"{name}_conv",
            )(y)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=dt, name=f"{name}_bn",
            )(y)
            return jax.nn.relu(y) if act else y

        y = conv_bn_act(x, half, 3, 2, "conv1")
        y2 = conv_bn_act(y, half, 3, 1, "conv2_0")
        y2 = conv_bn_act(y2, half, 3, 1, "conv2_1", act=False)
        y = y + y2
        y = conv_bn_act(y, self.embed_dim * 4, 3, 2, "conv3_0")
        y = conv_bn_act(y, self.embed_dim, 1, 1, "conv3_1", act=False)
        return y


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
                # DownSampling: 3x3 stride-2 conv + BN
                x = nn.Conv(
                    self.dims[i], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=dt, name=f"downsample_{i}_conv",
                )(x)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=dt, name=f"downsample_{i}_bn",
                )(x)
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
