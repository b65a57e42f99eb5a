"""U-KAN — UNet with tokenized KAN bottleneck (flax.linen, NHWC).

Parity target: /root/reference/Experiments/nets/archs/u_kan.py:
  * KANLayer — fc(KANLinear) → DW-BN-ReLU, three times (:28-149); note the
    KANLinears use the SiLU-base variant (archs/kan.py)
  * KANBlock — x + layer(LN(x)) (:151-181)
  * ConvLayer/D_ConvLayer — (conv-BN-ReLU)x2 stems (:257-285)
  * UKAN assembly — conv stem C/8,C/4,C with maxpool, tokenized KAN stages at
    embed_dims (256,320,512), additive-skip bilinear decoder, sigmoid head
    (:289-408)
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.nn.kan import KANLinear
from accunet_tpu.ops.pooling import max_pool2d
from accunet_tpu.ops.resize import upsample_bilinear_2x

Dtype = Any


class DWBnRelu(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h, w, train: bool = False):
        b, n, c = x.shape
        y = x.reshape(b, h, w, c)
        y = nn.Conv(
            self.dim, (3, 3), padding="SAME", feature_group_count=c,
            dtype=self.dtype, name="dwconv",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(y)
        return jax.nn.relu(y).reshape(b, n, c)


class KANLayer(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32
    # 'silu' (u_kan, archs/kan.py) | 'rkan' (UNext_CMRF_GS_wavelet_rkan.py,
    # whose KANLinear comes from archs/kan_r.py with a JacobiRKAN(3) base)
    base_activation: str = "silu"

    @nn.compact
    def __call__(self, x, h, w, train: bool = False):
        b, n, c = x.shape

        def kan_fc(name):
            return KANLinear(
                self.dim, self.dim, base_activation=self.base_activation,
                dtype=self.dtype, name=name,
            )

        x = kan_fc("fc1")(x.reshape(b * n, c)).reshape(b, n, c)
        x = DWBnRelu(self.dim, self.dtype, name="dwconv__1")(x, h, w, train)
        x = kan_fc("fc2")(x.reshape(b * n, c)).reshape(b, n, c)
        x = DWBnRelu(self.dim, self.dtype, name="dwconv__2")(x, h, w, train)
        x = kan_fc("fc3")(x.reshape(b * n, c)).reshape(b, n, c)
        x = DWBnRelu(self.dim, self.dtype, name="dwconv__3")(x, h, w, train)
        return x


class KANBlock(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32
    base_activation: str = "silu"

    @nn.compact
    def __call__(self, x, h, w, train: bool = False):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        return x + KANLayer(
            self.dim, self.dtype, self.base_activation, name="layer"
        )(y, h, w, train)


class ConvLayer(nn.Module):
    out_ch: int
    pre_ch: int | None = None  # D_ConvLayer runs first conv at in_ch
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = [self.pre_ch or self.out_ch, self.out_ch]
        for i, c in zip((0, 3), chans):
            x = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"conv_{i + 1}",
            )(x)
            x = jax.nn.relu(x)
        return x


class UKAN(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    embed_dims: Sequence[int] = (256, 320, 512)
    final_sigmoid: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        e0, e1, e2 = self.embed_dims

        from accunet_tpu.nn.unext_blocks import OverlapPatchEmbed

        def patch_embed(feat, name):
            return OverlapPatchEmbed(feat, 3, 2, dt, name=name)

        out = jax.nn.relu(max_pool2d(ConvLayer(e0 // 8, dtype=dt, name="encoder1")(x, train), 2))
        t1 = out
        out = jax.nn.relu(max_pool2d(ConvLayer(e0 // 4, dtype=dt, name="encoder2")(out, train), 2))
        t2 = out
        out = jax.nn.relu(max_pool2d(ConvLayer(e0, dtype=dt, name="encoder3")(out, train), 2))
        t3 = out

        tok, h, w = patch_embed(e1, "patch_embed3")(out)
        tok = KANBlock(e1, dt, name="block1_0")(tok, h, w, train)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm3")(tok)
        t4 = tok.reshape(tok.shape[0], h, w, e1)

        tok, h, w = patch_embed(e2, "patch_embed4")(t4)
        tok = KANBlock(e2, dt, name="block2_0")(tok, h, w, train)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm4")(tok)
        out = tok.reshape(tok.shape[0], h, w, e2)
        b = out.shape[0]

        out = jax.nn.relu(
            upsample_bilinear_2x(ConvLayer(e1, e2, dt, name="decoder1")(out, train))
        )
        out = out + t4
        h, w = out.shape[1:3]
        tok = out.reshape(b, h * w, e1)
        tok = KANBlock(e1, dt, name="dblock1_0")(tok, h, w, train)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="dnorm3")(tok)
        out = tok.reshape(b, h, w, e1)

        out = jax.nn.relu(
            upsample_bilinear_2x(ConvLayer(e0, e1, dt, name="decoder2")(out, train))
        )
        out = out + t3
        h, w = out.shape[1:3]
        tok = out.reshape(b, h * w, e0)
        tok = KANBlock(e0, dt, name="dblock2_0")(tok, h, w, train)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="dnorm4")(tok)
        out = tok.reshape(b, h, w, e0)

        out = jax.nn.relu(
            upsample_bilinear_2x(ConvLayer(e0 // 4, e0, dt, name="decoder3")(out, train))
        )
        out = out + t2
        out = jax.nn.relu(
            upsample_bilinear_2x(ConvLayer(e0 // 8, e0 // 4, dt, name="decoder4")(out, train))
        )
        out = out + t1
        out = jax.nn.relu(
            upsample_bilinear_2x(ConvLayer(e0 // 8, e0 // 8, dt, name="decoder5")(out, train))
        )

        logits = nn.Conv(self.n_classes, (1, 1), dtype=dt, name="final")(out)
        if self.n_classes == 1 and self.final_sigmoid:
            logits = jax.nn.sigmoid(logits)
        return logits.astype(jnp.float32)
