"""TransUNet — ViT (optionally R50-hybrid) encoder + CUP decoder (NHWC).

Parity targets:
  * Attention/Mlp/Block/Encoder — standard pre-LN ViT, LN eps 1e-6
    (/root/reference/Experiments/nets/vit_seg_modelling.py:52-248)
  * Embeddings — patchify conv (+ optional ResNetV2 hybrid stem) + learned
    position embeddings (:124-168); 1-channel inputs are repeated to 3
    (:388-389)
  * DecoderCup — conv_more 3x3 + 4 DecoderBlocks (bilinear 2x upsample with
    align_corners=True [UpsamplingBilinear2d], concat skip, 2x conv-BN-ReLU)
    (:261-370)
  * SegmentationHead — 3x3 conv (:320-326)
  * ResNetV2 hybrid — weight-standardized convs + GroupNorm(32) pre-act
    bottlenecks; root 7x7/2, maxpool 3/2/0 with zero-pad shape fixups
    (vit_seg_modelling_resnet_skip.py:18-160)
  * wrapper nets/TransUNet.py:17-62 — sigmoid for binary
Configs follow vit_seg_configs.py: ViT-B_16 (patch 16) and R50-ViT-B_16
(grid 14, resnet (3,4,9) width 1, skip_channels [512,256,64,16], n_skip 3).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.ops.resize import resize_bilinear

Dtype = Any


class StdConv(nn.Module):
    """Weight-standardized conv (vit_seg_modelling_resnet_skip.py:18-25)."""

    features: int
    kernel: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        m = w.mean(axis=(0, 1, 2), keepdims=True)
        v = ((w - m) ** 2).mean(axis=(0, 1, 2), keepdims=True)
        w = (w - m) * jax.lax.rsqrt(v + 1e-5)
        p = k // 2
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride, self.stride),
            [(p, p), (p, p)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def group_norm(x, groups, name, module, eps=1e-6):
    return nn.GroupNorm(num_groups=groups, epsilon=eps, name=name)(x)


class PreActBottleneck(nn.Module):
    cin: int
    cout: int
    cmid: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        if self.stride != 1 or self.cin != self.cout:
            residual = StdConv(self.cout, 1, self.stride, self.dtype, name="downsample")(x)
            residual = nn.GroupNorm(num_groups=self.cout, epsilon=1e-5, name="gn_proj")(residual)
        y = jax.nn.relu(nn.GroupNorm(32, epsilon=1e-6, name="gn1")(
            StdConv(self.cmid, 1, 1, self.dtype, name="conv1")(x)))
        y = jax.nn.relu(nn.GroupNorm(32, epsilon=1e-6, name="gn2")(
            StdConv(self.cmid, 3, self.stride, self.dtype, name="conv2")(y)))
        y = nn.GroupNorm(32, epsilon=1e-6, name="gn3")(
            StdConv(self.cout, 1, 1, self.dtype, name="conv3")(y))
        return jax.nn.relu(residual + y)


class ResNetV2(nn.Module):
    block_units: Sequence[int] = (3, 4, 9)
    width_factor: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = int(64 * self.width_factor)
        b, in_size = x.shape[0], x.shape[1]
        x = StdConv(w, 7, 2, self.dtype, name="root_conv")(x)
        x = jax.nn.relu(nn.GroupNorm(32, epsilon=1e-6, name="root_gn")(x))
        features = [x]
        # maxpool k3 s2 p0
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
        )
        widths = [(w, w * 4, w), (w * 4, w * 8, w * 2), (w * 8, w * 16, w * 4)]
        for bi, ((cin, cout, cmid), units) in enumerate(zip(widths, self.block_units)):
            stride = 1 if bi == 0 else 2
            x = PreActBottleneck(
                cin, cout, cmid, stride, self.dtype, name=f"block{bi + 1}_unit1"
            )(x)
            for u in range(2, units + 1):
                x = PreActBottleneck(
                    cout, cout, cmid, 1, self.dtype, name=f"block{bi + 1}_unit{u}"
                )(x)
            if bi < 2:
                right = in_size // 4 // (bi + 1)
                if x.shape[1] != right:
                    pad = right - x.shape[1]
                    feat = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
                else:
                    feat = x
                features.append(feat)
        return x, features[::-1]


class ViTBlock(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int
    mlp_type: str = "dense"  # 'dense' | 'fkan' (TransUnet_fKAN family,
    #                           nets/vit_seg_modeling_KAN_fJNB.py)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="attention_norm")(x)
        hd = self.hidden // self.heads

        def proj(name, t):
            return nn.Dense(self.hidden, dtype=self.dtype, name=name)(t)

        b, n, c = y.shape
        q = proj("attn_query", y).reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        k = proj("attn_key", y).reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        v = proj("attn_value", y).reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(jnp.asarray(hd, q.dtype))
        att = jax.nn.softmax(att, axis=-1)
        ctx = jnp.einsum("bhnm,bhmd->bhnd", att, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, c)
        x = proj("attn_out", ctx) + h

        h = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ffn_norm")(x)
        if self.mlp_type == "fkan":
            from accunet_tpu.nn.kan import KAN

            # the reference KANMLP normalizes AGAIN before the KAN ("tiny
            # LayerNorm to stabilize ranges", vit_seg_modeling_KAN_fJNB.py:159-164)
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ffn_pre_norm")(y)
            b2, n2, c2 = y.shape
            y = KAN(
                (self.hidden, self.mlp_dim, self.hidden), dtype=self.dtype,
                name="ffn_kan",
            )(y.reshape(b2 * n2, c2)).reshape(b2, n2, c2)
        else:
            y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="ffn_fc1")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = nn.Dense(self.hidden, dtype=self.dtype, name="ffn_fc2")(y)
        return y + h


class Conv2dReLU(nn.Module):
    out_channels: int
    kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(
            self.out_channels, (self.kernel, self.kernel), padding=[(p, p), (p, p)],
            use_bias=False, dtype=self.dtype, name="0",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="1",
        )(x)
        return jax.nn.relu(x)


class DecoderBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = Conv2dReLU(self.out_channels, 3, self.dtype, name="conv1")(x, train)
        return Conv2dReLU(self.out_channels, 3, self.dtype, name="conv2")(x, train)


class TransUNet(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    img_size: int = 224
    backbone: str = "R50-ViT-B_16"  # or 'ViT-B_16'
    hidden: int = 768
    num_layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    decoder_channels: Sequence[int] = (256, 128, 64, 16)
    n_skip: int = 3
    mlp_type: str = "dense"
    final_sigmoid: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)

        hybrid = self.backbone.startswith("R50")
        if hybrid:
            x, features = ResNetV2(dtype=dt, name="hybrid_model")(x)
            patch = 1
        else:
            features = None
            patch = 16
        x = nn.Conv(
            self.hidden, (patch, patch), strides=(patch, patch), padding="VALID",
            dtype=dt, name="patch_embeddings",
        )(x)
        b, h, w, c = x.shape
        tok = x.reshape(b, h * w, c)
        pos = self.param(
            "position_embeddings", nn.initializers.zeros, (1, h * w, self.hidden),
            jnp.float32,
        )
        tok = tok + pos.astype(tok.dtype)

        for i in range(self.num_layers):
            tok = ViTBlock(
                self.hidden, self.heads, self.mlp_dim, self.mlp_type, dt,
                name=f"layer_{i}",
            )(tok)
        tok = nn.LayerNorm(epsilon=1e-6, dtype=dt, name="encoder_norm")(tok)

        y = tok.reshape(b, h, w, self.hidden)
        y = Conv2dReLU(512, 3, dt, name="conv_more")(y, train)
        for i, ch in enumerate(self.decoder_channels):
            skip = features[i] if (features is not None and i < self.n_skip) else None
            y = DecoderBlock(ch, dt, name=f"blocks_{i}")(y, skip, train)

        logits = nn.Conv(
            self.n_classes, (3, 3), padding="SAME", dtype=dt, name="segmentation_head"
        )(y)
        if self.n_classes == 1 and self.final_sigmoid:
            logits = jax.nn.sigmoid(logits)
        return logits.astype(jnp.float32)
