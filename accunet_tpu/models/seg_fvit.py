"""SegViT_fKAN — R50-ViT encoder with fKAN MLP blocks + 2D UNETR decoder.

Parity target: /root/reference/Experiments/nets/seg_fViT.py:12-284.
  * ResNetV2 hybrid stem (shared with TransUNet) provides skips
    [512, 256, 64]-channel features (reversed order)
  * ViT tokens (fKAN MLPs, vit_seg_modeling_KAN_fJNB) → 3x3 conv to the
    bottleneck feature map
  * res_proj 1x1 convs to feat_size, UnetrBasicBlock refinement, skips
    bilinearly aligned to 2^k multiples of the bottleneck, UnetrUpBlock
    decoder chain, UnetOutBlock head (raw logits; trained with
    BinaryDiceBCE, train_model.py:721-722)
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.models.transunet import ResNetV2, ViTBlock
from accunet_tpu.nn.unetr import UnetOutBlock, UnetrBasicBlock, UnetrUpBlock
from accunet_tpu.ops.resize import resize_bilinear

Dtype = Any


class SegViTfKAN(nn.Module):
    in_chans: int = 1
    out_chans: int = 1
    img_size: int = 224
    feat_size: Sequence[int] = (64, 128, 256, 512)
    hidden: int = 768
    num_layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, train: bool = False):
        dt = self.dtype
        x = x_in.astype(dt)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        f = list(self.feat_size)

        feat, res_features = ResNetV2(dtype=dt, name="hybrid_model")(x)
        tok_map = nn.Conv(
            self.hidden, (1, 1), strides=(1, 1), padding="VALID", dtype=dt,
            name="patch_embeddings",
        )(feat)
        b, h, w, c = tok_map.shape
        tok = tok_map.reshape(b, h * w, c)
        pos = self.param(
            "position_embeddings", nn.initializers.zeros, (1, h * w, self.hidden),
            jnp.float32,
        )
        tok = tok + pos.astype(tok.dtype)
        for i in range(self.num_layers):
            tok = ViTBlock(
                self.hidden, self.heads, self.mlp_dim, "fkan", dt, name=f"layer_{i}"
            )(tok)
        tok = nn.LayerNorm(epsilon=1e-6, dtype=dt, name="encoder_norm")(tok)

        x_bottleneck = nn.Conv(
            f[3], (3, 3), padding="SAME", dtype=dt, name="tokens_to_map"
        )(tok.reshape(b, h, w, self.hidden))

        f1 = nn.Conv(f[0], (1, 1), dtype=dt, name="res_proj_0")(res_features[0])
        f2 = nn.Conv(f[1], (1, 1), dtype=dt, name="res_proj_1")(res_features[1])
        f3 = nn.Conv(f[2], (1, 1), dtype=dt, name="res_proj_2")(res_features[2])

        enc1 = UnetrBasicBlock(x_in.shape[-1], f[0], 3, 1, dt, name="encoder1")(
            x_in.astype(dt)
        )
        enc2 = UnetrBasicBlock(f[0], f[1], 3, 1, dt, name="encoder2")(f1)
        enc3 = UnetrBasicBlock(f[1], f[2], 3, 1, dt, name="encoder3")(f2)
        enc4 = UnetrBasicBlock(f[2], f[3], 3, 1, dt, name="encoder4")(f3)
        enc_hidden = UnetrBasicBlock(f[3], f[3], 3, 1, dt, name="encoder5")(x_bottleneck)

        h0, w0 = enc_hidden.shape[1:3]
        enc4 = resize_bilinear(enc4, (2 * h0, 2 * w0), align_corners=False)
        enc3 = resize_bilinear(enc3, (4 * h0, 4 * w0), align_corners=False)
        enc2 = resize_bilinear(enc2, (8 * h0, 8 * w0), align_corners=False)
        enc1 = resize_bilinear(enc1, (16 * h0, 16 * w0), align_corners=False)

        dec3 = UnetrUpBlock(f[3], f[3], 3, dt, name="decoder5")(enc_hidden, enc4)
        dec2 = UnetrUpBlock(f[3], f[2], 3, dt, name="decoder4")(dec3, enc3)
        dec1 = UnetrUpBlock(f[2], f[1], 3, dt, name="decoder3")(dec2, enc2)
        dec0 = UnetrUpBlock(f[1], f[0], 3, dt, name="decoder2")(dec1, enc1)
        out = UnetrBasicBlock(f[0], f[0], 3, 1, dt, name="decoder1")(dec0)
        return UnetOutBlock(self.out_chans, dt, name="out")(out).astype(jnp.float32)
