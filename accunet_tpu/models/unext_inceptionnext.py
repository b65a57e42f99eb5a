"""UNeXt with InceptionNeXt (MetaNeXt) encoder + MLFC skip fusion (NHWC).

Parity targets:
  * InceptionDWConv2d — split-channel identity/square/band-W/band-H depthwise
    mixer (/root/reference/Experiments/nets/archs/inceptionnext.py:25-42)
  * ConvMlp + MetaNeXtBlock (layer-scale gamma) + MetaNeXtStage (BN+conv
    downsample) (inceptionnext.py:45-168)
  * UNext_InceptionNext_MLFC — stem 4x4/4 conv+BN, 3 MetaNeXt stages
    (band 7/9/11, branch 0.25), MLFC skip fusion, UNeXt tokenized decoder
    with 1x1 channel-match on skips, final resize-to-input + sigmoid
    (archs/archs_InceptionNext_MLFC.py:211-432)

Deviations from the reference, which ships broken here: its skip_fusion is
constructed as MLFC(16,32,128,160) while the stage outputs are 80/128/160/160
channels (archs_InceptionNext_MLFC.py:251), and its decoder creates *fresh
untrained* nn.Conv2d modules inside forward for channel matching (:389-416).
This implementation uses the actual stage channels for MLFC and learned
channel-match convs.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.nn.acc_blocks import MLFC
from accunet_tpu.nn.unext_blocks import OverlapPatchEmbed, ShiftedBlock
from accunet_tpu.ops.resize import resize_bilinear, upsample_bilinear_2x

Dtype = Any


class InceptionDWConv2d(nn.Module):
    dim: int
    square_kernel: int = 3
    band_kernel: int = 11
    branch_ratio: float = 0.125
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gc = int(self.dim * self.branch_ratio)
        idc = self.dim - 3 * gc
        x_id = x[..., :idc]
        x_hw = x[..., idc : idc + gc]
        x_w = x[..., idc + gc : idc + 2 * gc]
        x_h = x[..., idc + 2 * gc :]
        k, bk = self.square_kernel, self.band_kernel
        x_hw = nn.Conv(
            gc, (k, k), padding="SAME", feature_group_count=gc, dtype=self.dtype,
            name="dwconv_hw",
        )(x_hw)
        x_w = nn.Conv(
            gc, (1, bk), padding="SAME", feature_group_count=gc, dtype=self.dtype,
            name="dwconv_w",
        )(x_w)
        x_h = nn.Conv(
            gc, (bk, 1), padding="SAME", feature_group_count=gc, dtype=self.dtype,
            name="dwconv_h",
        )(x_h)
        return jnp.concatenate([x_id, x_hw, x_w, x_h], axis=-1)


class MetaNeXtBlock(nn.Module):
    dim: int
    band_kernel: int = 11
    branch_ratio: float = 0.25
    mlp_ratio: int = 4
    ls_init: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        y = InceptionDWConv2d(
            self.dim, 3, self.band_kernel, self.branch_ratio, self.dtype,
            name="token_mixer",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="norm",
        )(y)
        y = nn.Conv(self.dim * self.mlp_ratio, (1, 1), dtype=self.dtype, name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="mlp_fc2")(y)
        if self.ls_init:
            gamma = self.param(
                "gamma", lambda k, s: jnp.full(s, self.ls_init), (self.dim,)
            )
            y = y * gamma.astype(y.dtype)
        return y + shortcut


class MetaNeXtStage(nn.Module):
    out_chs: int
    depth: int = 2
    band_kernel: int = 11
    branch_ratio: float = 0.25
    ds_stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.ds_stride > 1:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="downsample_0",
            )(x)
            s = self.ds_stride
            x = nn.Conv(
                self.out_chs, (s, s), strides=(s, s), padding="VALID",
                dtype=self.dtype, name="downsample_1",
            )(x)
        for i in range(self.depth):
            x = MetaNeXtBlock(
                self.out_chs, self.band_kernel, self.branch_ratio,
                dtype=self.dtype, name=f"blocks_{i}",
            )(x, train)
        return x


class UNextInceptionNextMLFC(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    embed_dims: Sequence[int] = (128, 160, 256)
    use_fkan: bool = False
    final_sigmoid: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        xin = x
        x = x.astype(dt)
        e0, e1, e2 = self.embed_dims

        x = nn.Conv(40, (4, 4), strides=(4, 4), padding="VALID", dtype=dt, name="stem_0")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt,
            name="stem_1",
        )(x)

        t1 = MetaNeXtStage(80, 2, 7, 0.25, 2, dt, name="stage1")(x, train)
        t2 = MetaNeXtStage(128, 2, 9, 0.25, 2, dt, name="stage2")(t1, train)
        t3 = MetaNeXtStage(160, 2, 11, 0.25, 2, dt, name="stage3")(t2, train)

        tok, h, w = OverlapPatchEmbed(e1, 3, 2, dt, name="patch_embed3")(t3)
        tok = ShiftedBlock(e1, 1.0, dt, name="block1_0")(tok, h, w, train)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm3")(tok)
        t4 = tok.reshape(tok.shape[0], h, w, e1)
        b = t4.shape[0]

        t1, t2, t3, t4 = MLFC(
            (80, 128, 160, 160), 1, "full", dt, name="skip_fusion"
        )(t1, t2, t3, t4, train)

        tok, h, w = OverlapPatchEmbed(e2, 3, 2, dt, name="patch_embed4")(t4)
        tok = ShiftedBlock(e2, 1.0, dt, name="block2_0")(tok, h, w, train)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm4")(tok)
        out = tok.reshape(b, h, w, e2)

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=dt, name=name,
            )

        def up(y, conv_name, bn_name, feat):
            y = nn.Conv(feat, (3, 3), padding="SAME", dtype=dt, name=conv_name)(y)
            if bn_name:
                y = bn(bn_name)(y)
            return jax.nn.relu(upsample_bilinear_2x(y))

        def add_skip(y, t, name):
            if t.shape[1:3] != y.shape[1:3]:
                t = resize_bilinear(t, y.shape[1:3], align_corners=True)
            if t.shape[-1] != y.shape[-1]:
                t = nn.Conv(y.shape[-1], (1, 1), dtype=dt, name=name)(t)
            return y + t

        out = up(out, "decoder1", "dbn1", e1)
        out = add_skip(out, t4, "match4")
        hh, ww = out.shape[1:3]
        tok = out.reshape(b, hh * ww, e1)
        tok = ShiftedBlock(e1, 1.0, dt, name="dblock1_0")(tok, hh, ww, train)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="dnorm3")(tok)
        out = tok.reshape(b, hh, ww, e1)

        out = up(out, "decoder2", "dbn2", e0)
        out = add_skip(out, t3, "match3")
        hh, ww = out.shape[1:3]
        tok = out.reshape(b, hh * ww, e0)
        tok = ShiftedBlock(e0, 1.0, dt, name="dblock2_0")(tok, hh, ww, train)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="dnorm4")(tok)
        out = tok.reshape(b, hh, ww, e0)

        out = up(out, "decoder3", "dbn3", 32)
        out = add_skip(out, t2, "match2")
        out = up(out, "decoder4", "dbn4", 16)
        out = add_skip(out, t1, "match1")
        out = up(out, "decoder5", None, 16)

        out = resize_bilinear(out, xin.shape[1:3], align_corners=False)
        logits = nn.Conv(self.n_classes, (1, 1), dtype=dt, name="final")(out)
        if self.n_classes == 1 and self.final_sigmoid:
            logits = jax.nn.sigmoid(logits)
        return logits.astype(jnp.float32)
