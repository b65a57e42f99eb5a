"""ACC-UNet / ACC-UNet-Lite / ACC-UNet-W (flax.linen, NHWC).

Parity targets:
  * ACC_UNet      — /root/reference/ACC_UNet/ACC_UNet.py:530-659
  * ACC_UNet_Lite — /root/reference/ACC_UNet/ACC_UNet_lite.py:432-604
                    (same topology; MLFC degenerates to per-level SE)
  * ACC_UNet_W    — /root/reference/ACC_UNet/ACC_UNet_w.py:534-662
                    (MLFC merge is a learned convex blend)
  * Experiments/nets/ACC_UNet.py:584,654-655 — harness variant with
    cnv72 inv_fctr=3 (not 34) and raw-logit output; exposed here via
    `wide_decoder_block=False, final_sigmoid=False`.

Head semantics (ACC_UNet/ACC_UNet.py:594-599): binary (n_classes==1) emits a
sigmoid probability map with 1 channel; multi-class emits raw logits with
n_classes+1 channels.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.nn.acc_blocks import HANCBlock, MLFC, ResPath
from accunet_tpu.ops.conv import conv_transpose_2x2
from accunet_tpu.ops.pooling import max_pool2d


class ConvTranspose2x2(nn.Module):
    """torch.nn.ConvTranspose2d(k=2, s=2) as matmul + depth-to-space.

    With `to_frame=True` the depth-to-space is skipped and the output stays
    in the s2d frame (ops/s2d.py) — a k==s transposed conv has no window
    overlap, so each output sub-position is exactly x @ w[di, dj]."""

    in_features: int
    out_features: int
    dtype: Any = jnp.float32
    to_frame: bool = False
    use_bias: bool = True  # MONAI's UNETR transp_conv is bias-free

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel_t",  # distinct name: ports from torch (I,O,kh,kw) unambiguously
            nn.initializers.lecun_normal(),
            (2, 2, self.in_features, self.out_features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.out_features,), jnp.float32)
            if self.use_bias else jnp.zeros((self.out_features,), jnp.float32)
        )
        if self.to_frame:
            from accunet_tpu.ops import s2d

            return s2d.conv_transpose_2x2_to_frame(
                x.astype(self.dtype), kernel.astype(self.dtype), bias
            )
        return conv_transpose_2x2(x.astype(self.dtype), kernel.astype(self.dtype), bias)


class ACCUNet(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    n_filts: int = 32
    variant: str = "base"  # 'base' | 'lite' | 'w'
    final_sigmoid: bool = True   # only applies when n_classes == 1
    wide_decoder_block: bool = True  # cnv72 inv_fctr 34 (canonical) vs 3 (harness)
    remat: bool = False  # jax.checkpoint each HANCBlock (training memory)
    s2d_levels: int = 0  # 0..3 — run the top levels in the s2d frame
    # (ops/s2d.py): identical parameters and math, ~2-4x faster level-1/2 on
    # TPU. Spatial dims must be divisible by 4 (s2d_levels=1) / 8 (=2) /
    # 16 (=3). Level 3 exists for the canonical cnv72 (inv_fctr=34): its
    # 34*4f-channel interior is bytes-bound in nhwc and the frame routes it
    # into the fused whole-block kernel (ops/pallas/hanc_block.py).
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.n_filts
        dt = self.dtype
        x = x.astype(dt)
        mode = {"base": "full", "lite": "lite", "w": "w"}[self.variant]
        s2d_lv = self.s2d_levels
        if s2d_lv:
            from accunet_tpu.ops import s2d

        if self.remat:
            block_cls = nn.remat(HANCBlock, static_argnums=(2,))
            respath_cls = nn.remat(ResPath, static_argnums=(2,))
            mlfc_cls = nn.remat(MLFC, static_argnums=(5,))
        else:
            block_cls, respath_cls, mlfc_cls = HANCBlock, ResPath, MLFC

        # SE-chain the same-level fused block pairs (ROOFLINE §13.2/§13.4):
        # the first block of a pair defers its SE apply into the second
        # block's in-VMEM input read, eliminating the concat+SE XLA boundary
        # pass. Engages only when the fused kernel dispatches (eval, TPU);
        # ACCUNET_SE_CHAIN=0 restores the unchained form for A/B.
        se_chain = os.environ.get("ACCUNET_SE_CHAIN", "1") != "0"

        def hanc(n_in, n_out, k, inv, name, lv=0, defer=False):
            layout = "s2d" if s2d_lv >= lv > 0 else "nhwc"
            return block_cls(
                n_in, n_out, k=k, inv_fctr=inv, dtype=dt, layout=layout,
                defer_se=defer and se_chain and layout == "s2d", name=name
            )

        lay = lambda lv: "s2d" if s2d_lv >= lv > 0 else "nhwc"

        x1 = s2d.pack(x) if s2d_lv >= 1 else x
        x2 = hanc(self.n_channels, f, 3, 3, "cnv11", lv=1, defer=True)(x1, train)
        x2 = hanc(f, f, 3, 3, "cnv12", lv=1)(x2, train)

        # frame->frame pooled pack in one fusion (ROOFLINE §13.4 glue lever;
        # bitwise-equal to pack(max_positions(x)); ACCUNET_FUSED_POOL_PACK=0
        # restores the two-op form for A/B)
        fpp = os.environ.get("ACCUNET_FUSED_POOL_PACK", "1") != "0"

        def pool_to(lv_next, x):
            if s2d_lv >= lv_next:
                return (s2d.max_positions_pack(x) if fpp
                        else s2d.pack(s2d.max_positions(x)))
            if s2d_lv >= lv_next - 1:
                return s2d.max_positions(x)
            return max_pool2d(x, 2)

        p2 = pool_to(2, x2)
        x3 = hanc(f, f * 2, 3, 3, "cnv21", lv=2, defer=True)(p2, train)
        x3 = hanc(f * 2, f * 2, 3, 3, "cnv22", lv=2)(x3, train)

        p3 = pool_to(3, x3)
        x4 = hanc(f * 2, f * 4, 3, 3, "cnv31", lv=3, defer=True)(p3, train)
        x4 = hanc(f * 4, f * 4, 3, 3, "cnv32", lv=3)(x4, train)
        p4 = s2d.max_positions(x4) if s2d_lv >= 3 else max_pool2d(x4, 2)
        x5 = hanc(f * 4, f * 8, 2, 3, "cnv41")(p4, train)
        x5 = hanc(f * 8, f * 8, 2, 3, "cnv42")(x5, train)
        x6 = hanc(f * 8, f * 16, 1, 3, "cnv51")(max_pool2d(x5, 2), train)
        x6 = hanc(f * 16, f * 16, 1, 3, "cnv52")(x6, train)

        x2 = respath_cls(f, 4, dt, layout=lay(1), name="rspth1")(x2, train)
        x3 = respath_cls(f * 2, 3, dt, layout=lay(2), name="rspth2")(x3, train)
        x4 = respath_cls(f * 4, 2, dt, layout=lay(3), name="rspth3")(x4, train)
        x5 = respath_cls(f * 8, 1, dt, name="rspth4")(x5, train)

        filts = (f, f * 2, f * 4, f * 8)
        if mode == "lite":
            layouts = (lay(1), lay(2), lay(3), "nhwc")
            for name in ("mlfc1", "mlfc2", "mlfc3"):
                x2, x3, x4, x5 = mlfc_cls(
                    filts, 1, mode, dt, layouts=layouts, name=name
                )(x2, x3, x4, x5, train)
        else:
            # full/w MLFC: cross-level resampling runs in the standard
            # layout for levels 2-4, but the (dominant) level-1 map stays in
            # the frame end-to-end (ROOFLINE §17: the three MLFC stacks are
            # 38% of the ACC_UNet_W 512² step, led by level-1 traffic).
            # ACCUNET_MLFC_FRAME=0 restores the unpack-around-the-stack
            # form for A/B.
            mlfc_frame = s2d_lv >= 1 and os.environ.get(
                "ACCUNET_MLFC_FRAME", "1"
            ) != "0"
            if s2d_lv >= 1 and not mlfc_frame:
                x2 = s2d.unpack(x2)
            if s2d_lv >= 2:
                x3 = s2d.unpack(x3)
            if s2d_lv >= 3:
                x4 = s2d.unpack(x4)
            layouts = ("s2d" if mlfc_frame else "nhwc", "nhwc", "nhwc", "nhwc")
            for name in ("mlfc1", "mlfc2", "mlfc3"):
                x2, x3, x4, x5 = mlfc_cls(
                    filts, 1, mode, dt, layouts=layouts, name=name
                )(x2, x3, x4, x5, train)
            if s2d_lv >= 1 and not mlfc_frame:
                x2 = s2d.pack(x2)
            if s2d_lv >= 2:
                x3 = s2d.pack(x3)
            if s2d_lv >= 3:
                x4 = s2d.pack(x4)

        x7 = ConvTranspose2x2(f * 16, f * 8, dt, name="up6")(x6)
        x7 = hanc(f * 16, f * 8, 2, 3, "cnv61")(jnp.concatenate([x7, x5], -1), train)
        x7 = hanc(f * 8, f * 8, 2, 3, "cnv62")(x7, train)

        x8 = ConvTranspose2x2(
            f * 8, f * 4, dt, to_frame=s2d_lv >= 3, name="up7"
        )(x7)
        cat = s2d.concat_channels(x8, x4) if s2d_lv >= 3 else jnp.concatenate([x8, x4], -1)
        x8 = hanc(f * 8, f * 4, 3, 3, "cnv71", lv=3, defer=True)(cat, train)
        x8 = hanc(
            f * 4, f * 4, 3, 34 if self.wide_decoder_block else 3, "cnv72", lv=3
        )(x8, train)
        if s2d_lv >= 3:
            x8 = s2d.unpack(x8)

        x9 = ConvTranspose2x2(
            f * 4, f * 2, dt, to_frame=s2d_lv >= 2, name="up8"
        )(x8)
        cat = s2d.concat_channels(x9, x3) if s2d_lv >= 2 else jnp.concatenate([x9, x3], -1)
        x9 = hanc(f * 4, f * 2, 3, 3, "cnv81", lv=2, defer=True)(cat, train)
        x9 = hanc(f * 2, f * 2, 3, 3, "cnv82", lv=2)(x9, train)

        if s2d_lv >= 2:
            x9 = s2d.unpack(x9)
        x10 = ConvTranspose2x2(
            f * 2, f, dt, to_frame=s2d_lv >= 1, name="up9"
        )(x9)
        cat = s2d.concat_channels(x10, x2) if s2d_lv >= 1 else jnp.concatenate([x10, x2], -1)
        x10 = hanc(f * 2, f, 3, 3, "cnv91", lv=1, defer=True)(cat, train)
        x10 = hanc(f, f, 3, 3, "cnv92", lv=1)(x10, train)

        out_ch = self.n_classes if self.n_classes == 1 else self.n_classes + 1
        if s2d_lv >= 1:
            from accunet_tpu.nn.acc_blocks import _ConvParams

            ko, bo = _ConvParams(1, 1, f, out_ch, name="out")()
            logits = s2d.conv1x1(x10, ko[0, 0].astype(x10.dtype), bo.astype(x10.dtype))
            logits = s2d.unpack(logits)
        else:
            logits = nn.Conv(out_ch, (1, 1), dtype=dt, name="out")(x10)
        if self.n_classes == 1 and self.final_sigmoid:
            logits = jax.nn.sigmoid(logits)
        return logits.astype(jnp.float32)


def ACC_UNet(n_channels=3, n_classes=1, n_filts=32, **kw):
    return ACCUNet(n_channels, n_classes, n_filts, variant="base", **kw)


def ACC_UNet_Lite(n_channels=3, n_classes=1, n_filts=32, **kw):
    return ACCUNet(n_channels, n_classes, n_filts, variant="lite", **kw)


def ACC_UNet_W(n_channels=3, n_classes=1, n_filts=32, **kw):
    return ACCUNet(n_channels, n_classes, n_filts, variant="w", **kw)
