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

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.nn.acc_blocks import HANCBlock, MLFC, ResPath
from accunet_tpu.ops.conv import conv_transpose_2x2
from accunet_tpu.ops.pooling import max_pool2d


class ConvTranspose2x2(nn.Module):
    """torch.nn.ConvTranspose2d(k=2, s=2) as matmul + depth-to-space."""

    in_features: int
    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel_t",  # distinct name: ports from torch (I,O,kh,kw) unambiguously
            nn.initializers.lecun_normal(),
            (2, 2, self.in_features, self.out_features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,), jnp.float32)
        return conv_transpose_2x2(x.astype(self.dtype), kernel.astype(self.dtype), bias)


class ACCUNet(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    n_filts: int = 32
    variant: str = "base"  # 'base' | 'lite' | 'w'
    final_sigmoid: bool = True   # only applies when n_classes == 1
    wide_decoder_block: bool = True  # cnv72 inv_fctr 34 (canonical) vs 3 (harness)
    remat: bool = False  # jax.checkpoint each HANCBlock (training memory)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.n_filts
        dt = self.dtype
        x = x.astype(dt)
        mode = {"base": "full", "lite": "lite", "w": "w"}[self.variant]

        if self.remat:
            block_cls = nn.remat(HANCBlock, static_argnums=(2,))
            respath_cls = nn.remat(ResPath, static_argnums=(2,))
            mlfc_cls = nn.remat(MLFC, static_argnums=(5,))
        else:
            block_cls, respath_cls, mlfc_cls = HANCBlock, ResPath, MLFC

        def hanc(n_in, n_out, k, inv, name):
            return block_cls(n_in, n_out, k=k, inv_fctr=inv, dtype=dt, name=name)

        x2 = hanc(self.n_channels, f, 3, 3, "cnv11")(x, train)
        x2 = hanc(f, f, 3, 3, "cnv12")(x2, train)
        x3 = hanc(f, f * 2, 3, 3, "cnv21")(max_pool2d(x2, 2), train)
        x3 = hanc(f * 2, f * 2, 3, 3, "cnv22")(x3, train)
        x4 = hanc(f * 2, f * 4, 3, 3, "cnv31")(max_pool2d(x3, 2), train)
        x4 = hanc(f * 4, f * 4, 3, 3, "cnv32")(x4, train)
        x5 = hanc(f * 4, f * 8, 2, 3, "cnv41")(max_pool2d(x4, 2), train)
        x5 = hanc(f * 8, f * 8, 2, 3, "cnv42")(x5, train)
        x6 = hanc(f * 8, f * 16, 1, 3, "cnv51")(max_pool2d(x5, 2), train)
        x6 = hanc(f * 16, f * 16, 1, 3, "cnv52")(x6, train)

        x2 = respath_cls(f, 4, dt, name="rspth1")(x2, train)
        x3 = respath_cls(f * 2, 3, dt, name="rspth2")(x3, train)
        x4 = respath_cls(f * 4, 2, dt, name="rspth3")(x4, train)
        x5 = respath_cls(f * 8, 1, dt, name="rspth4")(x5, train)

        filts = (f, f * 2, f * 4, f * 8)
        x2, x3, x4, x5 = mlfc_cls(filts, 1, mode, dt, name="mlfc1")(x2, x3, x4, x5, train)
        x2, x3, x4, x5 = mlfc_cls(filts, 1, mode, dt, name="mlfc2")(x2, x3, x4, x5, train)
        x2, x3, x4, x5 = mlfc_cls(filts, 1, mode, dt, name="mlfc3")(x2, x3, x4, x5, train)

        x7 = ConvTranspose2x2(f * 16, f * 8, dt, name="up6")(x6)
        x7 = hanc(f * 16, f * 8, 2, 3, "cnv61")(jnp.concatenate([x7, x5], -1), train)
        x7 = hanc(f * 8, f * 8, 2, 3, "cnv62")(x7, train)

        x8 = ConvTranspose2x2(f * 8, f * 4, dt, name="up7")(x7)
        x8 = hanc(f * 8, f * 4, 3, 3, "cnv71")(jnp.concatenate([x8, x4], -1), train)
        x8 = hanc(f * 4, f * 4, 3, 34 if self.wide_decoder_block else 3, "cnv72")(x8, train)

        x9 = ConvTranspose2x2(f * 4, f * 2, dt, name="up8")(x8)
        x9 = hanc(f * 4, f * 2, 3, 3, "cnv81")(jnp.concatenate([x9, x3], -1), train)
        x9 = hanc(f * 2, f * 2, 3, 3, "cnv82")(x9, train)

        x10 = ConvTranspose2x2(f * 2, f, dt, name="up9")(x9)
        x10 = hanc(f * 2, f, 3, 3, "cnv91")(jnp.concatenate([x10, x2], -1), train)
        x10 = hanc(f, f, 3, 3, "cnv92")(x10, train)

        out_ch = self.n_classes if self.n_classes == 1 else self.n_classes + 1
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
