"""Plain 5-level UNet (flax.linen, NHWC).

Parity target: /root/reference/Experiments/nets/UNet_base.py:23-142.
  * ConvBatchNorm: 3x3 conv → BN → ReLU (:23-36)
  * DownBlock: maxpool2 → 2x ConvBatchNorm (:38-48)
  * UpBlock: ConvTranspose2d(C/2→C/2, k2 s2) → concat skip → 2x ConvBatchNorm
    (:50-64); concat order is [upsampled, skip] on channels
  * head: 1x1 conv; sigmoid for binary, (n_classes+1) logits otherwise
    (:103-117)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.models.acc_unet import ConvTranspose2x2
from accunet_tpu.ops.pooling import max_pool2d


class ConvBatchNorm(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="norm",
        )(x)
        return jax.nn.relu(x)


class _NConvs(nn.Module):
    out_channels: int
    nb_conv: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.nb_conv):
            x = ConvBatchNorm(self.out_channels, self.dtype, name=f"nConvs_{i}")(x, train)
        return x


class UpBlock(nn.Module):
    out_channels: int
    nb_conv: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        cin = x.shape[-1]
        y = ConvTranspose2x2(cin, cin, self.dtype, name="up")(x)
        y = jnp.concatenate([y, skip], axis=-1)
        for i in range(self.nb_conv):
            y = ConvBatchNorm(self.out_channels, self.dtype, name=f"nConvs_{i}")(y, train)
        return y


class UNetBase(nn.Module):
    n_channels: int = 3
    n_classes: int = 9
    base_width: int = 64
    final_sigmoid: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_width
        dt = self.dtype
        x = x.astype(dt)

        x1 = ConvBatchNorm(c, dt, name="inc")(x, train)
        x2 = _NConvs(c * 2, 2, dt, name="down1")(max_pool2d(x1, 2), train)
        x3 = _NConvs(c * 4, 2, dt, name="down2")(max_pool2d(x2, 2), train)
        x4 = _NConvs(c * 8, 2, dt, name="down3")(max_pool2d(x3, 2), train)
        x5 = _NConvs(c * 8, 2, dt, name="down4")(max_pool2d(x4, 2), train)

        y = UpBlock(c * 4, 2, dt, name="up4")(x5, x4, train)
        y = UpBlock(c * 2, 2, dt, name="up3")(y, x3, train)
        y = UpBlock(c, 2, dt, name="up2")(y, x2, train)
        y = UpBlock(c, 2, dt, name="up1")(y, x1, train)

        out_ch = self.n_classes if self.n_classes == 1 else self.n_classes + 1
        logits = nn.Conv(out_ch, (1, 1), dtype=dt, name="outc")(y)
        if self.n_classes == 1 and self.final_sigmoid:
            logits = jax.nn.sigmoid(logits)
        return logits.astype(jnp.float32)


def UNet_base(n_channels=3, n_classes=9, **kw):
    return UNetBase(n_channels, n_classes, **kw)
