"""UNet++ — nested dense skip connections (flax.linen, NHWC).

Parity target: /root/reference/Experiments/nets/Unetpp.py:5-95.
Note the reference REUSES the up-convs across a row (up1_0 serves x0_1, x0_2,
x0_3, x0_4) — reproduced by calling the same flax module instance.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.models.acc_unet import ConvTranspose2x2
from accunet_tpu.ops.pooling import max_pool2d

Dtype = Any


class ConvBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in (0, 3):  # torch Sequential indices conv.0 / conv.3
            x = nn.Conv(
                self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"conv_{i + 1}",
            )(x)
            x = jax.nn.relu(x)
        return x


class UNetPlusPlus(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    deep_supervision: bool = False
    final_sigmoid: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        f = (64, 128, 256, 512, 1024)

        cb = lambda c, name: ConvBlock(c, dt, name=name)
        x0_0 = cb(f[0], "conv0__0")(x, train)
        x1_0 = cb(f[1], "conv1__0")(max_pool2d(x0_0, 2), train)
        x2_0 = cb(f[2], "conv2__0")(max_pool2d(x1_0, 2), train)
        x3_0 = cb(f[3], "conv3__0")(max_pool2d(x2_0, 2), train)
        x4_0 = cb(f[4], "conv4__0")(max_pool2d(x3_0, 2), train)

        up1_0 = ConvTranspose2x2(f[1], f[0], dt, name="up1__0")
        up2_0 = ConvTranspose2x2(f[2], f[1], dt, name="up2__0")
        up3_0 = ConvTranspose2x2(f[3], f[2], dt, name="up3__0")
        up4_0 = ConvTranspose2x2(f[4], f[3], dt, name="up4__0")

        cat = lambda *ts: jnp.concatenate(ts, axis=-1)
        x0_1 = cb(f[0], "conv0__1")(cat(x0_0, up1_0(x1_0)), train)
        x1_1 = cb(f[1], "conv1__1")(cat(x1_0, up2_0(x2_0)), train)
        x2_1 = cb(f[2], "conv2__1")(cat(x2_0, up3_0(x3_0)), train)
        x3_1 = cb(f[3], "conv3__1")(cat(x3_0, up4_0(x4_0)), train)

        x0_2 = cb(f[0], "conv0__2")(cat(x0_0, x0_1, up1_0(x1_1)), train)
        x1_2 = cb(f[1], "conv1__2")(cat(x1_0, x1_1, up2_0(x2_1)), train)
        x2_2 = cb(f[2], "conv2__2")(cat(x2_0, x2_1, up3_0(x3_1)), train)

        x0_3 = cb(f[0], "conv0__3")(cat(x0_0, x0_1, x0_2, up1_0(x1_2)), train)
        x1_3 = cb(f[1], "conv1__3")(cat(x1_0, x1_1, x1_2, up2_0(x2_2)), train)

        x0_4 = cb(f[0], "conv0__4")(cat(x0_0, x0_1, x0_2, x0_3, up1_0(x1_3)), train)

        logits = nn.Conv(self.n_classes, (1, 1), dtype=dt, name="final_conv")(x0_4)
        if self.n_classes == 1 and self.final_sigmoid:
            logits = jax.nn.sigmoid(logits)
        return logits.astype(jnp.float32)
