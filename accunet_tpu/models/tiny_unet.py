"""TinyU-Net — lightweight CMRF UNet (flax.linen, NHWC).

Parity target: /root/reference/Experiments/nets/archs/TinyU_Net.py:131-196.
  * UNetEncoder: CMRF → 2x2 maxpool (skip taken pre-pool)
  * UNetDecoder: bicubic 2x upsample (align_corners=False) → concat skip →
    CMRF
  * head: 1x1 conv, raw logits (num_classes=2 default in the reference)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.nn.cmrf_blocks import CMRF
from accunet_tpu.ops.pooling import max_pool2d
from accunet_tpu.ops.resize import resize_bicubic

Dtype = Any


class TinyUNet(nn.Module):
    n_channels: int = 3
    n_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        enc_out = (64, 128, 256, 512)
        dec_in = (192, 384, 768, 1024)

        skips = []
        cin = self.n_channels
        for i, cout in enumerate(enc_out):
            y = CMRF(cin, cout, dtype=dt, name=f"encoder{i + 1}_cmrf")(x, train)
            skips.append(y)
            x = max_pool2d(y, 2)
            cin = cout

        for i in range(3, -1, -1):
            x = resize_bicubic(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=False)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = CMRF(dec_in[i], enc_out[i], dtype=dt, name=f"decoder{i + 1}_cmrf")(x, train)

        return nn.Conv(self.n_classes, (1, 1), dtype=dt, name="final_conv")(x).astype(
            jnp.float32
        )
