"""MultiResUNet (flax.linen, NHWC).

Parity target: /root/reference/Experiments/nets/MResUNet1.py:30-250.
  * Multiresblock — 3x3→3x3→3x3 widening chain (16.7/33.3/50% of W=nfilt*α)
    concatenated, BN, + 1x1 BN shortcut, BN, ReLU (:30-80)
  * Respath — conv/shortcut residual chain; note the reference applies the
    SAME BatchNorm instance twice per step (:83-131), reproduced here
  * assembly with ConvTranspose2d(2,2) decoder (:140-250); model-name strings
    like 'MultiResUnet1_32_1.67' parse to (nfilt, alpha)
    (train_model.py:386-387)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.models.acc_unet import ConvTranspose2x2
from accunet_tpu.ops.pooling import max_pool2d

Dtype = Any


class Conv2dBN(nn.Module):
    out_filters: int
    kernel_size: tuple = (3, 3)
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_filters, self.kernel_size, padding="SAME",
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="batchnorm",
        )(x)
        return jax.nn.relu(x) if self.activation == "relu" else x


def _mrb_filters(num_filters: int, alpha: float):
    w = num_filters * alpha
    return int(w * 0.167), int(w * 0.333), int(w * 0.5)


class Multiresblock(nn.Module):
    num_filters: int
    alpha: float = 1.67
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f3, f5, f7 = _mrb_filters(self.num_filters, self.alpha)
        out_f = f3 + f5 + f7
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        shortcut = Conv2dBN(out_f, (1, 1), "none", self.dtype, name="shortcut")(x, train)
        a = Conv2dBN(f3, (3, 3), "relu", self.dtype, name="conv_3x3")(x, train)
        b = Conv2dBN(f5, (3, 3), "relu", self.dtype, name="conv_5x5")(a, train)
        c = Conv2dBN(f7, (3, 3), "relu", self.dtype, name="conv_7x7")(b, train)
        y = bn("batch_norm1")(jnp.concatenate([a, b, c], axis=-1))
        y = bn("batch_norm2")(y + shortcut)
        return jax.nn.relu(y)


class Respath(nn.Module):
    num_out_filters: int
    length: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.length):
            bn = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bns_{i}",
            )
            shortcut = Conv2dBN(
                self.num_out_filters, (1, 1), "none", self.dtype, name=f"shortcuts_{i}"
            )(x, train)
            y = Conv2dBN(
                self.num_out_filters, (3, 3), "relu", self.dtype, name=f"convs_{i}"
            )(x, train)
            y = jax.nn.relu(bn(y))
            x = jax.nn.relu(bn(y + shortcut))  # same BN applied twice (ref quirk)
        return x


class MultiResUnet(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    nfilt: int = 32
    alpha: float = 1.67
    final_sigmoid: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        nf, al = self.nfilt, self.alpha

        skips = []
        for lvl in range(4):
            x = Multiresblock(nf * 2 ** lvl, al, dt, name=f"multiresblock{lvl + 1}")(x, train)
            skips.append(
                Respath(nf * 2 ** lvl, 4 - lvl, dt, name=f"respath{lvl + 1}")(x, train)
            )
            x = max_pool2d(x, 2)
        x = Multiresblock(nf * 16, al, dt, name="multiresblock5")(x, train)

        for lvl in range(4):
            n_out = nf * 2 ** (3 - lvl)
            up = ConvTranspose2x2(x.shape[-1], n_out, dt, name=f"upsample{6 + lvl}")(x)
            x = jnp.concatenate([up, skips[3 - lvl]], axis=-1)
            x = Multiresblock(n_out, al, dt, name=f"multiresblock{6 + lvl}")(x, train)

        out_ch = self.n_classes if self.n_classes == 1 else self.n_classes + 1
        logits = Conv2dBN(out_ch, (1, 1), "none", dt, name="conv_final")(x, train)
        if out_ch == 1 and self.final_sigmoid:
            logits = jax.nn.sigmoid(logits)
        return logits.astype(jnp.float32)
