"""KNUnet / KMUNet — KAN patch embed + CNN encoder + VSS (SS2D) decoder.

Structural parity with /root/reference/Experiments/nets/KNUnet.py:1281-1511:
  * KAN_PatchEmbed — strided 4-offset pixel sampling concat + KANLinear +
    LN (:1212-1250)
  * CnnDownBlock — (conv3x3 + LeakyReLU [+dropout]) x depth, PatchMerging2D
    downsample, pre-downsample feature returned as the skip (:1320-1355)
  * _VSSLayer_up — 1x1 channel halve, VSSBlocks (LN → SS2D → residual),
    PatchExpand2D upsample, additive skip (:1025-1065, 1067-1100)
  * Final_PatchExpand2D x4 + 1x1 head (:236-258, 1455-1480)

The reference file mixes several inconsistent channel plans (its own comments
disagree with hidden_dims); this implementation uses the coherent plan
hidden_dims=(64,128,256,512) throughout and is validated structurally.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.models.medmamba import PatchMerging2D
from accunet_tpu.models.swin_unet import PatchExpand, FinalPatchExpandX4
from accunet_tpu.nn.kan import KANLinear
from accunet_tpu.nn.ss2d import SS2D

Dtype = Any


class KANPatchEmbed(nn.Module):
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        parts = [x[:, i::4, 0::4, :] for i in range(4)]
        y = jnp.concatenate(parts, axis=-1)  # (B, H/4, W/4, 4C)
        bb, hh, ww, cc = y.shape
        y = KANLinear(cc, self.out_dim, base_activation="silu", dtype=self.dtype,
                      name="reduction")(y.reshape(bb * hh * ww, cc))
        y = y.reshape(bb, hh, ww, self.out_dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)


class VSSBlock(nn.Module):
    hidden_dim: int
    d_state: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln__1")(x)
        return x + SS2D(self.hidden_dim, self.d_state, dtype=self.dtype,
                        name="self_attention")(y)


class KMUNet(nn.Module):
    n_channels: int = 3
    n_classes: int = 2
    depths: Sequence[int] = (1, 2, 6, 2)
    hidden_dims: Sequence[int] = (64, 128, 256, 512)
    d_state: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        dims = list(self.hidden_dims)

        x = KANPatchEmbed(dims[0], dt, name="KAN_PatchEmbed")(x)
        skips = []
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                x = nn.Conv(dims[i], (3, 3), padding="SAME", dtype=dt,
                            name=f"enc{i}_conv{j}")(x)
                x = jax.nn.leaky_relu(x, 0.01)
            skips.append(x)
            if i < len(self.depths) - 1:
                x = PatchMerging2D(dims[i], dt, name=f"enc{i}_down")(x)
                # PatchMerging2D doubles channels; project to the plan's dims
                if 2 * dims[i] != dims[i + 1]:
                    x = nn.Conv(dims[i + 1], (1, 1), dtype=dt, name=f"enc{i}_proj")(x)

        for i in range(len(self.depths) - 2, -1, -1):
            dim = x.shape[-1]
            b, h, w, _ = x.shape
            y = nn.Conv(dim // 2, (1, 1), dtype=dt, name=f"up{i}_conv1x1")(x)
            for j in range(self.depths[i]):
                y = VSSBlock(dim // 2, self.d_state, dt, name=f"up{i}_blocks_{j}")(y)
            tok = y.reshape(b, h * w, dim // 2)
            tok = PatchExpand(dim // 2, (h, w), dt, name=f"up{i}_upsample")(tok)
            y = tok.reshape(b, 2 * h, 2 * w, dim // 4)
            if y.shape[-1] != skips[i].shape[-1]:
                y = nn.Conv(skips[i].shape[-1], (1, 1), dtype=dt, name=f"up{i}_match")(y)
            x = y + skips[i]

        b, h, w, c = x.shape
        tok = FinalPatchExpandX4(c, (h, w), dt, name="final_up")(x.reshape(b, h * w, c))
        y = tok.reshape(b, 4 * h, 4 * w, c)
        return nn.Conv(self.n_classes, (1, 1), dtype=dt, name="final_conv")(y).astype(
            jnp.float32
        )
