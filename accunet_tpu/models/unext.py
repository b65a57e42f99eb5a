"""UNeXt — tokenized-MLP UNet (flax.linen, NHWC).

Parity target: /root/reference/Experiments/nets/UNext.py:205-358.
  * conv stem 16/32/128 with BN → 2x2 maxpool → ReLU (:281-288)
  * tokenized-MLP stages: OverlapPatchEmbed(k3 s2) 128→160→256 with one
    ShiftedBlock each + LayerNorm (:293-306)
  * decoder: 3x3 conv → BN → bilinear 2x upsample (align_corners=False) →
    ReLU → additive skip → ShiftedBlock stages at 160/128 (:310-338)
  * head: conv 16→n_classes 1x1 + sigmoid when binary (:355-358)
UNext_S (the small variant, UNext.py:361+) uses dims 8/16/32/64/128.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.nn.unext_blocks import OverlapPatchEmbed, ShiftedBlock
from accunet_tpu.ops.pooling import max_pool2d
from accunet_tpu.ops.resize import resize_bilinear, upsample_bilinear_2x


class UNext(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    stem_dims: Sequence[int] = (16, 32, 128)
    embed_dims: Sequence[int] = (128, 160, 256)
    final_sigmoid: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        s1, s2, s3 = self.stem_dims
        e0, e1, e2 = self.embed_dims

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=dt, name=name,
            )

        def conv(feat, name):
            return nn.Conv(feat, (3, 3), padding="SAME", dtype=dt, name=name)

        # --- conv stem (pool before relu, matching :281-288)
        out = jax.nn.relu(max_pool2d(bn("ebn1")(conv(s1, "encoder1")(x)), 2))
        t1 = out
        out = jax.nn.relu(max_pool2d(bn("ebn2")(conv(s2, "encoder2")(out)), 2))
        t2 = out
        out = jax.nn.relu(max_pool2d(bn("ebn3")(conv(s3, "encoder3")(out)), 2))
        t3 = out

        # --- tokenized MLP stage 4
        tok, h, w = OverlapPatchEmbed(e1, 3, 2, dt, name="patch_embed3")(out)
        tok = ShiftedBlock(e1, 1.0, dt, name="block1_0")(tok, h, w, train)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm3")(tok)
        out = tok.reshape(tok.shape[0], h, w, e1)
        t4 = out

        # --- bottleneck
        tok, h, w = OverlapPatchEmbed(e2, 3, 2, dt, name="patch_embed4")(out)
        tok = ShiftedBlock(e2, 1.0, dt, name="block2_0")(tok, h, w, train)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm4")(tok)
        out = tok.reshape(tok.shape[0], h, w, e2)

        def up_add(out, conv_name, bn_name, feat, skip):
            y = conv(feat, conv_name)(out)
            if bn_name is not None:
                y = bn(bn_name)(y)
            y = jax.nn.relu(upsample_bilinear_2x(y))
            if skip is not None:
                if skip.shape[1:3] != y.shape[1:3]:
                    skip = resize_bilinear(skip, y.shape[1:3], align_corners=True)
                y = y + skip
            return y

        # --- decoder stage 4 (256→160) + token block
        out = up_add(out, "decoder1", "dbn1", e1, t4)
        b, h, w = out.shape[0], out.shape[1], out.shape[2]
        tok = out.reshape(b, h * w, e1)
        tok = ShiftedBlock(e1, 1.0, dt, name="dblock1_0")(tok, h, w, train)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="dnorm3")(tok)
        out = tok.reshape(b, h, w, e1)

        # --- decoder stage 3 (160→128) + token block
        out = up_add(out, "decoder2", "dbn2", e0, t3)
        b, h, w = out.shape[0], out.shape[1], out.shape[2]
        tok = out.reshape(b, h * w, e0)
        tok = ShiftedBlock(e0, 1.0, dt, name="dblock2_0")(tok, h, w, train)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="dnorm4")(tok)
        out = tok.reshape(b, h, w, e0)

        out = up_add(out, "decoder3", "dbn3", s2, t2)
        out = up_add(out, "decoder4", "dbn4", s1, t1)
        out = up_add(out, "decoder5", None, s1, None)

        # 1x1 head as a plain matmul (same params/names as nn.Conv). An
        # s2d-frame tail (upsample phases emitted as frame positions, head
        # in-frame) was the winner while the upsample was phase-based; with
        # the depthwise lhs-dilated-conv upsample (ops/resize.py) the plain
        # tail is 24% faster (23.0k vs 18.6k img/s b1024) and was restored.
        from accunet_tpu.nn.acc_blocks import _ConvParams

        ko, bo = _ConvParams(1, 1, s1, self.n_classes, name="final")()
        logits = jnp.einsum(
            "bhwc,co->bhwo", out, ko[0, 0].astype(dt)
        ) + bo.astype(dt)
        if self.n_classes == 1 and self.final_sigmoid:
            logits = jax.nn.sigmoid(logits)
        return logits.astype(jnp.float32)


def UNext_S(n_channels=3, n_classes=1, **kw):
    """UNext_S small variant (UNext.py:361+): stem 8/16/32, dims 32/64/128."""
    return UNext(
        n_channels, n_classes, stem_dims=(8, 16, 32), embed_dims=(32, 64, 128), **kw
    )
