"""SMESwinUnet — Swin-Unet with SME (Superpixel + MCCT + External attention)
skip refinement (flax.linen, NHWC).

Parity target: /root/reference/Experiments/nets/SMESwinUnet.py:28-84 wrapping
/root/reference/Experiments/nets/swin_transformer_unet_skip_expand_decoder_sys.py:
  * superpixel support image: `mark_boundaries(x, slic(x))` computed on the
    host per forward (:808-811). slic is an iterative CPU clustering that
    cannot live in an XLA graph, so here the boundary cue is produced in-graph
    by a Sobel edge detector marking high-gradient pixels with the same
    (1,1,0) color `mark_boundaries` uses — same role (low-level boundary
    injection), TPU-native implementation.
  * d0 = Conv2d(3→48, k3 s2) on the support image (:714, cnnt1)
  * mcct ChannelTransformer over (d0, d1, d2, d3) with img_size=112,
    patchSize (112,56,28,14), channel_num (48,96,192,384) — each level
    collapses to ONE summary token, cross-channel attention, reconstruct +
    residual (:707, nets/mcct.py:360-399). Reuses the UCTransNet
    ChannelTransformer (identical math, different sizes).
  * ExternalAttention(S=8) on the d1/d2/d3 skip tokens (:715-717,
    nets/mcct.py:26-55)
  * Swin encoder/decoder, final 4x patch expand, bias-free 1x1 head, sigmoid
    for binary (module/layer names match models/swin_unet.py so the Swin
    pretrained-checkpoint surgery applies to the core)
  * the reference also builds `cnn4supp` (:718) but never calls it in
    forward — intentionally not reproduced
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.models.swin_unet import (
    FinalPatchExpandX4,
    PatchExpand,
    PatchMerging,
    SwinBlock,
)
from accunet_tpu.models.uctransnet import ChannelTransformer
from accunet_tpu.nn.attention import ExternalAttention

Dtype = Any


def boundary_support_image(x, threshold: float = 0.3):
    """In-graph stand-in for `mark_boundaries(x, slic(x))`: overlay (1,1,0)
    on pixels whose Sobel gradient magnitude exceeds `threshold`."""
    gray = x.mean(axis=-1, keepdims=True)
    kx = jnp.array(
        [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], x.dtype
    ).reshape(3, 3, 1, 1)
    ky = kx.transpose(1, 0, 2, 3)

    def conv(img, k):
        return jax.lax.conv_general_dilated(
            img, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    mag = jnp.sqrt(conv(gray, kx) ** 2 + conv(gray, ky) ** 2)
    mask = (mag > threshold).astype(x.dtype)
    color = jnp.array([1.0, 1.0, 0.0], x.dtype)  # mark_boundaries default
    return x * (1 - mask) + color * mask


class SMESwinUnet(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    final_sigmoid: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        p = self.patch_size
        nl = len(self.depths)
        pres = self.img_size // p

        # superpixel-boundary support branch (ref :808-811, 714)
        x_supp = boundary_support_image(x)
        d0 = nn.Conv(
            48, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], dtype=dt,
            name="cnnt1",
        )(x_supp)  # (B, 112, 112, 48)

        x_emb = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID", dtype=dt,
            name="patch_embed_proj",
        )(x)
        b, h, w, c = x_emb.shape
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="patch_embed_norm")(
            x_emb.reshape(b, h * w, c)
        )

        # encoder (skips collected before each stage, ref forward_features)
        skips = []
        for i, depth in enumerate(self.depths):
            res = pres // (2 ** i)
            dim = self.embed_dim * 2 ** i
            skips.append(tok)
            for j in range(depth):
                tok = SwinBlock(
                    dim, (res, res), self.num_heads[i],
                    shift=0 if j % 2 == 0 else self.window_size // 2,
                    window_size=self.window_size, dtype=dt,
                    name=f"layers_{i}_blocks_{j}",
                )(tok)
            if i < nl - 1:
                tok = PatchMerging(dim, (res, res), dt, name=f"layers_{i}_downsample")(tok)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm")(tok)

        # ---- SME skip refinement (ref :813-818) ----
        def tok2map(t, res):
            bb, n, cc = t.shape
            return t.reshape(bb, res, res, cc)

        def map2tok(m):
            bb, hh, ww, cc = m.shape
            return m.reshape(bb, hh * ww, cc)

        d1 = tok2map(skips[0], pres)          # 56², 96
        d2 = tok2map(skips[1], pres // 2)     # 28², 192
        d3 = tok2map(skips[2], pres // 4)     # 14², 384
        sup = self.img_size // 2
        ed = self.embed_dim
        refined = ChannelTransformer(
            channel_num=(48, ed, 2 * ed, 4 * ed),
            img_size=sup,
            patch_sizes=(sup, sup // 2, sup // 4, sup // 8),
            dtype=dt,
            name="mcct",
        )([d0, d1, d2, d3], train)
        d1, d2, d3 = (map2tok(m) for m in refined[1:])
        d1 = ExternalAttention(ed, 8, dt, name="EA_channeld1")(d1)
        d2 = ExternalAttention(2 * ed, 8, dt, name="EA_channeld2")(d2)
        d3 = ExternalAttention(4 * ed, 8, dt, name="EA_channeld3")(d3)
        skips = [d1, d2, d3, skips[3]]

        # decoder
        for i in range(nl):
            rev = nl - 1 - i
            res = pres // (2 ** rev)
            dim = self.embed_dim * 2 ** rev
            if i == 0:
                tok = PatchExpand(dim, (res, res), dt, name="layers_up_0")(tok)
            else:
                tok = jnp.concatenate([tok, skips[rev]], axis=-1)
                tok = nn.Dense(dim, dtype=dt, name=f"concat_back_dim_{i}")(tok)
                for j in range(self.depths[rev]):
                    tok = SwinBlock(
                        dim, (res, res), self.num_heads[rev],
                        shift=0 if j % 2 == 0 else self.window_size // 2,
                        window_size=self.window_size, dtype=dt,
                        name=f"layers_up_{i}_blocks_{j}",
                    )(tok)
                if i < nl - 1:
                    tok = PatchExpand(
                        dim, (res, res), dt, name=f"layers_up_{i}_upsample"
                    )(tok)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm_up")(tok)

        tok = FinalPatchExpandX4(self.embed_dim, (pres, pres), dt, name="up")(tok)
        y = tok.reshape(b, pres * 4, pres * 4, self.embed_dim)
        out_ch = self.n_classes if self.n_classes == 1 else self.n_classes + 1
        logits = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=dt, name="output")(y)
        if self.n_classes == 1 and self.final_sigmoid:
            logits = jax.nn.sigmoid(logits)
        return logits.astype(jnp.float32)
