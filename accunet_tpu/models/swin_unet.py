"""Swin-Unet — shifted-window transformer UNet (flax.linen, NHWC).

Parity targets (/root/reference/Experiments/nets/SwinUnet.py):
  * WindowAttention — W-MSA with relative position bias table/index, single
    qkv Linear, per-head scale (:65-160)
  * SwinTransformerBlock — LN → (shifted) window attention with -100 mask →
    res, LN → GELU MLP → res; cyclic roll for shift (:163-280)
  * PatchMerging — 2x2 interleaved concat [x0;x1;x2;x3] → LN → Linear 4C→2C
    no-bias (:283-336)
  * PatchExpand / FinalPatchExpand_X4 — Linear expand + pixel-shuffle
    rearrange + LN (:339-387)
  * SwinTransformerSys assembly — 4 encoder stages (depths 2,2,2,2, heads
    3,6,12,24, window 7), bottleneck norm, decoder with skip concat +
    concat_back_dim Linear, final x4 expand + 1x1 conv head, sigmoid for
    binary (:564-770)
  * SwinUnet wrapper — 1-channel inputs repeated to 3; optional 4→3
    InputAdapter (:783-834)
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws², ws²)


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(wins, ws, h, w):
    b = wins.shape[0] // (h * w // ws // ws)
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _attn_mask(h, w, ws, shift):
    """(num_windows, ws², ws²) additive mask with -100 at cross-region pairs
    (SwinUnet.py:211-230)."""
    img = np.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    mw = window_partition(jnp.asarray(img), ws).reshape(-1, ws * ws)
    diff = mw[:, None, :] - mw[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        bw, n, c = x.shape
        heads, hd = self.num_heads, self.dim // self.num_heads
        ws = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * ws - 1) ** 2, heads),
            jnp.float32,
        )
        idx = jnp.asarray(_rel_pos_index(ws))
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * hd ** -0.5, k)
        bias = table[idx.reshape(-1)].reshape(n, n, heads).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, heads, n, n) + mask[None, :, None].astype(
                attn.dtype
            )
            attn = attn.reshape(bw, heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    input_resolution: tuple
    num_heads: int
    shift: int = 0
    window_size: int = 7
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = self.input_resolution
        if min(h, w) <= self.window_size:
            # window covers the whole map → no shifting (SwinUnet.py:175-178)
            ws, shift = min(h, w), 0
        else:
            ws, shift = self.window_size, self.shift
        b, l, c = x.shape
        res = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = y.reshape(b, h, w, c)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = _attn_mask(h, w, ws, shift)
        else:
            mask = None
        wins = window_partition(y, ws)
        wins = WindowAttention(self.dim, ws, self.num_heads, self.dtype, name="attn")(
            wins, mask
        )
        y = window_reverse(wins, ws, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = res + y.reshape(b, l, c)

        res = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return res + y


class PatchMerging(nn.Module):
    dim: int
    input_resolution: tuple
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = self.input_resolution
        b, l, c = x.shape
        y = x.reshape(b, h, w, c)
        x0 = y[:, 0::2, 0::2]
        x1 = y[:, 1::2, 0::2]
        x2 = y[:, 0::2, 1::2]
        x3 = y[:, 1::2, 1::2]
        y = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(b, l // 4, 4 * c)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(y)


class PatchExpand(nn.Module):
    dim: int
    input_resolution: tuple
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = self.input_resolution
        y = nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="expand")(x)
        b, l, c = y.shape
        y = y.reshape(b, h, w, 2, 2, c // 4)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 4 * l, c // 4)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)


class FinalPatchExpandX4(nn.Module):
    dim: int
    input_resolution: tuple
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = self.input_resolution
        y = nn.Dense(16 * self.dim, use_bias=False, dtype=self.dtype, name="expand")(x)
        b, l, c = y.shape
        y = y.reshape(b, h, w, 4, 4, c // 16)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 16 * l, self.dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)


class SwinUnet(nn.Module):
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

        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID", dtype=dt,
            name="patch_embed_proj",
        )(x)
        b, h, w, c = x.shape
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="patch_embed_norm")(
            x.reshape(b, h * w, c)
        )

        # encoder
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
