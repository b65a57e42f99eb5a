"""UCTransNet — UNet with Channel-wise Transformer skip fusion (NHWC).

Parity targets (/root/reference/Experiments/nets/):
  * Channel_Embeddings — per-level patchify conv (stride=patch) + learned
    position embeddings (CTrans.py:20-44); patch sizes (16,8,4,2) make all
    levels produce the same (img/16)^2 token count
  * Attention_org — channel attention: per-head Q_i over each level's
    channels vs shared K/V over the concatenated 960-channel embedding;
    scores (C_i x KV)/sqrt(KV) pass through a per-head InstanceNorm before
    softmax; context averaged over heads (CTrans.py:73-210)
  * Block_ViT / Encoder — pre-LN residual attention + per-level GELU MLP,
    4 layers, final LN (CTrans.py:237-324)
  * Reconstruct — nearest-upsample by patch size + 1x1 conv + BN + ReLU,
    residual-added to the original skip (CTrans.py:46-71, 345-358)
  * CCA decoder gate + UpBlock_attention (UCTransNet.py:55-92)
  * UCTransNet assembly (UCTransNet.py:94-142); config defaults
    get_CTranS_config (Experiments/Config.py:515-528)
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.models.unet import ConvBatchNorm, _NConvs
from accunet_tpu.ops.pooling import global_avg_pool, max_pool2d, upsample_nearest

Dtype = Any


class ChannelEmbeddings(nn.Module):
    patch: int
    channels: int
    n_patches: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch
        x = nn.Conv(
            self.channels, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="patch_embeddings",
        )(x)
        b, h, w, c = x.shape
        tok = x.reshape(b, h * w, c)
        pos = self.param(
            "position_embeddings",
            nn.initializers.zeros,
            (1, self.n_patches, self.channels),
            jnp.float32,
        )
        return tok + pos.astype(tok.dtype)


def _instance_norm_scores(s, eps=1e-5):
    # torch InstanceNorm2d(num_heads) on (B, heads, C_i, KV): normalize each
    # (C_i, KV) map per head, no affine
    mean = s.mean(axis=(2, 3), keepdims=True)
    var = ((s - mean) ** 2).mean(axis=(2, 3), keepdims=True)
    return (s - mean) * jax.lax.rsqrt(var + eps)


class AttentionOrg(nn.Module):
    channel_num: Sequence[int]
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, embs, emb_all):
        kv_size = sum(self.channel_num)
        heads = self.num_heads

        ks = [
            nn.Dense(kv_size, use_bias=False, dtype=self.dtype, name=f"key_{h}")(emb_all)
            for h in range(heads)
        ]
        vs = [
            nn.Dense(kv_size, use_bias=False, dtype=self.dtype, name=f"value_{h}")(emb_all)
            for h in range(heads)
        ]
        K = jnp.stack(ks, axis=1)  # (B, heads, n, KV)
        V = jnp.stack(vs, axis=1)

        outs = []
        for i, emb in enumerate(embs):
            qs = [
                nn.Dense(
                    self.channel_num[i], use_bias=False, dtype=self.dtype,
                    name=f"query{i + 1}_{h}",
                )(emb)
                for h in range(heads)
            ]
            Q = jnp.stack(qs, axis=1).transpose(0, 1, 3, 2)  # (B,heads,C_i,n)
            scores = jnp.einsum("bhcn,bhnk->bhck", Q, K) / jnp.sqrt(
                jnp.asarray(kv_size, Q.dtype)
            )
            probs = jax.nn.softmax(_instance_norm_scores(scores), axis=-1)
            ctx = jnp.einsum("bhck,bhkn->bhcn", probs, V.transpose(0, 1, 3, 2))
            ctx = ctx.transpose(0, 3, 2, 1).mean(axis=3)  # (B, n, C_i)
            outs.append(
                nn.Dense(
                    self.channel_num[i], use_bias=False, dtype=self.dtype,
                    name=f"out{i + 1}",
                )(ctx)
            )
        return outs


class BlockViT(nn.Module):
    channel_num: Sequence[int]
    num_heads: int = 4
    expand_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, embs):
        ln = lambda dim, name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)
        kv = sum(self.channel_num)
        emb_all = jnp.concatenate(embs, axis=2)
        cxs = [
            ln(c, f"attn_norm{i + 1}")(e)
            for i, (e, c) in enumerate(zip(embs, self.channel_num))
        ]
        emb_all = ln(kv, "attn_norm")(emb_all)
        attn = AttentionOrg(self.channel_num, self.num_heads, self.dtype, name="channel_attn")(
            cxs, emb_all
        )
        cxs = [o + a for o, a in zip(embs, attn)]
        outs = []
        for i, (cx, c) in enumerate(zip(cxs, self.channel_num)):
            y = ln(c, f"ffn_norm{i + 1}")(cx)
            y = Mlp(c * self.expand_ratio, c, self.dtype, name=f"ffn{i + 1}")(y)
            outs.append(y + cx)
        return outs


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class CTransEncoder(nn.Module):
    channel_num: Sequence[int]
    num_layers: int = 4
    num_heads: int = 4
    expand_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, embs):
        for l in range(self.num_layers):
            embs = BlockViT(
                self.channel_num, self.num_heads, self.expand_ratio, self.dtype,
                name=f"layer_{l}",
            )(embs)
        return [
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"encoder_norm{i + 1}")(e)
            for i, e in enumerate(embs)
        ]


class ChannelTransformer(nn.Module):
    channel_num: Sequence[int]
    img_size: int
    patch_sizes: Sequence[int] = (16, 8, 4, 2)
    num_layers: int = 4
    num_heads: int = 4
    expand_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, en, train: bool = False):
        # every level patchifies to the same token count; for UCTransNet
        # (img 112-at-level-1, patches 16/8/4/2) this is 49, for SMESwinUnet's
        # mcct (img 112, patches 112/56/28/14) it is 1 token per level
        n_patches = (self.img_size // self.patch_sizes[0]) ** 2
        embs = []
        for i, (x, p, c) in enumerate(zip(en, self.patch_sizes, self.channel_num)):
            embs.append(
                ChannelEmbeddings(
                    p, c, n_patches, self.dtype, name=f"embeddings__{i + 1}"
                )(x)
            )
        embs = CTransEncoder(
            self.channel_num, self.num_layers, self.num_heads, self.expand_ratio,
            self.dtype, name="encoder",
        )(embs)
        outs = []
        for i, (e, x, p, c) in enumerate(
            zip(embs, en, self.patch_sizes, self.channel_num)
        ):
            y = Reconstruct(c, p, self.dtype, name=f"reconstruct__{i + 1}")(e, train)
            outs.append(y + x)
        return outs


class Reconstruct(nn.Module):
    out_channels: int
    scale: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tok, train: bool = False):
        b, n, cc = tok.shape
        hw = int(round(n ** 0.5))
        y = tok.reshape(b, hw, hw, cc)
        y = upsample_nearest(y, self.scale)
        y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv")(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="norm",
        )(y)
        return jax.nn.relu(y)


class CCA(nn.Module):
    f_x: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x):
        # torch names mlp_x.1 / mlp_g.1 (Sequential(Flatten, Linear))
        att_x = nn.Dense(self.f_x, dtype=self.dtype, name="mlp_x_1")(global_avg_pool(x))
        att_g = nn.Dense(self.f_x, dtype=self.dtype, name="mlp_g_1")(global_avg_pool(g))
        scale = jax.nn.sigmoid((att_x + att_g) / 2.0)
        return jax.nn.relu(x * scale[:, None, None, :])


class UpBlockAttention(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        up = upsample_nearest(x, 2)
        skip_att = CCA(skip.shape[-1], self.dtype, name="coatt")(up, skip)
        y = jnp.concatenate([skip_att, up], axis=-1)
        for i in range(2):
            y = ConvBatchNorm(self.out_channels, self.dtype, name=f"nConvs_{i}")(y, train)
        return y


class UCTransNet(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    img_size: int = 224
    base_channel: int = 64
    num_layers: int = 4
    num_heads: int = 4
    final_sigmoid: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        c = self.base_channel
        x = x.astype(dt)

        x1 = ConvBatchNorm(c, dt, name="inc")(x, train)
        x2 = _NConvs(c * 2, 2, dt, name="down1")(max_pool2d(x1, 2), train)
        x3 = _NConvs(c * 4, 2, dt, name="down2")(max_pool2d(x2, 2), train)
        x4 = _NConvs(c * 8, 2, dt, name="down3")(max_pool2d(x3, 2), train)
        x5 = _NConvs(c * 8, 2, dt, name="down4")(max_pool2d(x4, 2), train)

        x1, x2, x3, x4 = ChannelTransformer(
            (c, c * 2, c * 4, c * 8), self.img_size,
            num_layers=self.num_layers, num_heads=self.num_heads, dtype=dt,
            name="mtc",
        )((x1, x2, x3, x4), train)

        y = UpBlockAttention(c * 4, dt, name="up4")(x5, x4, train)
        y = UpBlockAttention(c * 2, dt, name="up3")(y, x3, train)
        y = UpBlockAttention(c, dt, name="up2")(y, x2, train)
        y = UpBlockAttention(c, dt, name="up1")(y, x1, train)

        out_ch = self.n_classes if self.n_classes == 1 else self.n_classes + 1
        logits = nn.Conv(out_ch, (1, 1), dtype=dt, name="outc")(y)
        if self.n_classes == 1 and self.final_sigmoid:
            logits = jax.nn.sigmoid(logits)
        return logits.astype(jnp.float32)
