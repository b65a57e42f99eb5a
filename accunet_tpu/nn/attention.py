"""Attention and text-fusion blocks for the SegMamba hybrid family (NHWC).

Parity targets (flagship
/root/reference/Experiments/nets/segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba.py):
  * Attention / TokenMDTA — Multi-DConv-Head Transposed Attention: 1x1 qkv +
    3x3 depthwise, L2-normalized channel-by-channel attention (C x C, not
    N x N) with learnable per-head temperature (:455-505)
  * HSLCA — Hierarchical Summary Linear Cross Attention: text → K summary
    tokens via softmax soft-clustering over the token axis, phi(x)=elu+1
    unnormalized linear attention (K·V first → O(N+L)), KAN-gated residual
    fusion, final LayerNorm (:214-323)
  * HSLCAFusion — project text 768→C, LN both modalities, run HSLCA over
    flattened image tokens (:325-380)
  * TGDC / TGDCFusion — text-guided dynamic conv: pooled text → softmax over
    K depthwise conv branches, two gated-fusion passes with shared weights,
    gamma·LN, residual (:98-208)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.nn.kan import KAN

Dtype = Any


class ExternalAttention(nn.Module):
    """External attention with shared memory units
    (/root/reference/Experiments/nets/mcct.py:26-55): Mk → softmax over the
    token axis → L1-normalize over memory slots → Mv. Used by SMESwinUnet."""

    d_model: int
    s: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, queries):
        attn = nn.Dense(self.s, use_bias=False, dtype=self.dtype, name="mk")(queries)
        attn = jax.nn.softmax(attn, axis=1)
        attn = attn / (attn.sum(axis=2, keepdims=True))
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="mv")(attn)


class MDTAAttention(nn.Module):
    """Channel-wise transposed attention over a 2D feature map (B,H,W,C)."""

    dim: int
    num_heads: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = self.num_heads
        ch = c // heads
        temperature = self.param(
            "temperature", nn.initializers.ones, (heads, 1, 1), jnp.float32
        )
        qkv = nn.Conv(3 * c, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="qkv")(x)
        qkv = nn.Conv(
            3 * c, (3, 3), padding="SAME", feature_group_count=3 * c,
            use_bias=self.use_bias, dtype=self.dtype, name="qkv_dwconv",
        )(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            # (B,H,W,C) -> (B, heads, ch, HW): channel-major like the
            # reference's '(head c) h w -> head c (h w)'
            t = t.reshape(b, h * w, heads, ch)
            return t.transpose(0, 2, 3, 1)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k) * temperature.astype(q.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        return nn.Conv(
            c, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="project_out"
        )(out)


class TokenMDTA(nn.Module):
    """MDTA over a square token sequence (B, N, C) (flagship :488-505)."""

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hw = int(round(n ** 0.5))
        assert hw * hw == n, "token count must be a perfect square"
        y = MDTAAttention(self.dim, self.num_heads, True, self.dtype, name="inner")(
            x.reshape(b, hw, hw, c)
        )
        return y.reshape(b, n, c)


class HSLCA(nn.Module):
    dim: int
    num_heads: int = 4
    num_summary_tokens: int = 4
    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_tokens, text_tokens):
        b, n, c = image_tokens.shape
        heads, hd = self.num_heads, self.dim // self.num_heads

        scores = nn.Dense(self.num_summary_tokens, dtype=self.dtype, name="summary_proj")(
            text_tokens
        )
        weights = jax.nn.softmax(scores, axis=1)  # soft-cluster over tokens
        summary = jnp.einsum("blk,blc->bkc", weights, text_tokens)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], heads, hd).transpose(0, 2, 1, 3)

        q = split_heads(nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(image_tokens))
        k = split_heads(nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(summary))
        v = split_heads(nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(summary))

        phi = lambda t: jax.nn.elu(t) + 1
        q, k = phi(q), phi(k)
        kv = jnp.einsum("bhkd,bhke->bhde", k, v)
        attn = jnp.einsum("bhnd,bhde->bhne", q, kv)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, c)
        attn = nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(attn)

        gate_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="gate_norm")(
            attn.mean(axis=1)
        )
        hidden = self.dim // self.reduction
        alpha = KAN((self.dim, hidden, self.dim), dtype=self.dtype, name="gate_kan")(gate_in)
        alpha = jax.nn.sigmoid(alpha)[:, None, :]
        fused = image_tokens + alpha * attn
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(fused)


class HSLCAFusion(nn.Module):
    """Fuse text into an NHWC feature map via HSLCA (flagship :325-380)."""

    img_dim: int
    text_dim: int = 768
    num_heads: int = 4
    num_summary_tokens: int = 4
    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, text_tokens):
        if text_tokens is None:
            return x
        b, h, w, c = x.shape
        v = x.reshape(b, h * w, c)
        t = nn.Dense(self.img_dim, dtype=self.dtype, name="text_proj")(text_tokens)
        v = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_img")(v)
        t = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_txt")(t)
        fused = HSLCA(
            self.img_dim, self.num_heads, self.num_summary_tokens, self.reduction,
            self.dtype, name="hslca",
        )(v, t)
        return fused.reshape(b, h, w, c)


class TorchMultiheadAttention(nn.Module):
    """Softmax multi-head attention with torch ``nn.MultiheadAttention``
    parameterization (packed in_proj for q/k/v + out_proj), batch_first.

    Used by the CrossAttn/Dual text-fusion variants, which call
    ``nn.MultiheadAttention(embed_dim, num_heads, batch_first=True)`` AFTER
    their own q/k/v projections (nets/segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn.py:
    72-122) — the double projection is a reference quirk kept for parity."""

    embed_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        e, heads = self.embed_dim, self.num_heads
        hd = e // heads
        in_proj_weight = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * e, e), jnp.float32
        )
        in_proj_bias = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * e,), jnp.float32
        )
        w = in_proj_weight.astype(q.dtype)
        bias = in_proj_bias.astype(q.dtype)
        q = q @ w[:e].T + bias[:e]
        k = k @ w[e : 2 * e].T + bias[e : 2 * e]
        v = v @ w[2 * e :].T + bias[2 * e :]

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(
            jnp.asarray(hd, q.dtype)
        )
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(q.shape[0], -1, e)
        return nn.Dense(e, dtype=self.dtype, name="out_proj")(out)


class SkipFiLM(nn.Module):
    """FiLM conditioning of a skip feature map on a pooled text embedding:
    x*(1+gamma(t)) + beta(t) (nets/segmamba_hybrid_gsc_KAN_PE_ds_text.py:55-71).
    The reference's text encoder mean-pools tokens to (B,768) (:29-53); a
    (B,T,768) input is pooled here for the same effect."""

    channels: int
    text_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, text):
        if text is None:
            return x
        if text.ndim == 3:
            text = text.mean(axis=1)
        gamma = nn.Dense(self.channels, dtype=self.dtype, name="gamma")(text)
        beta = nn.Dense(self.channels, dtype=self.dtype, name="beta")(text)
        gamma = gamma[:, None, None, :]
        beta = beta[:, None, None, :]
        return x * (1 + gamma) + beta


class CrossAttentionFusion(nn.Module):
    """Image←text cross attention over flattened tokens with residual
    (nets/segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn.py:72-122)."""

    img_dim: int
    text_dim: int = 768
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, text_tokens):
        if text_tokens is None:
            return x
        b, h, w, c = x.shape
        tok = x.reshape(b, h * w, c)
        xi = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_img")(tok)
        t = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_txt")(text_tokens)
        q = nn.Dense(self.img_dim, dtype=self.dtype, name="q_proj")(xi)
        k = nn.Dense(self.img_dim, dtype=self.dtype, name="k_proj")(t)
        v = nn.Dense(self.img_dim, dtype=self.dtype, name="v_proj")(t)
        out = TorchMultiheadAttention(
            self.img_dim, self.num_heads, self.dtype, name="attn"
        )(q, k, v)
        out = xi + nn.Dense(self.img_dim, dtype=self.dtype, name="out_proj")(out)
        return out.reshape(b, h, w, c)


class DualCrossAttentionFusion(nn.Module):
    """Bidirectional cross attention: image←text then text←image, threading
    the updated text forward (nets/..._ds_CrossAttn_Dual.py:149-250).
    Returns (fused_image, updated_text)."""

    img_dim: int
    text_dim: int = 768
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, text_tokens):
        if text_tokens is None:
            return x, text_tokens
        b, h, w, c = x.shape
        img = x.reshape(b, h * w, c)

        xi = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_img1")(img)
        t1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_txt1")(text_tokens)
        q = nn.Dense(self.img_dim, dtype=self.dtype, name="q_img")(xi)
        k = nn.Dense(self.img_dim, dtype=self.dtype, name="k_txt")(t1)
        v = nn.Dense(self.img_dim, dtype=self.dtype, name="v_txt")(t1)
        img_out = TorchMultiheadAttention(
            self.img_dim, self.num_heads, self.dtype, name="attn_img_to_txt"
        )(q, k, v)
        img = img + nn.Dense(self.img_dim, dtype=self.dtype, name="out_img")(img_out)

        t2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_txt2")(text_tokens)
        xi2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_img2")(img)
        qt = nn.Dense(self.text_dim, dtype=self.dtype, name="q_txt")(t2)
        kt = nn.Dense(self.text_dim, dtype=self.dtype, name="k_img")(xi2)
        vt = nn.Dense(self.text_dim, dtype=self.dtype, name="v_img")(xi2)
        txt_out = TorchMultiheadAttention(
            self.text_dim, self.num_heads, self.dtype, name="attn_txt_to_img"
        )(qt, kt, vt)
        text_tokens = text_tokens + nn.Dense(
            self.text_dim, dtype=self.dtype, name="out_txt"
        )(txt_out)
        return img.reshape(b, h, w, c), text_tokens


class ChannelAttention(nn.Module):
    """Global-pool → conv1x1 squeeze → ReLU → conv1x1 → sigmoid channel scale
    (nets/segmamba_hybrid_gsc_CA.py:373-388, ChannelAttention3D with D=1)."""

    num_feat: int
    squeeze_factor: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.Conv(
            max(1, self.num_feat // self.squeeze_factor), (1, 1), dtype=self.dtype,
            name="squeeze",
        )(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.num_feat, (1, 1), dtype=self.dtype, name="expand")(y)
        return x * jax.nn.sigmoid(y)


class CAB(nn.Module):
    """Conv channel-attention block: 3x3 conv → GELU → 3x3 conv → channel
    attention (nets/segmamba_hybrid_gsc_CA.py:390-443, non-light path with
    (1,3,3) kernels at D=1; squeeze_factor=30, compress_ratio=3)."""

    num_feat: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = max(1, self.num_feat // self.compress_ratio)
        y = nn.Conv(mid, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Conv(
            self.num_feat, (3, 3), padding="SAME", dtype=self.dtype, name="conv2"
        )(y)
        return ChannelAttention(
            self.num_feat, self.squeeze_factor, self.dtype, name="ca"
        )(y)


class TGDC(nn.Module):
    dim: int
    num_filters: int = 4
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, v_tokens, t_tokens):
        b, n, c = v_tokens.shape
        k = self.num_filters
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)

        pooled = t_tokens.mean(axis=1)
        wgt = nn.Dense(self.dim, dtype=self.dtype, name="mlp_0")(pooled)
        wgt = nn.Dense(k, dtype=self.dtype, name="mlp_2")(jax.nn.relu(wgt))
        wgt = jax.nn.softmax(wgt, axis=-1)

        convs = [
            nn.Conv(
                c, (self.kernel_size,), padding="SAME", feature_group_count=c,
                dtype=self.dtype, name=f"convs_{i}",
            )
            for i in range(k)
        ]

        def fusion(x):
            fused = 0.0
            for i, conv in enumerate(convs):
                fused = fused + wgt[:, i][:, None, None] * conv(x)
            return fused

        ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        f1 = gamma.astype(v_tokens.dtype) * ln(fusion(v_tokens))
        f2 = gamma.astype(v_tokens.dtype) * ln(fusion(f1))
        return f2 + v_tokens


class TGDCFusion(nn.Module):
    img_dim: int
    text_dim: int = 768
    num_filters: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, text_tokens):
        if text_tokens is None:
            return x
        b, h, w, c = x.shape
        v = x.reshape(b, h * w, c)
        t = nn.Dense(self.img_dim, dtype=self.dtype, name="text_proj")(text_tokens)
        fused = TGDC(self.img_dim, self.num_filters, dtype=self.dtype, name="tgdc")(v, t)
        return fused.reshape(b, h, w, c)
