"""CMRF / UNeXt-variant building blocks (flax.linen, NHWC).

Parity targets (all under /root/reference/Experiments/nets/archs/):
  * Conv / DWConv — YOLO-style conv+BN(eps 1e-3, momentum 0.03)+SiLU with
    autopad (TinyU_Net.py:18-45)
  * CMRF — Cascade Multi-Receptive-Fields: 1x1 to c2/N, even/odd channel
    split, chain of N-1 3x3 depthwise convs each feeding the next, first two
    summed, concat → 1x1 back to c2, residual when shapes allow
    (TinyU_Net.py:47-73)
  * ODConv2d — omni-dimensional dynamic conv with channel/filter/spatial/
    kernel attentions (odconv.py:7-140); ODConvBNAct + CMRF_OD
    (TinyU_Net.py:76-130)
  * BSConvU / BSRB / CMRF_BS(+BSRB) — blueprint-separable convs
    (BSDN.py:54-230). NOTE: the reference's CMRF_BS never defines `self.m`
    (BSDN.py:65-69 are commented out) and would crash at forward; here the
    evident intent (a BSConvU chain) is implemented.
  * ChannelSELayer/SpatialSELayer/ChannelSpatialSELayer — CSSE with GELU
    squeeze and max-merge (squeeze_and_excitation.py:20-143)
  * h_sigmoid / InjectionMultiSum / InjectionMultiSumCBR — TopFormer semantic
    injection (Topformer.py:343-420)
  * group_aggregation_bridge — EGE-UNet GAB: 4 dilated grouped convs over
    (high, low, mask) chunks (ege_unet.py:47-93)
  * StaticWaveletPool2d — Haar FWT pooling that keeps the LL band and
    rescales by the global mean ratio (wavelet_pool2d.py:9-102); the
    learnable AdaptiveWaveletPool2d with its orthogonality product-filter
    loss (wavelet_pool2d.py:105-130)
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.ops.pooling import avg_pool2d, global_avg_pool
from accunet_tpu.ops.resize import resize_bilinear

Dtype = Any


class ConvBNAct(nn.Module):
    """TinyU_Net Conv: conv(bias=False) + BN(eps 1e-3, mom 0.03) + GELU
    (TinyU_Net.py:25 default_act = nn.GELU())."""

    c2: int
    k: int = 1
    s: int = 1
    groups: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2
        x = nn.Conv(
            self.c2, (self.k, self.k), strides=(self.s, self.s),
            padding=[(p, p), (p, p)], feature_group_count=self.groups,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=self.dtype, name="bn",
        )(x)
        return jax.nn.gelu(x, approximate=False) if self.act else x


def _cmrf_split_chain(x, m_blocks, train):
    """Even/odd channel split + cascade (TinyU_Net.py:61-72)."""
    parts = [x[..., 0::2], x[..., 1::2]]
    for m in m_blocks:
        parts.append(m(parts[-1], train))
    parts[0] = parts[0] + parts[1]
    parts.pop(1)
    return jnp.concatenate(parts, axis=-1)


class CMRF(nn.Module):
    c1: int
    c2: int
    N: int = 8
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * 0.5 / self.N)
        add = self.shortcut and self.c1 == self.c2
        residual = x
        y = ConvBNAct(self.c2 // self.N, 1, dtype=self.dtype, name="pwconv1")(x, train)
        ms = [
            ConvBNAct(c, 3, groups=c, act=False, dtype=self.dtype, name=f"m_{i}")
            for i in range(self.N - 1)
        ]
        y = _cmrf_split_chain(y, ms, train)
        y = ConvBNAct(self.c2, 1, dtype=self.dtype, name="pwconv2")(y, train)
        return residual + y if add else y


# ------------------------------------------------------------------ ODConv


class ODAttention(nn.Module):
    in_planes: int
    out_planes: int
    kernel_size: int
    groups: int = 1
    reduction: float = 0.0625
    kernel_num: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        att_ch = max(int(self.in_planes * self.reduction), 16)
        s = global_avg_pool(x)[:, None, None, :]  # (B,1,1,C)
        s = nn.Conv(att_ch, (1, 1), use_bias=False, dtype=self.dtype, name="fc")(s)
        s = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(s)
        s = jax.nn.relu(s)

        channel = jax.nn.sigmoid(
            nn.Conv(self.in_planes, (1, 1), dtype=self.dtype, name="channel_fc")(s)
        )  # (B,1,1,Cin)
        dw = self.in_planes == self.groups and self.in_planes == self.out_planes
        flt = (
            1.0
            if dw
            else jax.nn.sigmoid(
                nn.Conv(self.out_planes, (1, 1), dtype=self.dtype, name="filter_fc")(s)
            )
        )
        if self.kernel_size == 1:
            spatial = 1.0
        else:
            sp = nn.Conv(
                self.kernel_size ** 2, (1, 1), dtype=self.dtype, name="spatial_fc"
            )(s)
            # (B, 1, 1, 1, k, k): broadcasts against weight (Kn, O, I/g, k, k)
            spatial = jax.nn.sigmoid(
                sp.reshape(-1, 1, 1, 1, self.kernel_size, self.kernel_size)
            )
        if self.kernel_num == 1:
            kernel = 1.0
        else:
            kn = nn.Conv(self.kernel_num, (1, 1), dtype=self.dtype, name="kernel_fc")(s)
            kernel = jax.nn.softmax(kn.reshape(-1, self.kernel_num, 1, 1, 1, 1), axis=1)
        return channel, flt, spatial, kernel


class ODConv2d(nn.Module):
    in_planes: int
    out_planes: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    reduction: float = 0.0625
    kernel_num: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, g = self.kernel_size, self.groups
        weight = self.param(
            "weight",
            nn.initializers.he_normal(),
            (self.kernel_num, self.out_planes, self.in_planes // g, k, k),
            jnp.float32,
        )
        channel, flt, spatial, kernel = ODAttention(
            self.in_planes, self.out_planes, k, g, self.reduction,
            self.kernel_num, self.dtype, name="attention",
        )(x, train)

        x = x * channel
        # per-sample aggregated kernel: (B, out, in/g, k, k)
        w = weight[None]  # (1, Kn, O, I/g, k, k)
        if isinstance(spatial, jax.Array):
            w = w * spatial  # spatial (B,1,1,1,k,k) aligns (.,Kn,O,I/g,k,k)
        if isinstance(kernel, jax.Array):
            w = w * kernel  # kernel (B,Kn,1,1,1,1)
        w = jnp.sum(w, axis=1)  # (B or 1, O, I/g, k, k)

        # grouped conv with per-sample kernels via vmap
        def conv_one(xi, wi):
            kern = wi.transpose(2, 3, 1, 0).astype(xi.dtype)  # (k,k,I/g,O)
            p = k // 2
            return jax.lax.conv_general_dilated(
                xi[None],
                kern,
                window_strides=(self.stride, self.stride),
                padding=[(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=g,
            )[0]

        out = jax.vmap(conv_one)(x, jnp.broadcast_to(w, (x.shape[0],) + w.shape[1:]))
        if isinstance(flt, jax.Array):
            out = out * flt
        return out


class ODConvBNAct(nn.Module):
    c2: int
    k: int = 3
    groups: int = 1
    act: str = "gelu"  # 'gelu' | 'none'
    reduction: float = 0.0625
    kernel_num: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ODConv2d(
            x.shape[-1], self.c2, self.k, groups=self.groups,
            reduction=self.reduction, kernel_num=self.kernel_num,
            dtype=self.dtype, name="conv",
        )(x, train)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(y)
        return jax.nn.gelu(y, approximate=False) if self.act == "gelu" else y


class CMRF_OD(nn.Module):
    c1: int
    c2: int
    N: int = 8
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * 0.5 / self.N)
        add = self.shortcut and self.c1 == self.c2
        residual = x
        y = ODConvBNAct(self.c2 // self.N, 1, dtype=self.dtype, name="pwconv1")(x, train)
        ms = [
            ODConvBNAct(c, 3, groups=c, act="none", dtype=self.dtype, name=f"m_{i}")
            for i in range(self.N - 1)
        ]
        y = _cmrf_split_chain(y, ms, train)
        y = ODConvBNAct(self.c2, 1, dtype=self.dtype, name="pwconv2")(y, train)
        return residual + y if add else y


# ---------------------------------------------------------------- BSDN


class BSConvU(nn.Module):
    out_channels: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="pw"
        )(x)
        k = self.kernel_size
        p = k // 2
        return nn.Conv(
            self.out_channels, (k, k), padding=[(p, p), (p, p)],
            feature_group_count=self.out_channels, dtype=self.dtype, name="dw",
        )(x)


class BSRB(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = BSConvU(self.out_channels, 3, self.dtype, name="bsconv")(x, train)
        if x.shape[-1] != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="proj"
            )(residual)
        return jax.nn.gelu(out + residual, approximate=False)


class CMRF_BS(nn.Module):
    """CMRF with a BSConvU cascade (reference intent; BSDN.py:54-84 ships
    with `self.m` commented out and cannot run)."""

    c1: int
    c2: int
    N: int = 8
    shortcut: bool = True
    block: str = "bsconv"  # 'bsconv' | 'bsrb'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * 0.5 / self.N)
        add = self.shortcut and self.c1 == self.c2
        residual = x
        y = ConvBNAct(self.c2 // self.N, 1, dtype=self.dtype, name="pwconv1")(x, train)
        if self.block == "bsrb":
            ms = [BSRB(c, self.dtype, name=f"m_{i}") for i in range(self.N - 1)]
        else:
            ms = [BSConvU(c, 3, self.dtype, name=f"m_{i}") for i in range(self.N - 1)]
        y = _cmrf_split_chain(y, ms, train)
        y = ConvBNAct(self.c2, 1, dtype=self.dtype, name="pwconv2")(y, train)
        return residual + y if add else y


# ------------------------------------------------------------------ SE zoo


class ChannelSE2(nn.Module):
    """squeeze_and_excitation.py ChannelSELayer (GELU, reduction 2)."""

    num_channels: int
    reduction_ratio: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = global_avg_pool(x)
        s = jax.nn.gelu(
            nn.Dense(self.num_channels // self.reduction_ratio, dtype=self.dtype, name="fc1")(s),
            approximate=False,
        )
        s = jax.nn.sigmoid(nn.Dense(self.num_channels, dtype=self.dtype, name="fc2")(s))
        return x * s[:, None, None, :]


class SpatialSE(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jax.nn.sigmoid(nn.Conv(1, (1, 1), dtype=self.dtype, name="conv")(x))
        return x * s


class ChannelSpatialSE(nn.Module):
    num_channels: int
    reduction_ratio: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cse = ChannelSE2(self.num_channels, self.reduction_ratio, self.dtype, name="cSE")(x)
        sse = SpatialSE(self.dtype, name="sSE")(x)
        return jnp.maximum(cse, sse)


# ------------------------------------------------------- TopFormer SIM


def h_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class ConvModule(nn.Module):
    """The reference's mmcv-fallback ConvModule (Topformer.py:27-43):
    conv is ALWAYS bias=False; BN when norm_cfg is set; ReLU only when an
    act_cfg is passed — which none of the SIM call sites do, so use_act stays
    False for parity with the shipped code."""

    out_channels: int
    use_bn: bool = True
    use_act: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_channels, (1, 1), use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(x)
        return jax.nn.relu(x) if self.use_act else x


class InjectionMultiSum(nn.Module):
    oup: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_l, x_g, train: bool = False):
        hw = x_l.shape[1:3]
        local_feat = ConvModule(self.oup, True, False, self.dtype, name="local_embedding")(x_l, train)
        gact = ConvModule(self.oup, True, False, self.dtype, name="global_act")(x_g, train)
        sig = resize_bilinear(h_sigmoid(gact), hw, align_corners=False)
        gfeat = ConvModule(self.oup, True, False, self.dtype, name="global_embedding")(x_g, train)
        gfeat = resize_bilinear(gfeat, hw, align_corners=False)
        return local_feat * sig + gfeat


class InjectionMultiSumCBR(nn.Module):
    """Topformer.py:386-414 with the shipped mmcv-fallback ConvModule: the
    embeddings are conv+BN (the 'CBR' docstring notwithstanding — the
    fallback never attaches an activation) and global_act is a bare
    bias-free conv."""

    oup: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_l, x_g, train: bool = False):
        hw = x_l.shape[1:3]
        local_feat = ConvModule(self.oup, True, False, self.dtype, name="local_embedding")(x_l, train)
        gact = ConvModule(self.oup, False, False, self.dtype, name="global_act")(x_g, train)
        sig = resize_bilinear(h_sigmoid(gact), hw, align_corners=False)
        gfeat = ConvModule(self.oup, True, False, self.dtype, name="global_embedding")(x_g, train)
        gfeat = resize_bilinear(gfeat, hw, align_corners=False)
        return local_feat * sig + gfeat


# ------------------------------------------------------------- EGE GAB


class ChannelsFirstLN(nn.Module):
    """ege_unet LayerNorm over the channel axis of NHWC data."""

    dim: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        u = x.mean(axis=-1, keepdims=True)
        s = ((x - u) ** 2).mean(axis=-1, keepdims=True)
        x = (x - u) * jax.lax.rsqrt(s + self.eps)
        return x * weight.astype(x.dtype) + bias.astype(x.dtype)


class GroupAggregationBridge(nn.Module):
    dim_xl: int
    k_size: int = 3
    d_list: Sequence[int] = (1, 2, 5, 7)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xh, xl, mask, train: bool = False):
        xh = nn.Conv(self.dim_xl, (1, 1), dtype=self.dtype, name="pre_project")(xh)
        xh = resize_bilinear(xh, xl.shape[1:3], align_corners=True)
        gsize = self.dim_xl // 2
        xh_chunks = jnp.split(xh, 4, axis=-1)
        xl_chunks = jnp.split(xl, 4, axis=-1)
        outs = []
        for i, d in enumerate(self.d_list):
            t = jnp.concatenate([xh_chunks[i], xl_chunks[i], mask], axis=-1)
            t = ChannelsFirstLN(gsize + 1, dtype=self.dtype, name=f"g{i}_ln")(t)
            pad = (self.k_size + (self.k_size - 1) * (d - 1)) // 2
            t = nn.Conv(
                gsize + 1, (3, 3), padding=[(pad, pad), (pad, pad)],
                kernel_dilation=(d, d), feature_group_count=gsize + 1,
                dtype=self.dtype, name=f"g{i}_conv",
            )(t)
            outs.append(t)
        y = jnp.concatenate(outs, axis=-1)
        y = ChannelsFirstLN(2 * self.dim_xl + 4, dtype=self.dtype, name="tail_ln")(y)
        return nn.Conv(self.dim_xl, (1, 1), dtype=self.dtype, name="tail_conv")(y)


class GHPA(nn.Module):
    """Grouped multi-axis Hadamard Product Attention (EGE-UNet,
    ege_unet.py:94-155): channel-quartered branches gated by learned
    parameter grids resized with align_corners=True along the (H,W), (W,C),
    (H,C) axis pairs plus a depthwise branch, then LN + depthwise mix."""

    dim_in: int
    dim_out: int
    grid: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c4 = self.dim_in // 4
        g = self.grid
        dt = self.dtype

        def dw_gelu_pw(t, name, one_d=False):
            kdims = (3,) if one_d else (3, 3)
            t = nn.Conv(
                c4, kdims, padding="SAME", feature_group_count=c4, dtype=dt,
                name=f"{name}_0",
            )(t)
            t = jax.nn.gelu(t, approximate=False)
            return nn.Conv(c4, (1,) if one_d else (1, 1), dtype=dt, name=f"{name}_2")(t)

        x = ChannelsFirstLN(self.dim_in, dtype=dt, name="norm1")(x)
        x1 = x[..., :c4]
        x2 = x[..., c4 : 2 * c4]
        x3 = x[..., 2 * c4 : 3 * c4]
        x4 = x[..., 3 * c4 :]
        b, h, w, _ = x1.shape

        p_xy = self.param("params_xy", nn.initializers.ones, (1, g, g, c4), jnp.float32)
        gate = resize_bilinear(p_xy.astype(dt), (h, w), align_corners=True)
        x1 = x1 * dw_gelu_pw(gate, "conv_xy")

        # zx: gate varies over (channel, H), broadcast over W — the reference
        # permutes to (B,W,C,H), resizes params (1,1,C,x)->(C,H) and runs the
        # grouped Conv1d along H (ege_unet.py:138-141)
        p_zx = self.param("params_zx", nn.initializers.ones, (1, c4, g, 1), jnp.float32)
        gate = resize_bilinear(p_zx.astype(dt), (c4, h), align_corners=True)  # (1,c4,H,1)
        gate = dw_gelu_pw(gate[:, :, :, 0].transpose(0, 2, 1), "conv_zx", one_d=True)
        # gate (1, H, c4) broadcasts over batch and W
        x2 = x2 * gate[:, :, None, :]

        # zy: gate varies over (channel, W), broadcast over H (:143-146)
        p_zy = self.param("params_zy", nn.initializers.ones, (1, c4, g, 1), jnp.float32)
        gate = resize_bilinear(p_zy.astype(dt), (c4, w), align_corners=True)
        gate = dw_gelu_pw(gate[:, :, :, 0].transpose(0, 2, 1), "conv_zy", one_d=True)
        x3 = x3 * gate[:, None, :, :]

        x4 = nn.Conv(c4, (1, 1), dtype=dt, name="dw_0")(x4)
        x4 = jax.nn.gelu(x4, approximate=False)
        x4 = nn.Conv(
            c4, (3, 3), padding="SAME", feature_group_count=c4, dtype=dt, name="dw_2"
        )(x4)

        y = jnp.concatenate([x1, x2, x3, x4], axis=-1)
        y = ChannelsFirstLN(self.dim_in, dtype=dt, name="norm2")(y)
        y = nn.Conv(
            self.dim_in, (3, 3), padding="SAME", feature_group_count=self.dim_in,
            dtype=dt, name="ldw_0",
        )(y)
        y = jax.nn.gelu(y, approximate=False)
        return nn.Conv(self.dim_out, (1, 1), dtype=dt, name="ldw_2")(y)


# ------------------------------------------------------------- wavelet


def haar_wavelet_pool2d(x):
    """StaticWaveletPool2d(haar, scales=1) (wavelet_pool2d.py:9-102): a
    single-level Haar FWT whose detail bands are dropped leaves the LL band
    (= 2x the 2x2 average), then the output is rescaled by the global mean
    ratio — data-dependent but exactly the reference computation."""
    ll = avg_pool2d(x, 2) * 2.0
    denom = jnp.mean(ll)
    # the reference divides unguarded (NaN for zero-mean maps); guard the
    # degenerate case without changing well-posed results
    rescale = jnp.where(jnp.abs(denom) < 1e-12, 1.0, jnp.mean(x) / denom)
    return ll * rescale


class AdaptiveWaveletPool2d(nn.Module):
    """Learnable single-level wavelet pooling (wavelet_pool2d.py:105-130).

    Faithful to the reference class at its used geometry (filt_len=2,
    scales=1, the StaticWaveletPool2d config every consuming net
    instantiates — AdaptiveWaveletPool2d itself is constructed NOWHERE in
    the reference tree, verified by grep over Experiments/nets):

      * learnable dec_lo/dec_hi filters (Haar init); the analysis conv uses
        the FLIPPED filters (get_filter_tensors(flip=True) +
        cross-correlation = true convolution — wavelet_pool2d.py:131-160),
        which matters once the filters train away from symmetric Haar
      * a learnable per-coefficient scale weight, applied SQUARED
        (forward:'pool_coeffs' * get_scales_weights(), :44-55,82-84); at
        scales=1 the kept coefficient list is [LL] alone so the weight
        cancels in the trailing mean-rescale — it shapes gradients only
      * the detail bands are dropped and the single-LL inverse transform is
        the identity (conv_ifwt_2d loop body never runs for len(coeffs)==1)
      * output = LL * mean(x)/mean(LL)

    `product_filter_loss` is the wavelet_loss() orthogonality regularizer
    (get_wavelet_loss, :123-124). Parity: tests/test_archs_parity_sweep.py
    ::test_adaptive_wavelet_pool_parity (Haar init AND perturbed
    asymmetric filters)."""

    filt_len: int = 2

    @nn.compact
    def __call__(self, x):
        assert self.filt_len == 2, (
            "reference nets only ever pool with 2-tap (Haar-family) "
            "filters; longer banks need the double-pad path"
        )
        inv_sqrt2 = 1.0 / jnp.sqrt(2.0)
        dec_lo = self.param(
            "dec_lo", lambda k, s: jnp.full(s, inv_sqrt2), (self.filt_len,)
        )
        self.param(  # gradient-only at scales=1 (see docstring); kept for
            "scales_weights", nn.initializers.ones, (1,))  # state parity
        self.param(
            "dec_hi",
            lambda k, s: jnp.asarray([inv_sqrt2, -inv_sqrt2]),
            (self.filt_len,),
        )
        lo = dec_lo[::-1]  # flip=True: correlate with the reversed filter
        ll = jnp.einsum("i,j->ij", lo, lo)
        b, h, w, c = x.shape
        # depthwise 2x2 stride-2 conv with the learned LL filter
        kern_dw = ll[:, :, None, None] * jnp.ones((1, 1, 1, c))
        out = jax.lax.conv_general_dilated(
            x, kern_dw.astype(x.dtype), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )
        rescale = jnp.mean(x) / jnp.mean(out)
        return out * rescale

    @staticmethod
    def product_filter_loss(dec_lo, dec_hi):
        """Orthogonality product-filter condition for perfect reconstruction."""
        p_lo = jnp.convolve(dec_lo, dec_lo[::-1])
        p_hi = jnp.convolve(dec_hi, dec_hi[::-1])
        p = p_lo + p_hi
        target = jnp.zeros_like(p).at[p.shape[0] // 2].set(2.0)
        return jnp.sum((p - target) ** 2)
