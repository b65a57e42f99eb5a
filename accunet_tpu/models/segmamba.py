"""SegMamba family: baseline + hybrid variants up to the flagship
text-conditioned Spatial-Mamba model (2D NHWC).

Parity targets:
  * GSC gated spatial conv block (flagship nets/segmamba_hybrid_gsc_KAN_PE_
    ds_CrossAttn_HSLCA_SpatialMamba.py:926-970; same as nets/segmamba.py:91-133)
  * MambaEncoder — stem (1,7,7)/(1,2,2) conv + 3 IN+(1,2,2) downsamples;
    per stage GSC → blocks (flagship :971-1081)
  * stage blocks, selectable per variant:
      - 'tsmamba'  MambaLayer: LN→MDTA→res, LN→fKAN→res, LN→VSSM→res,
        LN→fKAN→res (flagship :718-795)
      - 'tmb'      TransformerMambaBlock with the double-residual wiring
        (flagship :808-895)
      - 'spatial'  SpatialMambaSliceBlock (flagship :897-925)
  * SegMamba assembly — 5 UnetrBasicBlocks, optional HSLCA/TGDC text fusion
    per skip, UnetrUpBlock chain, FinalKANRefine3D, UnetOutBlock main head,
    3 deep-supervision heads upsampled trilinear→(bilinear at depth 1),
    align_corners=False (flagship :1109-1451)
  * nets/segmamba.py baseline — MambaLayer as plain token Mamba + MlpChannel
    stage tails

Everything runs in 2D (the reference wraps 2D inputs with a fake depth of 1;
every conv is (1,k,k), flagship :1323-1325).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.nn.attention import HSLCAFusion, TGDCFusion, TokenMDTA
from accunet_tpu.nn.kan import FKANMLP
from accunet_tpu.nn.ssm import MambaVisionMixer, SpatialMambaBlock
from accunet_tpu.nn.unetr import (
    UnetOutBlock,
    UnetrBasicBlock,
    UnetrUpBlock,
    instance_norm,
)
from accunet_tpu.ops.resize import resize_bilinear

Dtype = Any


class GSC(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels

        def conv(k, name):
            return nn.Conv(c, (k, k), padding="SAME", dtype=self.dtype, name=name)

        x1 = jax.nn.relu(instance_norm(conv(3, "proj")(x)))
        x1 = jax.nn.relu(instance_norm(conv(3, "proj2")(x1)))
        x2 = jax.nn.relu(instance_norm(conv(1, "proj3")(x)))
        y = jax.nn.relu(instance_norm(conv(1, "proj4")(x1 + x2)))
        return y + x


class MambaLayerTS(nn.Module):
    """Tri-oriented 'TSMamba' token block (flagship MambaLayer, :718-795)."""

    dim: int
    num_heads: int = 4
    mlp_ratio: float = 4.0
    d_state: int = 8
    d_conv: int = 3
    expand: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        mlp_dim = int(c * self.mlp_ratio)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(t)
        t = TokenMDTA(c, self.num_heads, self.dtype, name="attn")(y) + t
        t = FKANMLP(c, mlp_dim, self.dtype, name="ffn1")(t, train) + t
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln3")(t)
        t = MambaVisionMixer(
            c, self.d_state, self.d_conv, self.expand, dtype=self.dtype, name="vssm"
        )(y) + t
        t = FKANMLP(c, mlp_dim, self.dtype, name="ffn2")(t, train) + t
        return t.reshape(b, h, w, c)


class TransformerMambaBlock(nn.Module):
    """Double-residual transformer+mamba block (flagship :808-895)."""

    dim: int
    num_heads: int = 4
    mlp_ratio: float = 4.0
    d_state: int = 8
    d_conv: int = 3
    expand: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        x_in = x.reshape(b, h * w, c)
        mlp_dim = int(c * self.mlp_ratio)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)

        t = TokenMDTA(c, self.num_heads, self.dtype, name="attn")(ln("ln1")(x_in)) + x_in
        u = FKANMLP(c, mlp_dim, self.dtype, name="ffn1")(ln("ln2")(t), train) + t
        x_tr = x_in + u
        m = MambaVisionMixer(
            c, self.d_state, self.d_conv, self.expand, dtype=self.dtype, name="vssm"
        )(ln("ln3")(x_tr)) + x_tr
        n = FKANMLP(c, mlp_dim, self.dtype, name="ffn2")(ln("ln4")(m), train) + m
        out = x_tr + n
        return out.reshape(b, h, w, c)


class PlainMambaLayer(nn.Module):
    """Baseline SegMamba MambaLayer (nets/segmamba.py:49-76): norm over
    tokens + Mamba mixer + residual."""

    dim: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(t)
        y = MambaVisionMixer(
            c, self.d_state, self.d_conv, self.expand, dtype=self.dtype, name="mamba"
        )(y)
        return (t + y).reshape(b, h, w, c)


class MlpChannel(nn.Module):
    hidden_size: int
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.mlp_dim, (1, 1), dtype=self.dtype, name="fc1")(x)
        y = jax.nn.gelu(y, approximate=False)
        return nn.Conv(self.hidden_size, (1, 1), dtype=self.dtype, name="fc2")(y)


_BLOCKS = {
    "spatial": lambda dim, dt, name: SpatialMambaBlock(dim, dtype=dt, name=name),
    "tsmamba": lambda dim, dt, name: MambaLayerTS(dim, dtype=dt, name=name),
    "tmb": lambda dim, dt, name: TransformerMambaBlock(dim, dtype=dt, name=name),
    "plain": lambda dim, dt, name: PlainMambaLayer(dim, dtype=dt, name=name),
}


class MambaEncoder(nn.Module):
    in_chans: int = 1
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (48, 96, 192, 384)
    block: str = "spatial"
    use_gsc: bool = True
    stage_mlp: bool = False  # baseline segmamba's per-stage norm+MlpChannel
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i in range(4):
            if i == 0:
                x = nn.Conv(
                    self.dims[0], (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    dtype=self.dtype, name="stem",
                )(x)
            else:
                x = instance_norm(x)
                x = nn.Conv(
                    self.dims[i], (2, 2), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name=f"downsample_{i}",
                )(x)
            if self.use_gsc:
                x = GSC(self.dims[i], self.dtype, name=f"gscs_{i}")(x)
            for d in range(self.depths[i]):
                blk = _BLOCKS[self.block](self.dims[i], self.dtype, f"stages_{i}_{d}")
                x = blk(x) if self.block == "spatial" else blk(x, train)
            if self.stage_mlp:
                x = instance_norm(x)
                x = MlpChannel(self.dims[i], 2 * self.dims[i], self.dtype,
                               name=f"mlps_{i}")(x)
            outs.append(x)
        return tuple(outs)


class SegMamba(nn.Module):
    """SegMamba assembly, parameterized over the hybrid-family axes."""

    in_chans: int = 1
    out_chans: int = 1
    depths: Sequence[int] = (2, 2, 2, 2)
    feat_size: Sequence[int] = (48, 96, 192, 384)
    hidden_size: int = 768
    block: str = "spatial"           # encoder stage block type
    use_gsc: bool = True
    stage_mlp: bool = False
    text_fusion: str | None = "hslca"  # None | 'hslca' | 'tgdc'
    deep_supervision: bool = True
    final_kan_refine: bool = True
    ds_in_output: bool = False  # flagship returns only main (ds heads exist)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, text_tokens=None, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        f = list(self.feat_size)

        outs = MambaEncoder(
            self.in_chans, self.depths, f, self.block, self.use_gsc,
            self.stage_mlp, dt, name="vit",
        )(x, train)

        def fuse(feat, idx_name):
            if self.text_fusion == "hslca":
                return HSLCAFusion(feat.shape[-1], dtype=dt, name=f"hslca{idx_name}")(
                    feat, text_tokens
                )
            if self.text_fusion == "tgdc":
                return TGDCFusion(feat.shape[-1], dtype=dt, name=f"tgdc{idx_name}")(
                    feat, text_tokens
                )
            return feat

        enc1 = UnetrBasicBlock(self.in_chans, f[0], 3, 1, dt, name="encoder1")(x)
        enc1 = fuse(enc1, "1")
        enc2 = UnetrBasicBlock(f[0], f[1], 3, 1, dt, name="encoder2")(outs[0])
        enc2 = fuse(enc2, "2")
        enc3 = UnetrBasicBlock(f[1], f[2], 3, 1, dt, name="encoder3")(outs[1])
        enc3 = fuse(enc3, "3")
        enc4 = UnetrBasicBlock(f[2], f[3], 3, 1, dt, name="encoder4")(outs[2])
        enc4 = fuse(enc4, "4")
        enc_hidden = UnetrBasicBlock(f[3], self.hidden_size, 3, 1, dt, name="encoder5")(
            outs[3]
        )
        enc_hidden = fuse(enc_hidden, "_hidden")

        dec3 = UnetrUpBlock(self.hidden_size, f[3], 3, dt, name="decoder5")(
            enc_hidden, enc4
        )
        dec2 = UnetrUpBlock(f[3], f[2], 3, dt, name="decoder4")(dec3, enc3)
        dec1 = UnetrUpBlock(f[2], f[1], 3, dt, name="decoder3")(dec2, enc2)
        dec0 = UnetrUpBlock(f[1], f[0], 3, dt, name="decoder2")(dec1, enc1)
        out = UnetrBasicBlock(f[0], f[0], 3, 1, dt, name="decoder1")(dec0)

        if self.final_kan_refine:
            b, h, w, c = out.shape
            out = (
                FKANMLP(c, 4 * c, dt, name="final_refine_kan_mlp")(
                    out.reshape(b, h * w, c), train
                ).reshape(b, h, w, c)
            )

        out_main = UnetOutBlock(self.out_chans, dt, name="out")(out)

        if self.deep_supervision and self.ds_in_output:
            target = out_main.shape[1:3]
            ds3 = UnetOutBlock(self.out_chans, dt, name="ds_head3")(dec3)
            ds2 = UnetOutBlock(self.out_chans, dt, name="ds_head2")(dec2)
            ds1 = UnetOutBlock(self.out_chans, dt, name="ds_head1")(dec1)
            ds3 = resize_bilinear(ds3, target, align_corners=False)
            ds2 = resize_bilinear(ds2, target, align_corners=False)
            ds1 = resize_bilinear(ds1, target, align_corners=False)
            return (
                out_main.astype(jnp.float32),
                ds1.astype(jnp.float32),
                ds2.astype(jnp.float32),
                ds3.astype(jnp.float32),
            )
        elif self.deep_supervision:
            # heads exist (parameters) but only main is returned — matches the
            # flagship's shipped forward (:1436-1451)
            UnetOutBlock(self.out_chans, dt, name="ds_head3")(dec3)
            UnetOutBlock(self.out_chans, dt, name="ds_head2")(dec2)
            UnetOutBlock(self.out_chans, dt, name="ds_head1")(dec1)
        return out_main.astype(jnp.float32)


# -------------------------------------------------------- variant registry

VARIANTS = {
    # model_name (train_model.py factory keys) -> constructor kwargs
    "Segmamba": dict(block="plain", use_gsc=False, stage_mlp=True,
                     text_fusion=None, deep_supervision=False,
                     final_kan_refine=False),
    "Segmamba_hybrid": dict(block="tmb", use_gsc=False, text_fusion=None,
                            deep_supervision=False, final_kan_refine=False),
    "Segmamba_hybrid_gsc": dict(block="tmb", text_fusion=None,
                                deep_supervision=False, final_kan_refine=False),
    "Segmamba_hybrid_gsc_KAN_PE": dict(block="tmb", text_fusion=None,
                                       deep_supervision=False,
                                       final_kan_refine=False),
    "Segmamba_hybrid_gsc_KAN_PE_ds": dict(block="tmb", text_fusion=None,
                                          ds_in_output=True,
                                          final_kan_refine=False),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA": dict(
        block="tsmamba", text_fusion="hslca", ds_in_output=True,
        final_kan_refine=False),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_TGDC": dict(
        block="tsmamba", text_fusion="tgdc", ds_in_output=True,
        final_kan_refine=False),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba": dict(
        block="spatial", text_fusion="hslca"),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba_no_text": dict(
        block="spatial", text_fusion=None),
}


def build_segmamba(name: str, in_chans=1, out_chans=1, **overrides):
    kwargs = dict(VARIANTS[name])
    kwargs.update(overrides)
    return SegMamba(in_chans=in_chans, out_chans=out_chans, **kwargs)
