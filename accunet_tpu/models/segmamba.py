"""SegMamba family: baseline + the full hybrid ablation ladder up to the
flagship text-conditioned Spatial-Mamba model (2D NHWC).

Parity targets:
  * GSC gated spatial conv block (flagship nets/segmamba_hybrid_gsc_KAN_PE_
    ds_CrossAttn_HSLCA_SpatialMamba.py:926-970; same as nets/segmamba.py:91-133)
  * MambaEncoder — stem (1,7,7)/(1,2,2) conv + 3 IN+(1,2,2) downsamples;
    per stage GSC → blocks (flagship :971-1081)
  * TransformerMambaBlock — the shared double-residual hybrid block
    (nets/segmamba_hybrid_gsc_KAN_PE_ds.py:453-578), parameterized over the
    reference's ablation axes:
      attn:  'mdta' TokenMDTA | 'window' Swin WindowAttention
             (…_gsc_SWAttn.py:407-563)
      ffn1:  'fkan' FKANMLP | 'simple_mlp' SimpleTokenMLP (…_gsc_MLP_PE_ds.py:55)
      ffn2:  'fkan' | 'token_mlp' TokenMLP (…_gsc_rm_fkan.py:373-395)
             | 'simple_mlp' | 'effkan' ConvKANFFN2D (…_KAN_PE_EffKan.py:374-486)
             | 'cab' CAB channel-attention (…_gsc_CA.py:390-523, no ln4)
      mixer: 'mamba' MambaVisionMixer | 'ss2d' TokenVSSM (…_gsc_vss.py:367-720)
      spatial_fusion: dilated-dwconv fusion of scan maps (…_ds_SPATIAL.py:147)
      flip_order: mamba-half first, then attention-half (…_KAN_PE_ds_flip.py:
                  453-578 — same parameters, swapped execution order)
  * stage blocks: 'tmb' (all non-SpatialMamba hybrids), 'spatial'
    SpatialMambaSliceBlock (flagship :897-925), 'spatial_kan'
    (…HSLCA_SpatialMamba_KAN.py + spatialmamba.py:428-), 'plain' baseline
  * text fusion: 'film' SkipFiLM (…_ds_text.py:55-71, 4 skip sites),
    'crossattn' CrossAttentionFusion (…_ds_CrossAttn.py:72-122, 4 sites),
    'dual' DualCrossAttentionFusion threading updated text (…_Dual.py:149-250,
    5 sites), 'tgdc' (4 sites), 'hslca' (5 sites incl. hidden)
  * SegMamba assembly — 5 UnetrBasicBlocks, per-skip text fusion, UnetrUpBlock
    chain, FinalKANRefine3D ('fkan' or 'simple_mlp' for MLP_PE), UnetOutBlock
    main head, 3 deep-supervision heads upsampled align_corners=False
    (flagship :1109-1451); `ds_in_output` mirrors each reference file's actual
    return statement (some _ds files return only the main head)
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

from accunet_tpu.nn.attention import (
    CAB,
    CrossAttentionFusion,
    DualCrossAttentionFusion,
    HSLCAFusion,
    SkipFiLM,
    TGDCFusion,
    TokenMDTA,
)
from accunet_tpu.nn.kan import FKANMLP, KAN
from accunet_tpu.nn.ss2d import SS2D
from accunet_tpu.nn.ssm import BiMamba, MambaVisionMixer, SpatialMambaBlock
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


class TokenMLP(nn.Module):
    """Plain token MLP, no internal norm (…_gsc_rm_fkan.py:373-395)."""

    dim: int
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(x)
        y = jax.nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class SimpleTokenMLP(nn.Module):
    """LayerNorm + token MLP (…_gsc_MLP_PE_ds.py:55-114)."""

    dim: int
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class ConvKANFFN2D(nn.Module):
    """Efficient-KAN FFN: conv3x3 x2 → LN → KAN → dwconv3x3 → KAN → dwconv3x3
    + residual from after the LN (…_KAN_PE_EffKan.py:374-486)."""

    dim: int
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        hw = int(round(n ** 0.5))
        gelu = lambda t: jax.nn.gelu(t, approximate=False)

        def to2d(t):
            return t.reshape(b, hw, hw, c)

        def totok(t):
            return t.reshape(b, n, c)

        y = to2d(x)
        y = gelu(nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(y))
        y = gelu(nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(y))
        y = totok(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="post_conv_ln")(y)
        res = y

        y = KAN((c, self.mlp_dim, c), dtype=self.dtype, name="kan1")(
            y.reshape(b * n, c)
        ).reshape(b, n, c)
        y = to2d(y)
        y = gelu(
            nn.Conv(
                c, (3, 3), padding="SAME", feature_group_count=c,
                dtype=self.dtype, name="dwconv1",
            )(y)
        )
        y = totok(y)
        y = KAN((c, self.mlp_dim, c), dtype=self.dtype, name="kan2")(
            y.reshape(b * n, c)
        ).reshape(b, n, c)
        y = to2d(y)
        y = gelu(
            nn.Conv(
                c, (3, 3), padding="SAME", feature_group_count=c,
                dtype=self.dtype, name="dwconv2",
            )(y)
        )
        return totok(y) + res


class WindowTokenAttention(nn.Module):
    """Swin window attention over square tokens (…_gsc_SWAttn.py:407-563)."""

    dim: int
    num_heads: int
    window_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from accunet_tpu.models.swin_unet import (
            WindowAttention,
            window_partition,
            window_reverse,
        )

        b, n, c = x.shape
        hw = int(round(n ** 0.5))
        ws = self.window_size
        x2d = x.reshape(b, hw, hw, c)
        wins = window_partition(x2d, ws).reshape(-1, ws * ws, c)
        wins = WindowAttention(self.dim, ws, self.num_heads, dtype=self.dtype,
                               name="inner")(wins, None)
        x2d = window_reverse(wins.reshape(-1, ws, ws, c), ws, hw, hw)
        return x2d.reshape(b, n, c)


class TokenVSSM(nn.Module):
    """VSSMBlock on square tokens: top branch Linear→DWConv→SiLU→SS2D→LN,
    bottom Linear→SiLU, concat → Linear (…_gsc_vss.py:593-720)."""

    dim: int
    d_state: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hw = int(round(n ** 0.5))
        x2d = x.reshape(b, hw, hw, c)
        t = nn.Dense(c, dtype=self.dtype, name="top_linear")(x2d)
        t = nn.Conv(
            c, (3, 3), padding="SAME", feature_group_count=c,
            dtype=self.dtype, name="top_dwconv",
        )(t)
        t = jax.nn.silu(t)
        t = SS2D(c, d_state=self.d_state, dtype=self.dtype, name="top_ssm")(t)
        t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="top_norm")(t)
        bot = jax.nn.silu(nn.Dense(c, dtype=self.dtype, name="bottom_linear")(x2d))
        y = jnp.concatenate([t, bot], axis=-1)
        y = nn.Dense(c, dtype=self.dtype, name="out_linear")(y)
        return y.reshape(b, n, c)


def _make_ffn(kind, dim, mlp_dim, dtype, name):
    if kind == "fkan":
        return FKANMLP(dim, mlp_dim, dtype, name=name)
    if kind == "token_mlp":
        return TokenMLP(dim, mlp_dim, dtype, name=name)
    if kind == "simple_mlp":
        return SimpleTokenMLP(dim, mlp_dim, dtype, name=name)
    if kind == "effkan":
        return ConvKANFFN2D(dim, mlp_dim, dtype, name=name)
    raise ValueError(f"unknown ffn kind {kind!r}")


class TransformerMambaBlock(nn.Module):
    """Double-residual transformer+mamba block (…_KAN_PE_ds.py:453-578),
    parameterized over the reference ablation axes (module docstring)."""

    dim: int
    num_heads: int = 4
    mlp_ratio: float = 4.0
    d_state: int = 8
    d_conv: int = 3
    expand: int = 1
    attn_type: str = "mdta"      # 'mdta' | 'window'
    ffn1_type: str = "fkan"      # 'fkan' | 'simple_mlp'
    ffn2_type: str = "fkan"      # 'fkan'|'token_mlp'|'simple_mlp'|'effkan'|'cab'
    mixer_type: str = "mamba"    # 'mamba' | 'ss2d'
    spatial_fusion: bool = False
    flip_order: bool = False
    # the earliest rung (segmamba_hybrid.py:677-729) omits the two inner
    # f-KAN residuals (`u = u + t`, `n = n + m`) that every later rung has
    # (…_gsc.py TMB forward); whole-model parity sweep caught the difference
    inner_residuals: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        x_in = x.reshape(b, h * w, c)
        mlp_dim = int(c * self.mlp_ratio)
        dt = self.dtype
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=dt, name=name)

        if self.attn_type == "window":
            attn = WindowTokenAttention(c, self.num_heads, dtype=dt, name="attn")
        else:
            attn = TokenMDTA(c, self.num_heads, dt, name="attn")
        ffn1 = _make_ffn(self.ffn1_type, c, mlp_dim, dt, "ffn1")
        if self.mixer_type == "ss2d":
            mixer = TokenVSSM(c, self.d_state, dtype=dt, name="vssm")
            run_mixer = lambda t: mixer(t)
        else:
            mixer = MambaVisionMixer(
                c, self.d_state, self.d_conv, self.expand,
                spatial_fusion=self.spatial_fusion, dtype=dt, name="vssm",
            )
            run_mixer = lambda t: mixer(t, spatial_hw=(h, w))

        def attn_half(t):
            """ln1 → attn → res; ln2 → ffn1 → res (transformer half)."""
            a = attn(ln("ln1")(t)) + t
            u = ffn1(ln("ln2")(a), train)
            return u + a if self.inner_residuals else u

        def mamba_half(t):
            """ln3 → mixer → res; then ffn2 ('cab' replaces ln4+ffn2 with a
            conv channel-attention block, …_gsc_CA.py TMB diff)."""
            m = run_mixer(ln("ln3")(t)) + t
            if self.ffn2_type == "cab":
                m2d = m.reshape(b, h, w, c)
                cab = CAB(c, dtype=dt, name="cab")(m2d).reshape(b, h * w, c)
                return cab + m
            ffn2 = _make_ffn(self.ffn2_type, c, mlp_dim, dt, "ffn2")
            n = ffn2(ln("ln4")(m), train)
            return n + m if self.inner_residuals else n

        if self.flip_order:
            # _flip variant: mamba half first, then the attention half —
            # identical parameters, swapped execution (…_KAN_PE_ds_flip.py)
            u = mamba_half(x_in)
            x_tr = x_in + u
            n = attn_half(x_tr)
        else:
            u = attn_half(x_in)
            x_tr = x_in + u
            n = mamba_half(x_tr)
        out = x_tr + n
        return out.reshape(b, h, w, c)


class PlainMambaLayer(nn.Module):
    """Baseline SegMamba MambaLayer (nets/segmamba.py:49-76): norm over
    tokens + bimamba-v2 Mamba mixer + residual. The reference instantiates
    ``Mamba(d_model=dim, d_state=16, d_conv=4, expand=2, bimamba_type="v2")``
    — forward + time-flipped backward scans with separate parameter sets
    (nn/ssm.py:BiMamba, oracle parity in tests/test_bimamba_parity.py)."""

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
        y = BiMamba(
            c, self.d_state, self.d_conv, self.expand, dtype=self.dtype,
            name="mamba",
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


class MambaEncoder(nn.Module):
    in_chans: int = 1
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (48, 96, 192, 384)
    block: str = "spatial"  # 'tmb' | 'spatial' | 'spatial_kan' | 'plain'
    block_kwargs: dict | None = None  # TransformerMambaBlock axes
    use_gsc: bool = True
    stage_mlp: bool = False  # baseline segmamba's per-stage norm+MlpChannel
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bkw = dict(self.block_kwargs or {})
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
                name = f"stages_{i}_{d}"
                if self.block == "spatial":
                    x = SpatialMambaBlock(self.dims[i], dtype=self.dtype, name=name)(x)
                elif self.block == "spatial_kan":
                    x = SpatialMambaBlock(
                        self.dims[i], mlp_type="kan", dtype=self.dtype, name=name
                    )(x)
                elif self.block == "plain":
                    x = PlainMambaLayer(self.dims[i], dtype=self.dtype, name=name)(
                        x, train
                    )
                else:
                    x = TransformerMambaBlock(
                        self.dims[i], dtype=self.dtype, name=name, **bkw
                    )(x, train)
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
    block_kwargs: dict | None = None  # TransformerMambaBlock ablation axes
    use_gsc: bool = True
    stage_mlp: bool = False
    # None | 'hslca' | 'tgdc' | 'film' | 'crossattn' | 'dual'
    text_fusion: str | None = "hslca"
    # whether the bottleneck is fused too; None = family default (hslca and
    # dual fuse hidden, film/crossattn/tgdc do not). The Dual_SpatialMamba
    # rung ships its dual_ca_hidden commented out (…_Dual_SpatialMamba.py:
    # 1326,1500) while plain _Dual fuses it (…_Dual.py:1397,1548).
    text_fusion_hidden: bool | None = None
    deep_supervision: bool = True
    final_refine: str | None = "fkan"  # None | 'fkan' | 'simple_mlp'
    ds_in_output: bool = False  # True only where the reference returns the tuple
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, text_tokens=None, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        f = list(self.feat_size)

        outs = MambaEncoder(
            self.in_chans, self.depths, f, self.block, self.block_kwargs,
            self.use_gsc, self.stage_mlp, dt, name="vit",
        )(x, train)

        # fusion sites per variant: film/crossattn/tgdc fuse the 4 encoder
        # skips only; hslca/dual also fuse the hidden bottleneck (see each
        # reference file's forward — e.g. CrossAttn:1098-1117, HSLCA:1305-1327)
        text = text_tokens

        def fuse(feat, idx_name, is_hidden=False):
            nonlocal text
            tf = self.text_fusion
            if tf is None or text is None:
                return feat
            if is_hidden:
                fuse_hidden = self.text_fusion_hidden
                if fuse_hidden is None:
                    fuse_hidden = tf in ("hslca", "dual")
                if not fuse_hidden:
                    return feat
            cdim = feat.shape[-1]
            if tf == "hslca":
                return HSLCAFusion(cdim, dtype=dt, name=f"hslca{idx_name}")(feat, text)
            if tf == "tgdc":
                return TGDCFusion(cdim, dtype=dt, name=f"tgdc{idx_name}")(feat, text)
            if tf == "film":
                return SkipFiLM(cdim, dtype=dt, name=f"skip_film{idx_name}")(feat, text)
            if tf == "crossattn":
                return CrossAttentionFusion(cdim, dtype=dt, name=f"cross_attn{idx_name}")(
                    feat, text
                )
            if tf == "dual":
                feat, text = DualCrossAttentionFusion(
                    cdim, dtype=dt, name=f"dual_ca{idx_name}"
                )(feat, text)
                return feat
            raise ValueError(f"unknown text_fusion {tf!r}")

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
        enc_hidden = fuse(enc_hidden, "_hidden", is_hidden=True)

        dec3 = UnetrUpBlock(self.hidden_size, f[3], 3, dt, name="decoder5")(
            enc_hidden, enc4
        )
        dec2 = UnetrUpBlock(f[3], f[2], 3, dt, name="decoder4")(dec3, enc3)
        dec1 = UnetrUpBlock(f[2], f[1], 3, dt, name="decoder3")(dec2, enc2)
        dec0 = UnetrUpBlock(f[1], f[0], 3, dt, name="decoder2")(dec1, enc1)
        out = UnetrBasicBlock(f[0], f[0], 3, 1, dt, name="decoder1")(dec0)

        if self.final_refine is not None:
            b, h, w, c = out.shape
            tok = out.reshape(b, h * w, c)
            if self.final_refine == "simple_mlp":
                # MLP_PE variant's FinalKANRefine3D holds a SimpleTokenMLP
                # under the same attribute name (…_gsc_MLP_PE_ds.py:754-781)
                tok = SimpleTokenMLP(c, 4 * c, dt, name="final_refine_kan_mlp")(
                    tok, train
                )
            else:
                tok = FKANMLP(c, 4 * c, dt, name="final_refine_kan_mlp")(tok, train)
            out = tok.reshape(b, h, w, c)

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
            # heads exist (parameters) but only main is returned — matches
            # e.g. the flagship's and _KAN_PE_ds's shipped forwards
            UnetOutBlock(self.out_chans, dt, name="ds_head3")(dec3)
            UnetOutBlock(self.out_chans, dt, name="ds_head2")(dec2)
            UnetOutBlock(self.out_chans, dt, name="ds_head1")(dec1)
        return out_main.astype(jnp.float32)


# -------------------------------------------------------- variant registry

_NO_EXTRAS = dict(text_fusion=None, deep_supervision=False, final_refine=None)

VARIANTS = {
    # model_name (train_model.py factory keys :351-640, incl. the commented
    # ablation rungs) -> constructor kwargs. ds_in_output mirrors each
    # reference file's actual return statement.
    "Segmamba": dict(block="plain", use_gsc=False, stage_mlp=True, **_NO_EXTRAS),
    "Segmamba_hybrid": dict(
        block="tmb", use_gsc=False,
        block_kwargs=dict(inner_residuals=False), **_NO_EXTRAS),
    "Segmamba_hybrid_gsc": dict(block="tmb", **_NO_EXTRAS),
    "Segmamba_hybrid_gsc_CA": dict(
        block="tmb", block_kwargs=dict(ffn2_type="cab"), **_NO_EXTRAS),
    "Segmamba_hybrid_gsc_SWAttn": dict(
        block="tmb", block_kwargs=dict(attn_type="window"), **_NO_EXTRAS),
    "Segmamba_hybrid_gsc_VSS": dict(
        block="tmb", block_kwargs=dict(mixer_type="ss2d"), **_NO_EXTRAS),
    "Segmamba_hybrid_gsc_rm_fkan": dict(
        block="tmb", block_kwargs=dict(ffn2_type="token_mlp"), **_NO_EXTRAS),
    "Segmamba_hybrid_gsc_ds": dict(
        block="tmb", text_fusion=None, final_refine=None, ds_in_output=True),
    "Segmamba_hybrid_gsc_KAN_PE": dict(
        block="tmb", text_fusion=None, deep_supervision=False),
    "Segmamba_hybrid_gsc_KAN_PE_rm_fkan": dict(
        block="tmb", block_kwargs=dict(ffn2_type="token_mlp"),
        text_fusion=None, deep_supervision=False),
    "Segmamba_hybrid_gsc_KAN_PE_rm_fkan_ds": dict(
        block="tmb", block_kwargs=dict(ffn2_type="token_mlp"),
        text_fusion=None, ds_in_output=True),
    "segmamba_hybrid_gsc_KAN_PE_EffKan": dict(
        block="tmb", block_kwargs=dict(ffn2_type="effkan"),
        text_fusion=None, deep_supervision=False),
    "Segmamba_hybrid_gsc_KAN_PE_ds": dict(block="tmb", text_fusion=None),
    "Segmamba_hybrid_gsc_KAN_PE_ds_flip": dict(
        block="tmb", block_kwargs=dict(flip_order=True),
        text_fusion=None, ds_in_output=True),
    "Segmamba_hybrid_gsc_KAN_PE_ds_SPATIAL": dict(
        block="tmb", block_kwargs=dict(spatial_fusion=True),
        text_fusion=None, ds_in_output=True),
    "Segmamba_hybrid_gsc_MLP_PE_ds": dict(
        block="tmb", block_kwargs=dict(ffn1_type="simple_mlp", ffn2_type="simple_mlp"),
        text_fusion=None, final_refine="simple_mlp"),
    "Segmamba_hybrid_gsc_KAN_PE_ds_text": dict(block="tmb", text_fusion="film"),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn": dict(
        block="tmb", text_fusion="crossattn"),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_TGDC": dict(
        block="tmb", text_fusion="tgdc"),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA": dict(
        block="tmb", text_fusion="hslca", ds_in_output=True),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_Dual": dict(
        block="tmb", text_fusion="dual", ds_in_output=True),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_SpatialMamba": dict(
        block="spatial", text_fusion="crossattn", ds_in_output=True),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_Dual_SpatialMamba": dict(
        block="spatial", text_fusion="dual", text_fusion_hidden=False,
        ds_in_output=True),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba": dict(
        block="spatial", text_fusion="hslca"),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba_KAN": dict(
        block="spatial_kan", text_fusion="hslca"),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba_no_text": dict(
        block="spatial", text_fusion=None, ds_in_output=True),
}


def build_segmamba(name: str, in_chans=1, out_chans=1, **overrides):
    kwargs = dict(VARIANTS[name])
    kwargs.update(overrides)
    return SegMamba(in_chans=in_chans, out_chans=out_chans, **kwargs)
