"""UNeXt-CMRF variant family — one parameterized model covering the 19
UNext_CMRF* architectures (/root/reference/Experiments/nets/archs/UNext_CMRF*.py).

Axes (matching the reference file suffixes):
  * encoder:  'conv' (plain UNeXt stem) | 'cmrf' | 'cmrf_od' | 'cmrf_bs' |
              'cmrf_bsrb'   (UNext_CMRF.py:222-224, _OD, _BS, _BSRB)
  * decoder:  'conv' | 'cmrf' (UNext_CMRF_enc_dec.py:265-273 — CMRF replaces
              decoder3..5 only)
  * skip:     'add' (UNext_CMRF.py)
              'mlfc'  ACC-UNet MLFC fusion of t1..t4 (UNext_CMRF_enc_MLFC.py:331)
              'csse'  channel-spatial SE on each skip (_enc_CSSE)
              'gs'    global-semantic branch + TopFormer SIM injection
                      (UNext_CMRF_GS_wavelet.py:262-279, 311-420)
              'gab'   EGE-UNet group-aggregation bridge with deep-supervision
                      mask heads and align_corners=True decoding
                      (UNext_CMRF_GAB.py:480-566)
  * pool:     'max' | 'wavelet' (Haar StaticWaveletPool2d,
              UNext_CMRF_GS_wavelet.py:233-235; note the reference applies no
              ebn before wavelet/CMRF pooling)

The '_hd' variants are this model paired with the Hausdorff loss
(train side), '_dense_skip'/'_PP' reuse 'add' topology with extra dense
connections (exposed via dense_skip flag).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.nn.acc_blocks import MLFC
from accunet_tpu.nn.cmrf_blocks import (
    CMRF,
    CMRF_BS,
    CMRF_OD,
    ChannelSpatialSE,
    GroupAggregationBridge,
    InjectionMultiSumCBR,
    haar_wavelet_pool2d,
)
from accunet_tpu.nn.unext_blocks import OverlapPatchEmbed, ShiftedBlock
from accunet_tpu.ops.pooling import max_pool2d
from accunet_tpu.ops.resize import resize_bilinear, upsample_bilinear_2x

Dtype = Any


class UNextCMRF(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    encoder: str = "cmrf"
    decoder: str = "conv"
    skip: str = "add"
    pool: str = "max"
    # 'shift' (UNeXt shifted-MLP) | 'rkan' (rational-KAN token blocks,
    # UNext_CMRF_GS_wavelet_rkan.py:437-482 — KANBlocks with kan_r KANLinear)
    token_block: str = "shift"
    stem_dims: Sequence[int] = (16, 32, 128)
    embed_dims: Sequence[int] = (128, 160, 256)
    final_sigmoid: bool = True
    dtype: Dtype = jnp.float32

    def _enc_block(self, c1, c2, name):
        dt = self.dtype
        if self.encoder == "conv":
            return lambda x, train: nn.Conv(
                c2, (3, 3), padding="SAME", dtype=dt, name=name
            )(x)
        if self.encoder == "cmrf":
            return CMRF(c1, c2, dtype=dt, name=name)
        if self.encoder == "cmrf_od":
            return CMRF_OD(c1, c2, dtype=dt, name=name)
        if self.encoder == "cmrf_bs":
            return CMRF_BS(c1, c2, block="bsconv", dtype=dt, name=name)
        if self.encoder == "cmrf_bsrb":
            return CMRF_BS(c1, c2, block="bsrb", dtype=dt, name=name)
        raise ValueError(self.encoder)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        s1, s2, s3 = self.stem_dims
        e0, e1, e2 = self.embed_dims
        ac = self.skip == "gab"  # GAB variant decodes with align_corners=True

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=dt, name=name,
            )

        def token_blk(tokens, hh, ww, dim, name):
            if self.token_block == "rkan":
                from accunet_tpu.models.u_kan import KANBlock

                return KANBlock(dim, dt, base_activation="rkan", name=name)(
                    tokens, hh, ww, train
                )
            return ShiftedBlock(dim, 1.0, dt, name=name)(tokens, hh, ww, train)

        def pool_act(y, ebn_name):
            if self.pool == "wavelet":
                return jax.nn.relu(haar_wavelet_pool2d(y))
            if self.encoder == "conv":  # plain UNeXt path keeps its stem BN
                y = bn(ebn_name)(y)
            return jax.nn.relu(max_pool2d(y, 2))

        out = pool_act(self._enc_block(self.n_channels, s1, "encoder1")(x, train), "ebn1")
        t1 = out
        out = pool_act(self._enc_block(s1, s2, "encoder2")(out, train), "ebn2")
        t2 = out
        out = pool_act(self._enc_block(s2, s3, "encoder3")(out, train), "ebn3")
        t3 = out

        tok, h, w = OverlapPatchEmbed(e1, 3, 2, dt, name="patch_embed3")(out)
        tok = token_blk(tok, h, w, e1, "block1_0")
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm3")(tok)
        t4 = tok.reshape(tok.shape[0], h, w, e1)
        b = t4.shape[0]

        # ---------------- bottleneck (+ optional global-semantic branch)
        g_splits = None
        if self.skip == "gs":
            tok, h4, w4 = OverlapPatchEmbed(e2, 3, 2, dt, name="patch_embed4")(t4)
            main = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm4_main")(tok)
            bot = main.reshape(b, h4, w4, e2)

            gs = jnp.concatenate(
                [
                    _adaptive_avg_pool(t1, (h4, w4)),
                    _adaptive_avg_pool(t2, (h4, w4)),
                    _adaptive_avg_pool(t3, (h4, w4)),
                    _adaptive_avg_pool(t4, (h4, w4)),
                ],
                axis=-1,
            )
            g = nn.Conv(e2, (1, 1), use_bias=False, dtype=dt, name="g_in_proj")(gs)
            g = bn("g_in_bn")(g)
            gtok = g.reshape(b, h4 * w4, e2)
            gtok = token_blk(gtok, h4, w4, e2, "block2_0")
            gtok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm4_gs")(gtok)
            g = gtok.reshape(b, h4, w4, e2)
            g = nn.Conv(
                e1 + e0 + s2 + s1, (1, 1), dtype=dt, name="g_split_proj"
            )(g)
            g_splits = {
                "g4": g[..., : e1],
                "g3": g[..., e1 : e1 + e0],
                "g2": g[..., e1 + e0 : e1 + e0 + s2],
                "g1": g[..., e1 + e0 + s2 :],
            }
        else:
            tok, h4, w4 = OverlapPatchEmbed(e2, 3, 2, dt, name="patch_embed4")(t4)
            tok = token_blk(tok, h4, w4, e2, "block2_0")
            tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm4")(tok)
            bot = tok.reshape(b, h4, w4, e2)

        # ---------------- skip preprocessing
        if self.skip == "dense":
            # UNet++-style nested skip refinement
            # (UNext_CMRF_dense_skip.py:262-355): H_i_j heads densely combine
            # skips; decoder levels then add X21/X12/X03 (t4 stays plain)
            def head(cin, cout, name):
                def apply(t):
                    y = nn.Conv(
                        cout, (3, 3), padding="SAME", use_bias=False, dtype=dt,
                        name=f"{name}_conv",
                    )(t)
                    y = bn(f"{name}_bn")(y)
                    return jax.nn.relu(y)

                return apply

            def up_to(t, ref):
                if t.shape[1:3] != ref.shape[1:3]:
                    t = resize_bilinear(t, ref.shape[1:3], align_corners=False)
                return t

            X00, X10, X20, X30 = t1, t2, t3, t4
            X01 = head(s1 + s2, s1, "H0__1")(
                jnp.concatenate([X00, up_to(X10, X00)], -1))
            X11 = head(s2 + s3, s2, "H1__1")(
                jnp.concatenate([X10, up_to(X20, X10)], -1))
            X21 = head(s3 + e1, s3, "H2__1")(
                jnp.concatenate([X20, up_to(X30, X20)], -1))
            X02 = head(2 * s1 + s2, s1, "H0__2")(
                jnp.concatenate([X00, X01, up_to(X11, X00)], -1))
            X12 = head(2 * s2 + s3, s2, "H1__2")(
                jnp.concatenate([X10, X11, up_to(X21, X10)], -1))
            X03 = head(3 * s1 + s2, s1, "H0__3")(
                jnp.concatenate([X00, X01, X02, up_to(X12, X00)], -1))
            t1, t2, t3 = X03, X12, X21  # refined skips; t4 unchanged
        if self.skip == "mlfc":
            t1, t2, t3, t4 = MLFC(
                (s1, s2, s3, e1), 1, "full", dt, name="mlfc"
            )(t1, t2, t3, t4, train)
        elif self.skip == "csse":
            t1 = ChannelSpatialSE(s1, dtype=dt, name="csse1")(t1)
            t2 = ChannelSpatialSE(s2, dtype=dt, name="csse2")(t2)
            t3 = ChannelSpatialSE(s3, dtype=dt, name="csse3")(t3)
            t4 = ChannelSpatialSE(e1, dtype=dt, name="csse4")(t4)

        def up(y, conv_name, bn_name, feat, use_cmrf=False):
            if use_cmrf:
                y = CMRF(y.shape[-1], feat, dtype=dt, name=conv_name)(y, train)
            else:
                y = nn.Conv(feat, (3, 3), padding="SAME", dtype=dt, name=conv_name)(y)
            if bn_name is not None:
                y = bn(bn_name)(y)
            return jax.nn.relu(upsample_bilinear_2x(y, align_corners=ac))

        def match(skip, y):
            if skip.shape[1:3] != y.shape[1:3]:
                skip = resize_bilinear(skip, y.shape[1:3], align_corners=True)
            return skip

        def fuse_skip(y, t, level, xh):
            """skip merge at one decoder level; returns fused map."""
            t = match(t, y)
            if self.skip == "gs":
                g = resize_bilinear(
                    g_splits[f"g{level}"], y.shape[1:3], align_corners=False
                )
                oup = t.shape[-1]
                t = InjectionMultiSumCBR(oup, dt, name=f"sim{level}")(t, g, train)
            elif self.skip == "gab":
                gt = nn.Conv(1, (1, 1), dtype=dt, name=f"gt_conv{level}")(y)
                t = GroupAggregationBridge(t.shape[-1], dtype=dt, name=f"GAB{level}")(
                    xh, t, gt, train
                )
            return y + t

        cm = self.decoder == "cmrf"
        y = up(bot, "decoder1", "dbn1", e1)
        y = fuse_skip(y, t4, 4, bot)
        xh = y
        tok = y.reshape(b, y.shape[1] * y.shape[2], e1)
        tok = token_blk(tok, y.shape[1], y.shape[2], e1, "dblock1_0")
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="dnorm3")(tok)
        y = tok.reshape(y.shape)

        y = up(y, "decoder2", "dbn2", e0)
        y = fuse_skip(y, t3, 3, xh)
        xh = y
        tok = y.reshape(b, y.shape[1] * y.shape[2], e0)
        tok = token_blk(tok, y.shape[1], y.shape[2], e0, "dblock2_0")
        tok = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="dnorm4")(tok)
        y = tok.reshape(y.shape)

        # the CMRF-decoder variants drop dbn3/dbn4 in their shipped forwards
        # (UNext_CMRF_enc_dec.py:128-136 — BN'd lines commented out)
        y = up(y, "decoder3", None if cm else "dbn3", s2, use_cmrf=cm)
        y = fuse_skip(y, t2, 2, xh)
        xh = y
        y = up(y, "decoder4", None if cm else "dbn4", s1, use_cmrf=cm)
        y = fuse_skip(y, t1, 1, xh)
        y = up(y, "decoder5", None, s1, use_cmrf=cm)

        logits = nn.Conv(self.n_classes, (1, 1), dtype=dt, name="final")(y)
        if self.n_classes == 1 and self.final_sigmoid:
            logits = jax.nn.sigmoid(logits)
        return logits.astype(jnp.float32)


def _adaptive_avg_pool(x, out_hw):
    b, h, w, c = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        return x.reshape(b, oh, h // oh, ow, w // ow, c).mean(axis=(2, 4))
    return resize_bilinear(x, out_hw, align_corners=False)  # fallback


VARIANTS = {
    "UNext_CMRF": dict(encoder="cmrf"),
    "UNext_CMRF_enc_dec": dict(encoder="cmrf", decoder="cmrf"),
    "UNext_CMRF_enc_MLFC": dict(encoder="cmrf", skip="mlfc"),
    "UNext_CMRF_enc_dec_MLFC": dict(encoder="cmrf", decoder="cmrf", skip="mlfc"),
    "UNext_CMRF_enc_CSSE": dict(encoder="cmrf", skip="csse"),
    "UNext_CMRF_GS": dict(encoder="cmrf", skip="gs"),
    "UNext_CMRF_GS_Wavelet": dict(encoder="cmrf", skip="gs", pool="wavelet"),
    "UNext_CMRF_Wavelet": dict(encoder="cmrf", pool="wavelet"),
    "UNext_CMRF_GAB": dict(encoder="cmrf", skip="gab"),
    "UNext_CMRF_OD": dict(encoder="cmrf_od"),
    "UNext_CMRF_BS": dict(encoder="cmrf_bs"),
    "UNext_CMRF_BSRB": dict(encoder="cmrf_bsrb"),
    "UNext_CMRF_dense_skip": dict(encoder="cmrf", skip="dense"),
    # the shipped UNext_CMRF_PP class's forward is IDENTICAL to plain
    # UNext_CMRF (archs/UNext_CMRF_PP.py:225-390 — the "Dense Skip paths"
    # print is vestigial; the actual UNet++ decoder lives in the separate,
    # never-constructed UNext_CMRF_PP_UNetPP class :392-540)
    "UNext_CMRF_PP": dict(encoder="cmrf"),
    "UNext_CMRF_hd": dict(encoder="cmrf"),  # pairs with hausdorff loss
    "UNext_CMRF_GS_Wavelet_hd": dict(encoder="cmrf", skip="gs", pool="wavelet"),
    # combo names from the train_model.py factory (:420-453); the encoder
    # class of each reference file is set by an import alias
    # (e.g. `from nets.archs.BSDN import CMRF_BSRB as CMRF`)
    "UNext_CMRF_GAB_wavelet": dict(encoder="cmrf", skip="gab", pool="wavelet"),
    "UNext_CMRF_GAB_wavelet_OD": dict(encoder="cmrf_od", skip="gab", pool="wavelet"),
    "UNext_CMRF_GS_Wavelet_OD": dict(encoder="cmrf_od", skip="gs", pool="wavelet"),
    "UNext_CMRF_BS_GS_Wavelet": dict(encoder="cmrf_bs", skip="gs", pool="wavelet"),
    "UNext_CMRF_BSRB_GS": dict(encoder="cmrf_bsrb", skip="gs"),
    "UNext_CMRF_BSRB_GS_Wavelet": dict(encoder="cmrf_bsrb", skip="gs", pool="wavelet"),
    "UNext_CMRF_GS_Wavelet_rKAN": dict(
        encoder="cmrf", skip="gs", pool="wavelet", token_block="rkan"),
}


def build_unext_cmrf(name: str, n_channels=3, n_classes=1, **overrides):
    kwargs = dict(VARIANTS[name])
    kwargs.update(overrides)
    return UNextCMRF(n_channels=n_channels, n_classes=n_classes, **kwargs)
