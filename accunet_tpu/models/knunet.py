"""KNUnet / KMUNet — KAN patch embed + CNN encoder + SCA bridge + VSS decoder.

Faithful TPU-native rebuild of /root/reference/Experiments/nets/KNUnet.py
(KMUNet, :1488-1511), at golden parity vs the loaded reference with
timm/mamba_ssm stubbed (tests/test_knunet_parity.py):

  * KAN_PatchEmbed (:1356-1279) — 16-offset strided pixel sampling concat
    (16*C channels, column-major offset order), LayerNorm FIRST, then a
    tokenwise KANLinear whose output width is HARDCODED to 64 in the
    reference (PatchbedLayer, :406-411) — which is what makes
    hidden_dims[0]=64 the only coherent plan.
  * CnnDownBlock (:1330-1355) — (Conv3x3 + LeakyReLU + Dropout) x depth,
    KAN PatchMerging2D downsample (LN(4C) then KANLinear 4C→2C,
    :343-405/1169-1211); the PRE-downsample map is the stage output. All
    four stages construct a downsample; stage 3's result is discarded by
    the encoder, so we skip computing it (its torch params are simply
    unused at import).
  * KAN_SCA bridge (:1078-1167) — Spatial_Att_Bridge (shared dilated 7x7
    conv on [mean,max] maps) and Channel_Att_Bridge (global-pool concat,
    Conv1d(k=3) over the channel axis, per-stage KANLinear gates), with
    the reference's double-residual wiring.
  * _VSSLayer_up (:1025-1076) — KAN PatchExpand2D upsample (KANLinear
    dim→2dim + 2x pixel-shuffle + LN, :1281-1299), then the reference's
    recompute loop: EVERY block re-reads conv1x1(cat(skip, up)) and all
    but the LAST block's output is discarded (:1067-1075) — reproduced
    verbatim so gradients match too.
  * Final_PatchExpand2D (:236-252, plain Linear dim→4dim, 4x shuffle, LN)
    + 1x1 head. The reference decoder also constructs a `vssblock` it
    never calls (:1461) — not reproduced (unused torch params are allowed
    by the importer).

SS2D is the standard VMamba core (same spec as MedMamba's, nn/ss2d.py —
already at loop-oracle parity); KANLinear is nn/kan.py's (U-KAN parity).
Flax submodule names mirror the torch attribute tree so
port/torch_state.py:import_torch_state maps 1:1 with strict=True.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.nn.kan import KANLinear
from accunet_tpu.nn.ss2d import SS2D

Dtype = Any


def _pixel_shuffle_nhwc(x, p: int):
    """(B, H, W, p*p*c) -> (B, p*H, p*W, c) matching einops
    'b h w (p1 p2 c) -> b (h p1) (w p2) c'."""
    b, h, w, cc = x.shape
    c = cc // (p * p)
    x = x.reshape(b, h, w, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * p, w * p, c)


class _KANTokenLayer(nn.Module):
    """PatchbedLayer / PatchmergingLayer / PatchexpandLayer: a single
    KANLinear named fc1 applied tokenwise (drop is identity in eval)."""

    in_features: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x2d):
        return KANLinear(self.in_features, self.out_features,
                         base_activation="silu", dtype=self.dtype,
                         name="fc1")(x2d)


class _KANTokenBlock(nn.Module):
    """KANs / PatchmergingBlock / PatchexpandBlock: wraps the layer so the
    torch key chain <name>.layer.fc1 is reproduced."""

    in_features: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x2d):
        return _KANTokenLayer(self.in_features, self.out_features,
                              dtype=self.dtype, name="layer")(x2d)


class KANPatchEmbed(nn.Module):
    """KAN_PatchEmbed(dim): LN(4*dim) over the 16-offset concat, then the
    64-wide KANLinear (PatchbedLayer hardcodes out_features=64; we
    parameterize as `out_dim` and keep 64 for the canonical plan)."""

    dim: int  # reference 'dim' arg; the concat width is 4*dim == 16*C
    out_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # reference offset order: x_{4j+i} = x[:, i::4, j::4] (KNUnet.py:1236-1251)
        parts = [x[:, i::4, j::4, :] for j in range(4) for i in range(4)]
        y = jnp.concatenate(parts, axis=-1)  # (B, H/4, W/4, 16C)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)
        b, h, w, cc = y.shape
        y = _KANTokenBlock(cc, self.out_dim, dtype=self.dtype,
                           name="reduction")(y.reshape(b * h * w, cc))
        return y.reshape(b, h, w, self.out_dim)


class KANPatchMerging2D(nn.Module):
    """PatchMerging2D (KNUnet.py:1169-1211): 2x2 offset concat, LN(4C),
    KANLinear 4C -> 2C (PatchmergingLayer out = in//2, :343-349)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        parts = [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                 x[:, 0::2, 1::2], x[:, 1::2, 1::2]]
        y = jnp.concatenate(parts, axis=-1)  # (B, H/2, W/2, 4C)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)
        b, h, w, cc = y.shape
        y = _KANTokenBlock(cc, cc // 2, dtype=self.dtype,
                           name="reduction")(y.reshape(b * h * w, cc))
        return y.reshape(b, h, w, cc // 2)


class KANPatchExpand2D(nn.Module):
    """PatchExpand2D (KNUnet.py:1281-1299): KANLinear dim -> 2*dim
    (PatchexpandBlock/Layer), 2x pixel shuffle, LN(dim//2)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = _KANTokenBlock(c, 2 * c, dtype=self.dtype,
                           name="expand")(x.reshape(b * h * w, c))
        y = _pixel_shuffle_nhwc(y.reshape(b, h, w, 2 * c), 2)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)


class FinalPatchExpand2D(nn.Module):
    """Final_PatchExpand2D (KNUnet.py:236-252): plain Linear dim -> 4*dim
    (no bias), 4x pixel shuffle, LN(dim//4)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(4 * self.dim, use_bias=False, dtype=self.dtype,
                     name="expand")(x)
        y = _pixel_shuffle_nhwc(y, 4)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)


class VSSBlock(nn.Module):
    """VSSBlock (KNUnet.py:814-826): LN -> SS2D -> residual. _VSSLayer_up
    leaves norm_layer at nn.LayerNorm's default eps=1e-5 (the 1e-6 partial
    is only VSSBlock's own default, which the decoder's caller overrides)."""

    hidden_dim: int
    d_state: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln__1")(x)
        return x + SS2D(self.hidden_dim, self.d_state, dtype=self.dtype,
                        name="self_attention")(y)


class VSSLayerUp(nn.Module):
    """_VSSLayer_up (KNUnet.py:1025-1076). forward(x1, x2): upsample x1,
    then the reference's loop `for blk: x = blk(conv1x1(cat(x2, x1)))` —
    each iteration recomputes from the SAME inputs, so all but the last
    block's output is discarded. Reproduced verbatim."""

    dim: int
    depth: int
    d_state: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        x1 = KANPatchExpand2D(self.dim, dtype=self.dtype, name="upsample")(x1)
        conv = nn.Conv(self.dim // 2, (1, 1), dtype=self.dtype, name="conv1x1")
        x = None
        for j in range(self.depth):
            y = conv(jnp.concatenate([x2, x1], axis=-1))
            x = VSSBlock(self.dim // 2, self.d_state, dtype=self.dtype,
                         name=f"blocks_{j}")(y)
        return x


class DownConvBlock(nn.Module):
    """DownConvBlock (KNUnet.py:1301-1326): (Conv3x3 + LeakyReLU(0.01) +
    Dropout) x depth. Sequential index 0 is the conv -> blocks.j.0."""

    out_channels: int
    depth: int
    dropout_p: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for j in range(self.depth):
            x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"blocks_{j}_0")(x)
            x = jax.nn.leaky_relu(x, 0.01)
            x = nn.Dropout(self.dropout_p)(x, deterministic=not train)
        return x


class CnnDownBlock(nn.Module):
    """CnnDownBlock (KNUnet.py:1330-1355): DownConvBlock then KAN
    PatchMerging2D; returns (downsampled, pre-downsample skip)."""

    out_channels: int
    depth: int
    dropout_p: float = 0.0
    downsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DownConvBlock(self.out_channels, self.depth, self.dropout_p,
                          dtype=self.dtype, name="DownConvBlock")(x, train)
        skip = x
        if self.downsample:
            x = KANPatchMerging2D(self.out_channels, dtype=self.dtype,
                                  name="down")(x)
        return x, skip


class KMUNetEncoder(nn.Module):
    """KMUNet_Encoder (KNUnet.py:1409-1446). The reference constructs a
    downsample on ALL four stages (its guard `i_layer < num_layers` is
    always true) but discards stage 3's result; we skip computing it."""

    n_channels: int
    hidden_dims: Sequence[int]
    depths: Sequence[int]
    drop_rate: Sequence[float]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = KANPatchEmbed(4 * self.n_channels, out_dim=self.hidden_dims[0],
                          dtype=self.dtype, name="KAN_PatchEmbed")(x)
        feats = []
        for i, depth in enumerate(self.depths):
            last = i == len(self.depths) - 1
            x, skip = CnnDownBlock(
                self.hidden_dims[i], depth, self.drop_rate[i + 1],
                downsample=not last, dtype=self.dtype, name=f"layers_{i}",
            )(x, train)
            feats.append(skip)
        return feats


class SpatialAttBridge(nn.Module):
    """Spatial_Att_Bridge (KNUnet.py:1130-1145): shared Conv2d(2->1, k=7,
    pad=9, dilation=3) + sigmoid over [mean, max] channel maps."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ts):
        conv = nn.Conv(1, (7, 7), padding=[(9, 9), (9, 9)],
                       kernel_dilation=(3, 3), dtype=self.dtype,
                       name="shared_conv2d_0")
        outs = []
        for t in ts:
            avg = jnp.mean(t, axis=-1, keepdims=True)
            mx = jnp.max(t, axis=-1, keepdims=True)
            outs.append(jax.nn.sigmoid(conv(jnp.concatenate([avg, mx], -1))))
        return outs


class ChannelAttBridge(nn.Module):
    """Channel_Att_Bridge (KNUnet.py:1078-1128, split_att='KAN'): global
    avg-pool concat -> Conv1d(1,1,k=3, no bias) across the stacked channel
    axis -> per-stage KANLinear -> sigmoid gates."""

    c_list: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ts):
        c_sum = sum(self.c_list)
        att = jnp.concatenate([jnp.mean(t, axis=(1, 2)) for t in ts], -1)
        # torch: (B, c_sum, 1, 1) -> squeeze/transpose -> Conv1d over c_sum
        att = nn.Conv(1, (3,), padding=[(1, 1)], use_bias=False,
                      dtype=self.dtype, name="get_all_att")(att[..., None])
        att = att[..., 0]  # (B, c_sum)
        gates = []
        for i, ci in enumerate(self.c_list):
            g = KANLinear(c_sum, ci, base_activation="silu", dtype=self.dtype,
                          name=f"att{i + 1}")(att)
            gates.append(jax.nn.sigmoid(g)[:, None, None, :])
        return gates


class KANSCABridge(nn.Module):
    """KAN_SCA (KNUnet.py:1147-1167): spatial gate with residual, then
    channel gate, final residual onto the spatially-gated (pre-sum) maps."""

    c_list: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ts):
        satts = SpatialAttBridge(dtype=self.dtype, name="satt")(ts)
        gated = [s * t for s, t in zip(satts, ts)]
        summed = [g + t for g, t in zip(gated, ts)]
        catts = ChannelAttBridge(self.c_list, dtype=self.dtype,
                                 name="catt")(summed)
        return [c * s + g for c, s, g in zip(catts, summed, gated)]


class KMUNetDecoder(nn.Module):
    """KMUNet_Decoder (KNUnet.py:1449-1486), minus the `vssblock` it
    constructs and never calls."""

    n_classes: int
    hidden_dims: Sequence[int]
    depths: Sequence[int]
    d_state: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        dims = list(self.hidden_dims)
        x = feats[3]
        for k, i in enumerate((3, 2, 1)):  # up1/up2/up3
            x = VSSLayerUp(dims[i], self.depths[i], self.d_state,
                           dtype=self.dtype, name=f"up{k + 1}")(x, feats[i - 1])
        x = FinalPatchExpand2D(dims[0], dtype=self.dtype, name="final_up")(x)
        return nn.Conv(self.n_classes, (1, 1), dtype=self.dtype,
                       name="final_conv")(x)


class KMUNet(nn.Module):
    """KMUNet (KNUnet.py:1488-1511). Canonical plan: input C=3 (the patch
    embed's LN width is 16*C == 4*dim with the hardcoded dim=12),
    hidden_dims=(64,128,256,512) (the embed KANLinear hardcodes 64 out)."""

    n_channels: int = 3
    n_classes: int = 2
    depths: Sequence[int] = (1, 2, 6, 2)
    hidden_dims: Sequence[int] = (64, 128, 256, 512)
    d_state: int = 16
    bridge: bool = True
    drop_rate: Sequence[float] = (0.1, 0.2, 0.3, 0.4, 0.5)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        feats = KMUNetEncoder(self.n_channels, self.hidden_dims, self.depths,
                              self.drop_rate, dtype=self.dtype,
                              name="encoder")(x, train)
        if self.bridge:
            feats = KANSCABridge(list(self.hidden_dims), dtype=self.dtype,
                                 name="KAN_SCA")(feats)
        y = KMUNetDecoder(self.n_classes, self.hidden_dims, self.depths,
                          self.d_state, dtype=self.dtype, name="decoder")(feats)
        return y.astype(jnp.float32)
