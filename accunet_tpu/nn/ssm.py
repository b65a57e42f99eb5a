"""State-space (Mamba) mixers and Spatial-Mamba blocks (NHWC / token layout).

Parity targets:
  * MambaVisionMixer — split-channel SSM mixer: in_proj → chunk x/z, dual
    depthwise causal conv1d ('same' padding, silu; bias disabled by the
    reference's conv_bias//2 quirk), x_proj → (dt, B, C), selective scan,
    concat z, out_proj (flagship nets/segmamba_hybrid_gsc_KAN_PE_ds_
    CrossAttn_HSLCA_SpatialMamba.py:505-716)
  * StateFusion — 3 depthwise 3x3 convs at dilations 1/3/5 with replicate
    padding, alpha-weighted sum (nets/spatialmamba.py:60-141). The dilated
    composition is equivalent to one sparse 11x11 depthwise kernel — the
    identity proven by kernels/dwconv2d/check.py.
  * StructureAwareSSM — x_proj → (dt, B, C=d_inner), *return-hidden*
    selective scan (h per step), StateFusion over h-maps, mean over state
    dim, y = h·C + x·D, LN, silu(z) gate, out_proj
    (nets/spatialmamba.py:180-342)
  * SpatialMambaBlock — cpe1(3x3 dw)+res → LN(eps 1e-6) → SSM + res →
    cpe2 + res → LN → GELU MLP + res (nets/spatialmamba.py:393-430)
  * KANFFN — LN + KAN token FFN (nets/spatialmamba.py:345-390)
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.nn.kan import KAN
from accunet_tpu.ops.selective_scan import selective_scan, selective_scan_rh

Dtype = Any


class DenseParams(nn.Module):
    """Parameter-only Dense (kernel (in,out) + bias) so callers can reuse the
    bias tensor (e.g. the reference's dt_proj bias double-add quirk)."""

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.out_features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.out_features,), jnp.float32)
            if self.use_bias
            else None
        )
        return kernel, bias


class SpatialStateFusion(nn.Module):
    """Alpha-weighted sum of depthwise 3x3 convs at dilations 1/3/5 with
    zero padding, applied to the scan output maps inside the SPATIAL variant
    mixer (nets/segmamba_hybrid_gsc_KAN_PE_ds_SPATIAL.py:147-163). Unlike
    spatialmamba's StateFusion this uses default (zero) padding."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, D)."""
        alpha = self.param("alpha", nn.initializers.ones, (3,), jnp.float32)

        def dconv(dil, name):
            return nn.Conv(
                self.dim, (3, 3), padding=[(dil, dil), (dil, dil)],
                kernel_dilation=(dil, dil), feature_group_count=self.dim,
                dtype=self.dtype, name=name,
            )

        a = alpha.astype(x.dtype)
        return (
            a[0] * dconv(1, "dw1")(x)
            + a[1] * dconv(3, "dw3")(x)
            + a[2] * dconv(5, "dw5")(x)
        )


class MambaVisionMixer(nn.Module):
    d_model: int
    d_state: int = 8
    d_conv: int = 3
    expand: int = 1
    dt_rank: int | None = None
    spatial_fusion: bool = False  # SPATIAL variant: dilated dwconv fusion of y
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, spatial_hw=None):
        """x: (B, L, C) → (B, L, C)."""
        b, l, c = x.shape
        d_inner = self.expand * self.d_model
        dh = d_inner // 2
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)

        xz = nn.Dense(d_inner, use_bias=False, dtype=self.dtype, name="in_proj")(x)
        xs_bld, z_bld = xz[..., :dh], xz[..., dh:]  # (B, L, dh) each

        a_log = self.param(
            "A_log",
            lambda key, shape: jnp.log(
                jnp.broadcast_to(jnp.arange(1, self.d_state + 1, dtype=jnp.float32), shape)
            ),
            (dh, self.d_state),
        )
        dmat = self.param("D", nn.initializers.ones, (dh,), jnp.float32)

        # reference conv1d bias is disabled by the conv_bias//2 quirk
        def causal_conv(name):
            return nn.Conv(
                dh, (self.d_conv,), padding="SAME", feature_group_count=dh,
                use_bias=False, dtype=self.dtype, name=name,
            )

        xs_bld = jax.nn.silu(causal_conv("conv1d_x")(xs_bld))
        z_bld = jax.nn.silu(causal_conv("conv1d_z")(z_bld))
        xs = xs_bld.transpose(0, 2, 1)  # (B, dh, L)
        z = z_bld.transpose(0, 2, 1)

        x_dbl = nn.Dense(
            dt_rank + 2 * self.d_state, use_bias=False, dtype=self.dtype, name="x_proj"
        )(xs_bld)
        dt, bmat, cmat = jnp.split(x_dbl, [dt_rank, dt_rank + self.d_state], axis=-1)
        # faithful quirk: the reference applies dt_proj WITH its bias and then
        # also passes the same bias as delta_bias to the scan (flagship
        # :674,694), so the bias enters twice before softplus
        dt_kernel, dt_bias = DenseParams(dt_rank, dh, name="dt_proj")()
        dt = dt @ dt_kernel.astype(dt.dtype) + dt_bias.astype(dt.dtype)

        y = selective_scan(
            xs,
            dt.transpose(0, 2, 1),
            -jnp.exp(a_log),
            bmat.transpose(0, 2, 1),
            cmat.transpose(0, 2, 1),
            dmat,
            z=None,
            delta_bias=dt_bias,
            delta_softplus=True,
        )
        if self.spatial_fusion:
            # SPATIAL variant: fuse the scan-output maps with dilated dwconvs
            # before the z-concat (…_ds_SPATIAL.py:155-168)
            hh, ww = spatial_hw if spatial_hw is not None else (
                int(round(l ** 0.5)), int(round(l ** 0.5))
            )
            ymap = y.transpose(0, 2, 1).reshape(b, hh, ww, dh)
            ymap = SpatialStateFusion(dh, self.dtype, name="spatial_fusion_mod")(ymap)
            y = ymap.reshape(b, l, dh).transpose(0, 2, 1)
        y = jnp.concatenate([y, z], axis=1).transpose(0, 2, 1)  # (B, L, d_inner)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="out_proj")(y)


class BiMamba(nn.Module):
    """Canonical mamba_ssm ``Mamba`` block with ``bimamba_type="v2"`` — the
    mixer the SegMamba baseline instantiates (ref nets/segmamba.py:49-76:
    d_state=16, d_conv=4, expand=2, bimamba_type="v2").

    The reference package (Vim-style mamba_ssm fork) is CUDA-only and fails
    to import here; this is a TPU-native implementation of the *published*
    bimamba-v2 forward (mamba_simple.py of that fork):

      xz = in_proj(x)                          # (B, L, 2*d_inner), no bias
      fwd branch : x̂, z = chunk(xz); x̂ = silu(causal_conv1d(x̂));
                   (dt,B,C) = x_proj(x̂); dt = dt_proj(dt);
                   y = selective_scan(x̂, dt, A, B, C, D, z=z,
                                      delta_bias=dt_proj.bias, softplus)
      bwd branch : the same ops on time-flipped xz with the *_b parameter
                   set (A_b_log, conv1d_b, x_proj_b, dt_proj_b, D_b),
                   output flipped back
      out        = out_proj(y_fwd + flip(y_bwd))   # if_devide_out=False
                                                   # (the fork's default,
                                                   # SegMamba passes nothing)

    Verified against a hand-written torch loop oracle
    (tests/test_bimamba_parity.py) since the CUDA package cannot run here.

    ASSUMPTION (advisor r4): the oracle encodes the same readings of the
    fork's semantics as this implementation (if_devide_out=False — no /2 on
    the branch sum — and the fused path's delta_bias applied exactly once),
    so it validates internal consistency, not fork fidelity; the fork's
    source is not in the reference tree to cross-check. ``if_devide_out``
    is exposed as a flag so a /2 variant can be selected (and golden-checked)
    if the fork source ever becomes available.
    """

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int | None = None
    if_devide_out: bool = False  # fork spelling kept for discoverability
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, L, C) → (B, L, C)."""
        b, l, c = x.shape
        d_inner = self.expand * self.d_model
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)

        xz = nn.Dense(
            2 * d_inner, use_bias=False, dtype=self.dtype, name="in_proj"
        )(x)

        def branch(xz_bld, suffix):
            xs, z = xz_bld[..., :d_inner], xz_bld[..., d_inner:]
            # torch Conv1d(padding=d_conv-1) then [..., :L] == causal conv
            xs = nn.Conv(
                d_inner, (self.d_conv,), padding=[(self.d_conv - 1, 0)],
                feature_group_count=d_inner, use_bias=True, dtype=self.dtype,
                name=f"conv1d{suffix}",
            )(xs)
            xs = jax.nn.silu(xs)
            x_dbl = nn.Dense(
                dt_rank + 2 * self.d_state, use_bias=False, dtype=self.dtype,
                name=f"x_proj{suffix}",
            )(xs)
            dt, bmat, cmat = jnp.split(
                x_dbl, [dt_rank, dt_rank + self.d_state], axis=-1
            )
            dt_kernel, dt_bias = DenseParams(
                dt_rank, d_inner, name=f"dt_proj{suffix}"
            )()
            # the fused CUDA path applies dt_proj WITHOUT its bias and passes
            # the bias as delta_bias (mamba_inner_fn: delta_proj_weight only;
            # delta_bias=dt_proj.bias) — once, unlike MambaVisionMixer's
            # double-add quirk
            dt = dt @ dt_kernel.astype(dt.dtype)
            a_log = self.param(
                f"A{suffix or ''}_log" if suffix else "A_log",
                lambda key, shape: jnp.log(jnp.broadcast_to(
                    jnp.arange(1, self.d_state + 1, dtype=jnp.float32), shape
                )),
                (d_inner, self.d_state),
            )
            dmat = self.param(
                f"D{suffix}", nn.initializers.ones, (d_inner,), jnp.float32
            )
            return selective_scan(
                xs.transpose(0, 2, 1),
                dt.transpose(0, 2, 1),
                -jnp.exp(a_log),
                bmat.transpose(0, 2, 1),
                cmat.transpose(0, 2, 1),
                dmat,
                z=z.transpose(0, 2, 1),
                delta_bias=dt_bias,
                delta_softplus=True,
            )  # (B, d_inner, L)

        y_f = branch(xz, "")
        y_b = branch(xz[:, ::-1], "_b")[:, :, ::-1]
        y = (y_f + y_b).transpose(0, 2, 1)  # (B, L, d_inner)
        if self.if_devide_out:
            y = y / 2
        return nn.Dense(
            self.d_model, use_bias=False, dtype=self.dtype, name="out_proj"
        )(y)


class StateFusion(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        """h: (B, H, W, D) — depthwise dilated 3x3s with replicate padding."""
        k3 = self.param("kernel__3", nn.initializers.ones, (self.dim, 1, 3, 3), jnp.float32)
        k31 = self.param("kernel__3__1", nn.initializers.ones, (self.dim, 1, 3, 3), jnp.float32)
        k32 = self.param("kernel__3__2", nn.initializers.ones, (self.dim, 1, 3, 3), jnp.float32)
        alpha = self.param("alpha", nn.initializers.ones, (3,), jnp.float32)

        def dconv(x, kernel, dil):
            pad = dil
            xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
            kern = kernel.transpose(2, 3, 1, 0).astype(x.dtype)  # (3,3,1,D)
            return jax.lax.conv_general_dilated(
                xp,
                kern,
                window_strides=(1, 1),
                padding="VALID",
                rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.dim,
            )

        a = alpha.astype(h.dtype)
        return a[0] * dconv(h, k3, 1) + a[1] * dconv(h, k31, 3) + a[2] * dconv(h, k32, 5)


class StructureAwareSSM(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 3
    expand: int = 2
    dt_rank: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) → (B, H, W, C)."""
        b, hh, ww, c = x.shape
        d_inner = self.expand * self.d_model
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)
        l = hh * ww

        xz = nn.Dense(2 * d_inner, use_bias=False, dtype=self.dtype, name="in_proj")(x)
        xs, z = xz[..., :d_inner], xz[..., d_inner:]
        xs = nn.Conv(
            d_inner, (self.d_conv, self.d_conv), padding="SAME",
            feature_group_count=d_inner, dtype=self.dtype, name="conv2d",
        )(xs)
        xs = jax.nn.silu(xs)

        xs_bdl = xs.reshape(b, l, d_inner).transpose(0, 2, 1)  # (B, D, L)

        x_proj_weight = self.param(
            "x_proj_weight",
            nn.initializers.lecun_normal(),
            (dt_rank + self.d_state + d_inner, d_inner),
            jnp.float32,
        )
        dt_projs_weight = self.param(
            "dt_projs_weight", nn.initializers.lecun_normal(), (d_inner, dt_rank), jnp.float32
        )
        dt_projs_bias = self.param(
            "dt_projs_bias",
            lambda key, shape: jnp.log(jnp.expm1(jnp.full(shape, 0.01))),
            (d_inner,),
        )
        a_logs = self.param(
            "A_logs",
            lambda key, shape: jnp.log(
                jnp.broadcast_to(jnp.arange(1, self.d_state + 1, dtype=jnp.float32), shape)
            ),
            (d_inner, self.d_state),
        )
        ds = self.param("Ds", nn.initializers.ones, (d_inner,), jnp.float32)

        x_dbl = jnp.einsum("rd,bdl->brl", x_proj_weight.astype(xs_bdl.dtype), xs_bdl)
        dts = x_dbl[:, :dt_rank]
        bs = x_dbl[:, dt_rank : dt_rank + self.d_state]
        cs = x_dbl[:, dt_rank + self.d_state :]
        dts = jnp.einsum("dr,brl->bdl", dt_projs_weight.astype(dts.dtype), dts)

        h = selective_scan_rh(
            xs_bdl, dts, -jnp.exp(a_logs), bs,
            delta_bias=dt_projs_bias, delta_softplus=True,
        )  # (B, D, S, L)

        hm = h.reshape(b, d_inner * self.d_state, l).transpose(0, 2, 1)
        hm = hm.reshape(b, hh, ww, d_inner * self.d_state)
        hm = StateFusion(d_inner * self.d_state, self.dtype, name="state_fusion")(hm)
        hm = hm.reshape(b, l, d_inner, self.d_state)
        hmean = hm.mean(axis=-1).transpose(0, 2, 1)  # (B, D, L)

        y = hmean * cs + xs_bdl * ds[None, :, None].astype(xs_bdl.dtype)
        y = y.transpose(0, 2, 1).reshape(b, hh, ww, d_inner)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="out_norm")(y)
        y = y * jax.nn.silu(z)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="out_proj")(y)


class SpatialMambaMLP(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class SpatialMambaBlock(nn.Module):
    hidden_dim: int
    d_state: int = 16
    mlp_ratio: float = 4.0
    mlp_type: str = "mlp"  # 'mlp' | 'kan' (SpatialMambaBlock_KAN, spatialmamba.py:428-)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C)."""
        c = self.hidden_dim
        x = x + nn.Conv(
            c, (3, 3), padding="SAME", feature_group_count=c, dtype=self.dtype, name="cpe1"
        )(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln__1")(x)
        x = x + StructureAwareSSM(
            c, d_state=self.d_state, dtype=self.dtype, name="self_attention"
        )(y)
        x = x + nn.Conv(
            c, (3, 3), padding="SAME", feature_group_count=c, dtype=self.dtype, name="cpe2"
        )(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln__2")(x)
        if self.mlp_type == "kan":
            # KANFFN applies its own LayerNorm after ln_2 — a double-norm
            # quirk faithful to SpatialMambaBlock_KAN (spatialmamba.py:450-460)
            x = x + KANFFN(c, int(c * self.mlp_ratio), self.dtype, name="mlp")(y)
        else:
            x = x + SpatialMambaMLP(int(c * self.mlp_ratio), c, self.dtype, name="mlp")(y)
        return x


class KANFFN(nn.Module):
    """LN + KAN token FFN on (B,H,W,C) (nets/spatialmamba.py:345-390)."""

    dim: int
    hidden_dim: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.hidden_dim or c * 4
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        y = KAN((c, hidden, c), dtype=self.dtype, name="kan")(y.reshape(b * h * w, c))
        return y.reshape(b, h, w, c)
