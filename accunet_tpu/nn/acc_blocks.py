"""ACC-UNet building blocks (flax.linen, NHWC).

Behavioral parity targets (file:line cites into /root/reference):
  * ChannelSELayer — SE with BN+LeakyReLU applied *after* recalibration
    (ACC_UNet/ACC_UNet.py:9-49).
  * HANCLayer — pyramid context aggregation with per-channel interleaved
    concat (ACC_UNet/ACC_UNet.py:53-142).
  * Conv2dBatchnorm — conv → BN → LeakyReLU → SE (ACC_UNet/ACC_UNet.py:146-187).
  * HANCBlock — inverted bottleneck with depthwise 3x3 + HANC + residual BN
    (ACC_UNet/ACC_UNet.py:224-286).
  * ResPath — n_lvl residual purifier stages + final BN/act/BN
    (ACC_UNet/ACC_UNet.py:290-328).
  * MLFC — multi-level feature compilation; three behavioral modes:
      'full'  cross-level fusion (ACC_UNet/ACC_UNet.py:332-527)
      'lite'  per-level SE only (ACC_UNet/ACC_UNet_lite.py:424-431)
      'w'     learned convex blend fused*W + x*(1-W), W scalar init 0
              (ACC_UNet/ACC_UNet_w.py:354-355, 492-522)

Submodule field names intentionally mirror the reference attribute names so
checkpoint porting (accunet_tpu.port) is mechanical.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from accunet_tpu.ops.platform import on_tpu
from flax import linen as nn

from accunet_tpu.ops.pooling import (
    avg_pool2d,
    global_avg_pool,
    interleave_channels,
    upsample_nearest,
)

Dtype = Any


def lrelu(x):
    # Inline max form, not jax.nn.leaky_relu: the jax.nn version is itself
    # @jax.jit-wrapped, and the resulting closed_call boundary showed up in
    # a W-512 device trace (the §17 per-module budget session) as a real
    # unfused 'copy' pass over cnv72's 285 MB interior map, ~0.91 ms.
    # maximum(x, 0.01x) is value-identical for alpha in (0, 1). Gradient
    # caveat: at exactly x == 0, jnp.maximum tie-splits, giving subgradient
    # (1 + 0.01)/2 instead of leaky_relu's 1 — measure-zero, but a bitwise
    # grad comparison at x == 0 would differ by construction, not by bug.
    return jnp.maximum(x, x * jnp.asarray(0.01, x.dtype))


class DeferredSE(NamedTuple):
    """A fused HANCBlock's output with its trailing SE apply DEFERRED
    (ROOFLINE §13.2/§13.4): the four raw position-block outputs (pre-SE)
    plus the per-image gate*bn_scale and bn_shift vectors.  The next chained
    fused block applies lrelu(x*gs + tb) on its staged rows in VMEM; any
    non-fused consumer reassembles via `deferred_se_apply` (one XLA pass —
    exactly the boundary pass the chain elides)."""

    parts: tuple  # 4 x (B, Hf, Wf, C)
    gs: jax.Array  # (B, C) fp32 — sigmoid gate * folded SE-BN scale
    tb: jax.Array  # (C,)  fp32 — folded SE-BN shift


def deferred_se_apply(d: DeferredSE) -> jax.Array:
    """XLA fallback: concat the position blocks and apply the deferred SE
    (identical to the unchained boundary pass)."""
    x = jnp.concatenate(d.parts, axis=-1)
    gs4 = jnp.tile(d.gs, (1, 4))[:, None, None, :].astype(x.dtype)
    tb4 = jnp.tile(d.tb, 4).astype(x.dtype)
    return lrelu(x * gs4 + tb4)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch defaults (eps 1e-5, momentum 0.1 torch == 0.9 flax).

    Under pjit with a batch-sharded input the statistics are automatically
    global (XLA inserts the cross-device reduction), which gives sync-BN for
    free on a device mesh.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


def batch_norm(x, train: bool, dtype=jnp.float32, name: str = "bn"):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )(x)


def batch_norm_frame(xf, train: bool, dtype=jnp.float32, name: str = "bn"):
    """BatchNorm of a logical map stored in the s2d frame (ops/s2d.py).

    Viewing the frame as (..., 4, C) makes flax's BatchNorm reduce over the
    position axis too, so parameters/stats stay (C,) — bit-identical trees
    to the standard layout, and training statistics match the logical map."""
    b, h, w, c4 = xf.shape
    y = nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )(xf.reshape(b, h, w, 4, c4 // 4))
    return y.reshape(b, h, w, c4)


class _ConvParams(nn.Module):
    """Parameter mirror of nn.Conv (same names/shapes) for ops that apply
    the convolution through a custom path (the s2d frame)."""

    kh: int
    kw: int
    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kh, self.kw, self.in_features, self.out_features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,), jnp.float32)
        return kernel, bias


class ChannelSELayer(nn.Module):
    num_channels: int
    dtype: Dtype = jnp.float32
    layout: str = "nhwc"  # 'nhwc' | 's2d' (ops/s2d.py frame)

    @nn.compact
    def __call__(self, x, train: bool = False, squeezed=None):
        # `squeezed` lets a fused producer (ops/pallas/hanc_block.py with
        # emit_sums) hand over the per-channel global mean so the full map
        # is never re-read from HBM for the squeeze
        if squeezed is not None:
            squeezed = squeezed.astype(x.dtype)
        elif self.layout == "s2d":
            from accunet_tpu.ops import s2d

            squeezed = s2d.global_avg_pool(x)
        else:
            squeezed = global_avg_pool(x)
        s = lrelu(nn.Dense(self.num_channels // 8, dtype=self.dtype, name="fc1")(squeezed))
        s = jax.nn.sigmoid(nn.Dense(self.num_channels, dtype=self.dtype, name="fc2")(s))
        if self.layout == "s2d":
            from accunet_tpu.ops import s2d

            out = x * jnp.tile(s, (1, 4))[:, None, None, :]
            out = batch_norm_frame(out, train, self.dtype)
        else:
            out = x * s[:, None, None, :]
            out = batch_norm(out, train, self.dtype)
        return lrelu(out)


class DepthwiseConv(nn.Module):
    """Depthwise conv with the custom TPU VJP from ops/pallas/dwconv2d.

    Forward is XLA's grouped conv (bandwidth-optimal); the backward swaps
    XLA's pathological depthwise weight-gradient (measured ~20x slower than
    the data-gradient on v5e) for per-tap shifted reductions. Param layout
    matches nn.Conv(feature_group_count=C) for mechanical porting."""

    features: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 1, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        from accunet_tpu.ops.pallas.dwconv2d import dwconv2d

        return dwconv2d(
            x, kernel[:, :, 0, :].astype(x.dtype), bias.astype(x.dtype)
        )


class _DWConvParams(nn.Module):
    """Parameter mirror of DepthwiseConv (same names/shapes)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 1, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class _BNParams(nn.Module):
    """Parameter/stat mirror of nn.BatchNorm (same variable names, shapes
    and inits) returning the folded inference affine (scale', shift') with
    scale' = scale/sqrt(var+eps), shift' = bias - mean*scale'. Lets a fused
    kernel consume BN without materializing its input, while keeping the
    variable tree bit-identical to the unfused path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        s = scale * jax.lax.rsqrt(var.value + 1e-5)
        return s, bias - mean.value * s


class _HANCParams(nn.Module):
    """Parameter mirror of HANCLayer (cnv + bn subtree) for the fused
    inference kernel."""

    in_ch: int
    out_ch: int
    k: int

    @nn.compact
    def __call__(self):
        nv = 2 * self.k - 1
        kernel, bias = _Conv1x1Params(self.in_ch * nv, self.out_ch, name="cnv")()
        s, t = _BNParams(self.out_ch, name="bn")()
        return kernel[0, 0].reshape(self.in_ch, nv, self.out_ch), bias, s, t


class _Conv1x1Params(nn.Module):
    """Holds a 1x1 conv's parameters under the standard names so checkpoint
    porting stays mechanical while the op itself is decomposed."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.out_features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,), jnp.float32)
        return kernel, bias


class HANCLayer(nn.Module):
    """HANC aggregation + 1x1 mix, computed the TPU way.

    Mathematically identical to the reference (build the (2k-1)-variant
    per-channel-interleaved stack, then 1x1 conv — ACC_UNet/ACC_UNet.py:77-142)
    but decomposed: the 1x1 kernel is sliced per pyramid variant and each
    pooled branch is matmul'd at its *low* resolution before nearest
    upsampling (matmul commutes with nearest-neighbour upsampling; equal up
    to fp reassociation). This removes the (2k-1)*C concat materialization —
    the OOM
    hazard for the inv_fctr=34 decoder block — and cuts HANC matmul FLOPs
    ~3x for k=3.
    """

    out_chnl: int
    k: int
    dtype: Dtype = jnp.float32
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.k
        nv = 2 * k - 1

        if self.layout == "s2d":
            from accunet_tpu.ops import s2d

            c = x.shape[-1] // 4
            kernel, bias = _Conv1x1Params(c * nv, self.out_chnl, name="cnv")()
            w = kernel.reshape(c, nv, self.out_chnl)
            y = s2d.hanc_mix_frame(x, w.astype(x.dtype), bias.astype(x.dtype), k)
            return lrelu(batch_norm_frame(y, train, self.dtype))

        c = x.shape[-1]
        kernel, bias = _Conv1x1Params(c * nv, self.out_chnl, name="cnv")()
        # interleaved input channel c*(2k-1)+j == (channel c, variant j)
        w = kernel.reshape(c, nv, self.out_chnl).astype(x.dtype)

        # HBM-traffic-optimal evaluation (the pyramid dominated the model's
        # bytes: 810 of 1312 MB/img on v5e before this): hierarchical
        # pooling + telescoped coarsest-first accumulation, fully fused in
        # VMEM by the Pallas kernel where it wins (h <= 64, measured 2x) and
        # evaluated by XLA elsewhere; backward always differentiates the XLA
        # formula (ops/pallas/hanc.py).
        from accunet_tpu.ops.pallas.hanc import hanc_mix

        y = hanc_mix(x, w, bias.astype(x.dtype), k)
        return lrelu(batch_norm(y, train, self.dtype))


class Conv2dBatchnorm(nn.Module):
    """conv → BN → LeakyReLU → SE (reference Conv2d_batchnorm / Conv2d_channel)."""

    num_out_filters: int
    kernel_size: tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32
    layout: str = "nhwc"  # 's2d': input/output in the frame (1x1 kernels only)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.layout == "s2d":
            assert self.kernel_size == (1, 1)
            from accunet_tpu.ops import s2d

            kernel, bias = _Conv1x1Params(
                x.shape[-1] // 4, self.num_out_filters, name="conv1"
            )()
            x = s2d.conv1x1(
                x.astype(self.dtype),
                kernel[0, 0].astype(self.dtype),
                bias.astype(self.dtype),
            )
            x = batch_norm_frame(x, train, self.dtype, name="batchnorm")
        else:
            x = nn.Conv(
                self.num_out_filters, self.kernel_size, padding="SAME",
                dtype=self.dtype, name="conv1",
            )(x)
            x = batch_norm(x, train, self.dtype, name="batchnorm")
        x = lrelu(x)
        return ChannelSELayer(
            self.num_out_filters, self.dtype, layout=self.layout, name="sqe"
        )(x, train)


class HANCBlock(nn.Module):
    n_filts: int
    out_channels: int
    k: int = 3
    inv_fctr: int = 3
    dtype: Dtype = jnp.float32
    layout: str = "nhwc"
    fuse: str = "auto"  # 'auto' | 'force' | 'off' — fused inference kernel
    defer_se: bool = False  # return DeferredSE when the fused path engages
    # (ROOFLINE §13.2/§13.4 chaining — the next same-level fused block
    # applies this block's SE on its own staged rows in VMEM)

    @nn.compact
    def __call__(self, inp, train: bool = False):
        e = self.n_filts * self.inv_fctr
        if self.layout == "s2d":
            return self._call_s2d(inp, train, e)
        if isinstance(inp, DeferredSE):  # non-frame consumer: XLA fallback
            inp = deferred_se_apply(inp)
        if not train and self._hybrid_nhwc_ok(inp, e):
            # ROOFLINE §6 hybrid: Pallas fuses the E-wide front half
            # (expand+BN+lrelu+dwconv+BN+lrelu — XLA spends two full HBM
            # round-trips of the interior there), the HANC mix + tail stay
            # in XLA where the (B·H·W, E) matmuls have enough rows to fill
            # the MXU (in-kernel per-tile mixes were fill/drain-bound at
            # E=4352). Identical variable tree via the param mirrors.
            from accunet_tpu.ops.pallas.expand_dw import expand_dw_nhwc

            k1, b1 = _ConvParams(1, 1, inp.shape[-1], e, name="conv1")()
            s1, t1 = _BNParams(e, name="norm1")()
            kd, bd = _DWConvParams(e, 3, name="conv2")()
            s2_, t2 = _BNParams(e, name="norm2")()
            x = expand_dw_nhwc(
                inp, k1[0, 0], b1, kd[:, :, 0, :], bd, (s1, t1), (s2_, t2),
                interpret=not on_tpu(),
            )
        else:
            x = nn.Conv(e, (1, 1), dtype=self.dtype, name="conv1")(inp)
            x = batch_norm(x, train, self.dtype, name="norm1")
            x = lrelu(x)

            x = DepthwiseConv(e, 3, self.dtype, name="conv2")(x)
            x = batch_norm(x, train, self.dtype, name="norm2")
            x = lrelu(x)

        x = HANCLayer(self.n_filts, self.k, self.dtype, name="hnc")(x, train)

        x = batch_norm(x + inp, train, self.dtype, name="norm")

        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv3")(x)
        x = batch_norm(x, train, self.dtype, name="norm3")
        x = lrelu(x)
        return ChannelSELayer(self.out_channels, self.dtype, name="sqe")(x, train)

    def _call_s2d(self, inp, train, e):
        """Frame-layout body — same parameter tree, ops from ops/s2d.py.

        (A variant that zero-padded the 96/192-wide interiors to 128-lane
        multiples for vreg-aligned frame slices was measured WORSE — the
        +33% bytes beat the alignment win: cnv12 1.34->1.70 ms, cnv91
        4.33->5.36 — and was removed.)

        Inference dispatches to the fused whole-block Pallas kernel
        (ops/pallas/hanc_block.py) — one VMEM-resident pass instead of seven
        HBM round-trips of the E-channel interior; the BN/conv variable tree
        is identical in both branches."""
        from accunet_tpu.ops import s2d

        deferred = isinstance(inp, DeferredSE)
        probe = inp.parts[0] if deferred else inp  # (B, Hf, Wf, cin|4cin)
        cin = probe.shape[-1] if deferred else probe.shape[-1] // 4
        if not train and self._fused_s2d_ok(probe, cin, chained=deferred):
            return self._call_s2d_fused(inp, train, e, cin)
        if deferred:
            inp = deferred_se_apply(inp)
        k1, b1 = _ConvParams(1, 1, cin, e, name="conv1")()
        x = s2d.conv1x1(inp, k1[0, 0].astype(inp.dtype), b1.astype(inp.dtype))
        x = lrelu(batch_norm_frame(x, train, self.dtype, name="norm1"))

        kd, bd = _DWConvParams(e, 3, name="conv2")()
        x = s2d.dwconv3x3(x, kd[:, :, 0, :].astype(x.dtype), bd.astype(x.dtype))
        x = lrelu(batch_norm_frame(x, train, self.dtype, name="norm2"))

        x = HANCLayer(self.n_filts, self.k, self.dtype, layout="s2d", name="hnc")(x, train)

        x = batch_norm_frame(x + inp, train, self.dtype, name="norm")

        k3, b3 = _ConvParams(1, 1, self.n_filts, self.out_channels, name="conv3")()
        x = s2d.conv1x1(x, k3[0, 0].astype(x.dtype), b3.astype(x.dtype))
        x = batch_norm_frame(x, train, self.dtype, name="norm3")
        x = lrelu(x)
        return ChannelSELayer(
            self.out_channels, self.dtype, layout="s2d", name="sqe"
        )(x, train)

    def _hybrid_nhwc_ok(self, inp, e) -> bool:
        import os

        if self.fuse == "off":
            return False
        # opt-in until the TPU A/B lands (Mosaic compile risk is opaque
        # through the relay — HTTP 500 with no message); fuse='force' (tests)
        # bypasses the env gate
        if self.fuse != "force" and os.environ.get(
            "ACCUNET_HYBRID_EXPAND_DW", "0"
        ) == "0":
            return False
        if self.fuse != "force" and not on_tpu():
            return False
        min_e = int(os.environ.get("ACCUNET_HYBRID_E_MIN", "2048"))
        if self.fuse != "force" and e < min_e:
            return False  # only the inv_fctr=34 block is bytes-bound enough
        if e % 128:
            return False  # lane-aligned interiors only (cnv72: 4352 = 34*128)
        from accunet_tpu.ops.pallas.expand_dw import pick_tile_nhwc

        _, h, w, cin = inp.shape
        return pick_tile_nhwc(h, w, e, cin) is not None

    def _fused_s2d_ok(self, inp, cin, chained: bool = False) -> bool:
        import os

        if self.fuse == "off" or os.environ.get("ACCUNET_FUSED_HANC", "1") == "0":
            return False
        if self.fuse != "force" and not on_tpu():
            return False
        if self.n_filts != cin or self.k > 3:
            return False  # residual needs nf == cin; kernel supports k<=3
        min_e = int(os.environ.get("ACCUNET_FUSED_HANC_MIN_E", "96"))
        if self.fuse != "force" and self.n_filts * self.inv_fctr < min_e:
            return False  # default 96: measured whole-model A/B on v5e
            # (ROOFLINE §10): minE=96 463.3 vs minE=128 391.4 img/s b8 —
            # the unfused E96 XLA path scales worse with batch than the
            # fused kernel's program-count overhead
        from accunet_tpu.ops.pallas.hanc_block import pick_tile

        _, hf, wf, _ = inp.shape
        e = self.n_filts * self.inv_fctr
        if pick_tile(hf, self.k, wf, e, self.n_filts, cin,
                     chained=chained) is None:
            return False
        if self.k >= 2 and (hf % 2 or wf % 2):
            return False
        return True

    def _call_s2d_fused(self, inp, train, e, cin):
        from accunet_tpu.ops.pallas.hanc_block import hanc_block_frame

        k1, b1 = _ConvParams(1, 1, cin, e, name="conv1")()
        s1, t1 = _BNParams(e, name="norm1")()
        kd, bd = _DWConvParams(e, 3, name="conv2")()
        s2_, t2 = _BNParams(e, name="norm2")()
        wh, bh, sh, th_ = _HANCParams(e, self.n_filts, self.k, name="hnc")()
        sres, tres = _BNParams(self.n_filts, name="norm")()
        k3, b3 = _ConvParams(1, 1, self.n_filts, self.out_channels, name="conv3")()
        s3, t3 = _BNParams(self.out_channels, name="norm3")()
        call_kw = dict(emit_sums=True)
        if isinstance(inp, DeferredSE):
            # chained input: the previous block's SE runs on this kernel's
            # staged rows (pre = [gate*scale, shift] per image)
            call_kw["x_parts"] = inp.parts
            call_kw["pre"] = jnp.stack(
                [inp.gs, jnp.broadcast_to(inp.tb[None], inp.gs.shape)], axis=1
            )
            xf_in = None
        else:
            xf_in = inp
        if self.defer_se:
            call_kw["emit_parts"] = True
        y, sums = hanc_block_frame(
            xf_in, k1[0, 0], b1, kd[:, :, 0, :], bd, wh, bh, k3[0, 0], b3,
            {
                "norm1": (s1, t1),
                "norm2": (s2_, t2),
                "hnc": (sh, th_),
                "norm": (sres, tres),
                "norm3": (s3, t3),
            },
            self.k,
            interpret=not on_tpu(),
            **call_kw,
        )
        # SE squeeze from the kernel's per-tile channel sums: the global
        # mean never re-reads the (B, Hf, Wf, 4*cout) map from HBM
        b, hf, wf, _ = (y[0] if self.defer_se else y).shape
        squeezed = sums.sum(axis=(1, 2)) / (4 * hf * wf)
        if self.defer_se:
            # gate MLP off the sums (same math as ChannelSELayer with
            # `squeezed=`), SE-BN folded to an affine — the APPLY is left to
            # the consumer (in-kernel if it fuses, one XLA pass otherwise)
            (f1k, f1b), (f2k, f2b), s_se, t_se = _SEParams(
                self.out_channels, name="sqe"
            )()
            dt = y[0].dtype
            m = squeezed.astype(dt)
            h = lrelu(m @ f1k.astype(dt) + f1b.astype(dt))
            g = jax.nn.sigmoid(h @ f2k.astype(dt) + f2b.astype(dt))
            return DeferredSE(
                tuple(y), g.astype(jnp.float32) * s_se[None], t_se
            )
        return ChannelSELayer(
            self.out_channels, self.dtype, layout="s2d", name="sqe"
        )(y, train, squeezed=squeezed)


class _SEParams(nn.Module):
    """Parameter mirror of ChannelSELayer (fc1/fc2 Dense + bn BatchNorm,
    same names/shapes/inits) for fused kernels: returns the gate MLP weights
    and the folded BN affine."""

    num_channels: int

    @nn.compact
    def __call__(self):
        c = self.num_channels
        fc1 = _DenseParams(c, c // 8, name="fc1")()
        fc2 = _DenseParams(c // 8, c, name="fc2")()
        s, t = _BNParams(c, name="bn")()
        return fc1, fc2, s, t


class _DenseParams(nn.Module):
    """Parameter mirror of nn.Dense (kernel (in, out), bias)."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.din, self.dout),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dout,), jnp.float32)
        return kernel, bias


class ResPath(nn.Module):
    in_chnls: int
    n_lvl: int
    dtype: Dtype = jnp.float32
    layout: str = "nhwc"
    fuse: str = "auto"  # 'auto' | 'force' | 'off' — fused level kernel (s2d)

    @nn.compact
    def __call__(self, x, train: bool = False):
        s2d_mode = self.layout == "s2d"
        if s2d_mode:
            from accunet_tpu.ops import s2d
        if s2d_mode and not train and self._fused_ok(x):
            return self._call_s2d_fused(x, train)
        bn = batch_norm_frame if s2d_mode else batch_norm
        for i in range(self.n_lvl):
            if s2d_mode:
                kc, bc = _ConvParams(
                    3, 3, self.in_chnls, self.in_chnls, name=f"convs_{i}"
                )()
                y = s2d.conv3x3(x, kc.astype(x.dtype), bc.astype(x.dtype))
            else:
                y = nn.Conv(
                    self.in_chnls, (3, 3), padding="SAME",
                    dtype=self.dtype, name=f"convs_{i}",
                )(x)
            y = bn(y, train, self.dtype, name=f"bns_{i}")
            y = ChannelSELayer(
                self.in_chnls, self.dtype, layout=self.layout, name=f"sqes_{i}"
            )(lrelu(y), train)
            x = x + y
        x = bn(x, train, self.dtype, name="bn")
        x = lrelu(x)
        # reference's final "sqe" is actually a second BatchNorm
        # (ACC_UNet/ACC_UNet.py:313)
        return bn(x, train, self.dtype, name="sqe")

    def _fused_ok(self, x) -> bool:
        import os

        if self.fuse == "off":
            return False
        # Default ON since the 2026-08-18 follow-up window (ROOFLINE §11):
        # after the Mosaic tiling fix the fused path measured 470.0 vs 462.8
        # img/s same-window (and 468.6 in a second confirmation run).
        if self.fuse != "force" and os.environ.get(
            "ACCUNET_FUSED_RESPATH", "1"
        ) == "0":
            return False
        if self.fuse != "force" and not on_tpu():
            return False
        c4 = x.shape[-1]
        if c4 % 128 or self.in_chnls % 8:
            return False  # aligned frame lanes; SE hidden dim C//8 >= 1
        return x.shape[1] % 2 == 0

    def _call_s2d_fused(self, x, train):
        """Fused level kernels (ops/pallas/respath.py): one pass per level
        instead of conv + SE-reduce + gate-apply + BN round-trips. Identical
        variable tree via the param mirrors; SE gate MLPs run in XLA off the
        kernel's channel sums."""
        from accunet_tpu.ops import s2d
        from accunet_tpu.ops.pallas.respath import respath_level_frame

        interpret = not on_tpu()
        b, hf, wf, c4 = x.shape
        c = self.in_chnls
        dt = x.dtype

        def tile4(v):
            return jnp.tile(v.astype(jnp.float32), 4)

        y_prev = gate_f = aff_se = None
        for i in range(self.n_lvl):
            kc, bc = _ConvParams(3, 3, c, c, name=f"convs_{i}")()
            s_bn, t_bn = _BNParams(c, name=f"bns_{i}")()
            (f1k, f1b), (f2k, f2b), s_se, t_se = _SEParams(
                c, name=f"sqes_{i}"
            )()
            wp = s2d.pack_conv3x3_kernel(kc)
            aff_bn = (tile4(s_bn), tile4(t_bn + bc * s_bn))
            y, x, sums = respath_level_frame(
                x, wp, aff_bn, y_prev, gate_f, aff_se, interpret=interpret,
            )
            # SE gate for THIS level from the kernel's channel sums
            m = sums.sum(axis=1).reshape(b, 4, c).sum(axis=1) / (4 * hf * wf)
            h = lrelu(m.astype(dt) @ f1k.astype(dt) + f1b.astype(dt))
            g = jax.nn.sigmoid(h @ f2k.astype(dt) + f2b.astype(dt))
            gate_f = jnp.tile(g, (1, 4))
            aff_se = (tile4(s_se), tile4(t_se))
            y_prev = y

        # last level's SE apply + residual, then the two trailing BNs (XLA,
        # one fused elementwise chain)
        se = lrelu(
            (y_prev * gate_f[:, None, None, :]).astype(dt)
            * aff_se[0].astype(dt) + aff_se[1].astype(dt)
        )
        x = x + se
        x = lrelu(batch_norm_frame(x, train, self.dtype, name="bn"))
        return batch_norm_frame(x, train, self.dtype, name="sqe")


class _MLFCFusedConv(nn.Module):
    """Decomposed MLFC cross-level fusion (same trick as HANCLayer): the
    reference concatenates all 4 levels resampled to this level's resolution
    and applies Conv2d_batchnorm (1x1 conv → BN → LeakyReLU → SE,
    ACC_UNet/ACC_UNet.py:427-487). Here the 1x1 kernel is split per source
    level; upsampled sources are matmul'd at their native (low) resolution
    before nearest upsampling — identical math up to fp reassociation, with
    no (f1+f2+f3+f4)-channel intermediate. Param paths match the reference
    (conv1/batchnorm/sqe) for mechanical porting."""

    filts: Sequence[int]
    lvl: int
    dtype: Dtype = jnp.float32
    layout: str = "nhwc"  # 's2d': lvl-0 only — ins[0] and the output are frames

    @nn.compact
    def __call__(self, ins, train: bool = False):
        """`ins[src]`: source src's map already avg-pooled to this level's
        resolution for src <= lvl (the caller pools each source ONCE,
        hierarchically, and shares the pyramid across all four levels), and
        at native resolution for src > lvl (mixed low-res, then upsampled).

        layout='s2d' (lvl==0): ins[0] is the frame map; the src-0 slice runs
        as a frame 1x1 (block-diagonal matmul) and each src>0 term is mixed
        at native res, upsampled to the frame's spatial res, then position-
        broadcast — the logical nearest-2x upsample. Same math, no full-res
        NHWC intermediate (ROOFLINE §17)."""
        filts = list(self.filts)
        lvl = self.lvl
        frame = self.layout == "s2d"
        if frame:
            assert lvl == 0
            from accunet_tpu.ops import s2d
        kernel, bias = _Conv1x1Params(sum(filts), filts[lvl], name="conv1")()
        w = kernel[0, 0]  # (sum(filts), f_lvl)
        offs = [0]
        for f in filts:
            offs.append(offs[-1] + f)
        y = None
        for src in range(4):
            t = ins[src]
            wj = w[offs[src] : offs[src + 1]].astype(t.dtype)
            if frame and src == 0:
                term = s2d.conv1x1(t, wj)
            else:
                term = jax.lax.dot_general(
                    t, wj, (((t.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.promote_types(t.dtype, jnp.float32),
                ).astype(t.dtype)
                if frame:  # logical up by 2**src = up to frame res, then tile
                    if src > 1:
                        term = upsample_nearest(term, 2 ** (src - 1))
                    term = s2d.broadcast_positions(term)
                elif src > lvl:  # matmul at source res, then upsample
                    term = upsample_nearest(term, 2 ** (src - lvl))
            y = term if y is None else y + term
        if frame:
            y = y + s2d.tile4(bias).astype(y.dtype)
            y = batch_norm_frame(y, train, self.dtype, name="batchnorm")
        else:
            y = y + bias.astype(y.dtype)
            y = batch_norm(y, train, self.dtype, name="batchnorm")
        return ChannelSELayer(
            filts[lvl], self.dtype, layout=self.layout, name="sqe"
        )(lrelu(y), train)


class MLFC(nn.Module):
    in_filters: Sequence[int]  # (f1, f2, f3, f4)
    lenn: int = 1
    mode: str = "full"  # 'full' | 'lite' | 'w'
    dtype: Dtype = jnp.float32
    layouts: Sequence[str] = ("nhwc", "nhwc", "nhwc", "nhwc")  # lite mode only

    @nn.compact
    def __call__(self, x1, x2, x3, x4, train: bool = False):
        f1, f2, f3, f4 = self.in_filters

        if self.mode == "lite":
            # ACC_UNet_lite.py:424-431 — SE per level, no cross-level fusion.
            l1, l2, l3, l4 = self.layouts
            x1 = ChannelSELayer(f1, self.dtype, layout=l1, name="sqe1")(x1, train)
            x2 = ChannelSELayer(f2, self.dtype, layout=l2, name="sqe2")(x2, train)
            x3 = ChannelSELayer(f3, self.dtype, layout=l3, name="sqe3")(x3, train)
            x4 = ChannelSELayer(f4, self.dtype, layout=l4, name="sqe4")(x4, train)
            return x1, x2, x3, x4

        if self.mode == "w":
            w_blend = self.param("W", nn.initializers.zeros, (1,), jnp.float32)
        else:
            w_blend = None

        xs = (x1, x2, x3, x4)
        filts = (f1, f2, f3, f4)

        # Level-0 frame layout (ROOFLINE §17): x1 may arrive/leave in the
        # s2d frame; every lvl-0 op (1x1 convs, BNs, SE, blend) runs on the
        # frame map and cross-level traffic uses avg_positions /
        # broadcast_positions at the half resolution. Levels 1-3 stay NHWC.
        frame0 = self.layouts[0] == "s2d"
        if frame0:
            from accunet_tpu.ops import s2d

        def bn_lvl(x, lvl, name):
            if frame0 and lvl == 0:
                return batch_norm_frame(x, train, self.dtype, name=name)
            return batch_norm(x, train, self.dtype, name=name)

        lay = lambda lvl: "s2d" if (frame0 and lvl == 0) else "nhwc"

        for i in range(self.lenn):
            # hierarchical avg-pool pyramid per source, shared by all levels
            # (each source map is read once at full resolution instead of
            # once per destination level)
            pyr = []
            for src in range(4):
                maps = [xs[src]]
                if src == 0 and frame0:
                    maps.append(s2d.avg_positions(xs[0]))
                    for _ in range(2):
                        maps.append(avg_pool2d(maps[-1], 2))
                else:
                    for _ in range(3 - src):
                        maps.append(avg_pool2d(maps[-1], 2))
                pyr.append(maps)

            fused = []
            for lvl in range(4):
                ins = [
                    pyr[src][lvl - src] if src <= lvl else xs[src]
                    for src in range(4)
                ]
                y = _MLFCFusedConv(
                    filts, lvl, self.dtype, layout=lay(lvl),
                    name=f"cnv_blks{lvl + 1}_{i}",
                )(ins, train)
                y = bn_lvl(y, lvl, f"bns{lvl + 1}_{i}")
                fused.append(lrelu(y))

            merged = []
            for lvl in range(4):
                if frame0 and lvl == 0:
                    cat = s2d.interleave_channels_frame(fused[0], xs[0])
                else:
                    cat = interleave_channels(fused[lvl], xs[lvl])
                y = Conv2dBatchnorm(
                    filts[lvl], (1, 1), self.dtype, layout=lay(lvl),
                    name=f"cnv_mrg{lvl + 1}_{i}",
                )(cat, train)
                if self.mode == "w":
                    wb = w_blend.astype(y.dtype)
                    y = y * wb + xs[lvl] * (1 - wb)
                else:
                    y = y + xs[lvl]
                y = bn_lvl(y, lvl, f"bns_mrg{lvl + 1}_{i}")
                merged.append(lrelu(y))
            xs = tuple(merged)

        out = []
        for lvl in range(4):
            out.append(
                ChannelSELayer(
                    filts[lvl], self.dtype, layout=lay(lvl), name=f"sqe{lvl + 1}"
                )(xs[lvl], train)
            )
        return tuple(out)
