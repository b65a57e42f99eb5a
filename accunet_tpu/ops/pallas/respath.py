"""Fused ResPath level kernel in the s2d frame (ROOFLINE §6 lever 3).

A ResPath level (ACC_UNet/ACC_UNet.py:290-328) is
    y = lrelu(BN(conv3x3(x))); y = SE(y); x = x + y
where SE needs a GLOBAL per-image channel mean of y — a barrier no single
row-tiled kernel can cross. The fusion therefore splits per level:

  kernel_i:  (x_{i-1}, y_{i-1}, g_{i-1}) -> x_i = x_{i-1} + se_apply(...)
             -> y_i = lrelu(BN(conv3x3(x_i))) -> (y_i, x_i, channel sums)
  XLA:       g_i = sigmoid(fc2(lrelu(fc1(mean)))) from the sums  (tiny)

so each level is ONE pass over the maps (read x,y + write x,y) instead of
the unfused path's conv + reduce + gate-apply + BN round-trips. The final
level's se_apply + the two trailing BNs stay in XLA (elementwise).

All hot arrays are the packed 4C-lane frame (128-aligned for the L1/L2
ResPaths) and the conv is the dense packed-kernel form (9 shifted 4Cx4C
matmuls — the same formulation ops/s2d.py:conv3x3 feeds XLA, so the math is
identical)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _kernel(x_ref, xb_ref, y_ref, yb_ref, g_ref, wp_ref, aff_ref,
            y_out, x_out, sums_out, *, c4, th, hf, has_prev):
    hi = pl.program_id(1)
    dt = x_ref.dtype

    def lrelu(t):
        return jnp.maximum(t, t * jnp.asarray(0.01, t.dtype))

    xt = jnp.concatenate([x_ref[0], xb_ref[0, :2]], axis=0)  # (th+2, wf, 4C)
    wf = xt.shape[1]
    aff = aff_ref[:]  # (4, c4): s_bn, t_bn, s_se, t_se

    if has_prev:
        yt = jnp.concatenate([y_ref[0], yb_ref[0, :2]], axis=0)
        g = g_ref[0, 0]  # (4C,) per-image frame-tiled gate vector
        s_se, t_se = aff[2].astype(dt), aff[3].astype(dt)
        xt = xt + lrelu((yt * g.reshape(1, 1, c4)) * s_se + t_se)

    row = lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0) + (hi * th - 1)
    in_image = jnp.logical_and(row >= 0, row < hf).astype(dt)
    xm = xt * in_image                      # SAME padding = zero halo rows
    xp = jnp.pad(xm, ((0, 0), (1, 1), (0, 0)))

    acc = None
    for t in range(9):
        gi, gj = t // 3 - 1, t % 3 - 1
        src = xp[1 + gi:1 + gi + th, 1 + gj:1 + gj + wf, :]
        term = lax.dot_general(
            src.reshape(-1, c4), wp_ref[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = term if acc is None else acc + term
    acc = acc.reshape(th, wf, c4)
    s_bn, t_bn = aff[0], aff[1]
    y1 = lrelu((acc * s_bn + t_bn).astype(dt))

    y_out[0] = y1
    x_out[0] = xt[1:1 + th]
    sums_out[0, 0, 0] = y1.astype(jnp.float32).sum(axis=(0, 1))


def respath_level_frame(xf, wpacked, aff_bn, y_prev=None, gate=None,
                        aff_se=None, *, th=None, interpret=False):
    """One fused ResPath level step on frame maps.

    xf: (B, Hf, Wf, 4C) — x_{i-1}. wpacked: (3, 3, 4C, 4C) packed conv
    kernel (s2d.pack_conv3x3_kernel, conv bias folded into aff_bn's shift).
    aff_bn / aff_se: folded (scale, shift) pairs, frame-tiled (4C,).
    y_prev/gate: previous level's y and its frame-tiled SE gate (B, 4C).

    Returns (y_i, x_i, sums) with sums (B, Hf/th, 4C) — per-tile channel
    sums of y_i for the SE mean.
    """
    b, hf, wf, c4 = xf.shape
    if th is None:
        for cand in (8, 4, 2):
            if hf % cand == 0:
                th = cand
                break
    assert th is not None and hf % th == 0
    has_prev = y_prev is not None
    dt = xf.dtype

    s_bn, t_bn = aff_bn
    if aff_se is None:
        aff_se = (jnp.ones((c4,)), jnp.zeros((c4,)))
    aff = jnp.stack([
        s_bn.astype(jnp.float32), t_bn.astype(jnp.float32),
        aff_se[0].astype(jnp.float32), aff_se[1].astype(jnp.float32),
    ])

    xpad = jnp.pad(xf, ((0, 0), (1, 1), (0, 0), (0, 0)))
    ypad = jnp.pad(y_prev, ((0, 0), (1, 1), (0, 0), (0, 0))) if has_prev \
        else xpad  # dummy (never read)
    # Mosaic tiling: a block's last two dims must be (8k, 128k) or span the
    # whole array dim — so the per-image gate rides as (B, 1, 4C) and the
    # per-tile sums come out (B, Hf/th, 1, 4C) (measured failure in the
    # 2026-08-18 A/B window, ROOFLINE §10: block (1, c4) over array (8, 128)
    # rejected by the lowering).
    g = gate.astype(dt) if gate is not None else jnp.zeros((b, c4), dt)
    g = g.reshape(b, 1, c4)
    wp = jnp.transpose(wpacked, (0, 1, 2, 3)).reshape(9, c4, c4).astype(dt)

    y1, xn, sums = pl.pallas_call(
        functools.partial(_kernel, c4=c4, th=th, hf=hf, has_prev=has_prev),
        grid=(b, hf // th),
        in_specs=[
            pl.BlockSpec((1, th, wf, c4), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, th, wf, c4), lambda bi, hi: (bi, hi + 1, 0, 0)),
            pl.BlockSpec((1, th, wf, c4), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, th, wf, c4), lambda bi, hi: (bi, hi + 1, 0, 0)),
            pl.BlockSpec((1, 1, c4), lambda bi, hi: (bi, 0, 0)),
            pl.BlockSpec((9, c4, c4), lambda bi, hi: (0, 0, 0)),
            pl.BlockSpec((4, c4), lambda bi, hi: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, th, wf, c4), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, th, wf, c4), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, 1, c4), lambda bi, hi: (bi, hi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hf, wf, c4), dt),
            jax.ShapeDtypeStruct((b, hf, wf, c4), dt),
            jax.ShapeDtypeStruct((b, hf // th, 1, c4), jnp.float32),
        ],
        interpret=interpret,
    )(xpad, xpad, ypad, ypad, g, wp, aff)
    return y1, xn, sums.reshape(b, hf // th, c4)
