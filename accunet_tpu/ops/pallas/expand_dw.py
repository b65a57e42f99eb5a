"""Hybrid HANCBlock front half: fused 1x1 expand + BN + lrelu + depthwise
3x3 + BN + lrelu, NHWC, one Pallas kernel.

This is ROOFLINE §6's "hybrid cnv72" lever: the canonical decoder block
(inv_fctr=34, E=4352 at 56², ACC_UNet/ACC_UNet.py:584) is bytes-bound on its
E-wide interior. A whole-block kernel loses there — the per-tile HANC mix
matmuls are MXU fill/drain-bound at huge K (measured 3.98 vs 2.66 ms XLA
nhwc) — but the *front half* (expand + dwconv) is the part XLA executes with
two full HBM round-trips of the interior while the kernel needs one write.
The mix + tail stay in XLA where the (B·H·W, K) matmul has enough rows to
fill the MXU.

Layout: plain NHWC (the production path keeps level 3 out of the s2d frame);
E is a lane-multiple for the interesting blocks (4352 = 34·128). Grid
(B, H/th); halo rows staged exactly like ops/pallas/hanc_block.py (row-padded
input, two-block staging, post-activation zero masking for SAME padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _kernel(xa_ref, xb_ref, w1_ref, wd_ref, affe_ref, out_ref, *, cin, e,
            th, h):
    hi = pl.program_id(1)
    xt = jnp.concatenate([xa_ref[0], xb_ref[0, :2]], axis=0)  # (th+2, W, cin)
    w = xt.shape[1]
    dt = xt.dtype
    affe = affe_ref[:]

    def lrelu(t):
        return jnp.maximum(t, t * jnp.asarray(0.01, t.dtype))

    row = lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0) + (hi * th - 1)
    in_image = jnp.logical_and(row >= 0, row < h).astype(dt)

    s1, t1 = affe[0].astype(dt), affe[1].astype(dt)
    y = lax.dot_general(
        xt.reshape(-1, cin), w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt).reshape(th + 2, w, e)
    y = lrelu(y * s1 + t1) * in_image
    q = jnp.pad(y, ((0, 0), (1, 1), (0, 0)))  # (th+2, W+2, e)

    s2, t2 = affe[2].astype(dt), affe[3].astype(dt)
    wd = wd_ref[:]
    acc = None
    for u in (-1, 0, 1):
        for v in (-1, 0, 1):
            src = q[1 + u:1 + u + th, 1 + v:1 + v + w, :]
            term = src * wd[3 * (u + 1) + (v + 1)].astype(dt)
            acc = term if acc is None else acc + term
    out_ref[0] = lrelu(acc * s2 + t2)


def pick_tile_nhwc(h: int, w: int, e: int, cin: int) -> int | None:
    """Largest row tile whose working set fits the ~16M scoped-vmem limit.
    th >= 2: the bottom halo is staged as the first 2 rows of the NEXT row
    block, so a block must hold at least 2 rows."""
    for th in (8, 4, 2):
        if h % th:
            continue
        interior = (th + 2) * (w + 2) * e * 2 + th * w * e * 2  # q + out tile
        io = 2 * th * w * cin * 2 + th * w * e * 2
        weights = (cin * e + 9 * e + 4 * e) * 2
        if interior + io + weights < 16 * 2**20:
            return th
    return None


def expand_dw_nhwc(x, w1, b1, wd, bd, bn1, bn2, *, interpret=False, th=None):
    """Fused expand+dwconv front half of a HANCBlock, NHWC.

    x (B,H,W,cin); w1 (cin,E), wd (3,3,E), b1/bd conv biases; bn1/bn2 folded
    BN (scale, shift) pairs. Returns the post-second-lrelu interior
    (B,H,W,E) — exactly what the unfused path feeds HANCLayer.
    """
    b, h, w, cin = x.shape
    e = w1.shape[1]
    if th is None:
        th = pick_tile_nhwc(h, w, e, cin)
    assert th is not None and h % th == 0

    def fold(pair, bias):
        s, t = pair
        if bias is not None:
            t = t + bias.astype(t.dtype) * s
        return s.astype(jnp.float32), t.astype(jnp.float32)

    s1, t1 = fold(bn1, b1)
    s2, t2 = fold(bn2, bd)
    affe = jnp.stack([s1, t1, s2, t2])  # (4, e) fp32

    dt = x.dtype
    xpad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, cin=cin, e=e, th=th, h=h),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, cin), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, th, w, cin), lambda bi, hi: (bi, hi + 1, 0, 0)),
            pl.BlockSpec((cin, e), lambda bi, hi: (0, 0)),
            pl.BlockSpec((9, e), lambda bi, hi: (0, 0)),
            pl.BlockSpec((4, e), lambda bi, hi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w, e), lambda bi, hi: (bi, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, e), dt),
        interpret=interpret,
    )(xpad, xpad, w1.astype(dt), wd.reshape(9, e).astype(dt), affe)
    return out
