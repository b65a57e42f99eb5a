"""Space-to-depth ("s2d") execution frame for small-channel conv levels.

Motivation (v5e, chain-delta measurements in benchmarks/bench_hanc.py style):
ACC-UNet's level-1/2 feature maps have 3..96 channels at 224^2/112^2. On TPU
the 128-wide lane dimension makes that regime pathological:
  * a 3x3 conv at 224^2 costs ~0.78 ms whether C is 32 or 128 — at C=32 the
    MXU runs at ~9.5 TFLOP/s (5% peak) against the same wall-clock floor,
  * HANC's pool/upsample pyramid at C=96 spends ~1.4 ms in sublane/lane
    relayout passes per layer.

The s2d frame stores a logical (B, H, W, C) map as (B, H/2, W/2, 4C) where
flat channel p*C + c holds sub-position p = 2*di + dj of channel c
("position-major"). Consequences:
  * 3x3 convs run as dense convs on 4C>=128 channels at half resolution with
    an exactly-packed (3,3,4C,4C') kernel (4x the MACs, ~15x the MXU
    utilisation -> measured 0.53 vs 0.78 ms for level 1),
  * 2x2 avg/max pooling == a reduction over the 4 position blocks (pure
    lane math; the result lands in the NORMAL frame at half resolution, so
    the between-level MaxPool consumes the frame for free),
  * nearest 2x upsample == tiling a normal half-res map across the 4
    position blocks (pure lane math) — this removes HANC's dominant cost,
  * ConvTranspose2d(k=2,s=2) == a plain matmul producing the frame directly
    (y position block p = x @ w[di,dj]), with no spatial work at all,
  * elementwise/BN/SE act per (position, channel) with jnp.tile'd vectors.

Everything here is numerically EXACT vs the standard-layout ops (same taps,
same order up to fp reassociation); tests/test_s2d.py asserts it.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _acc_type(dtype):
    """Matmul accumulator/output type: f32 for bf16/f32 inputs (the TPU MXU
    path), but promoted for f64 so float64 parity runs stay float64."""
    return jnp.promote_types(dtype, jnp.float32)


def pack(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), position-major."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def unpack(y: jax.Array) -> jax.Array:
    """(B, H/2, W/2, 4C) -> (B, H, W, C)."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    x = y.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def tile4(v: jax.Array) -> jax.Array:
    """Per-channel vector (C,) -> frame vector (4C,) (position-major)."""
    return jnp.tile(v, 4)


def _pos_blocks(xf: jax.Array):
    """The four position blocks of a frame map (static lane slices — these
    fuse into consumers, unlike an (..., 4, C) reshape view)."""
    c = xf.shape[-1] // 4
    return [xf[..., p * c : (p + 1) * c] for p in range(4)]


def avg_positions(xf: jax.Array) -> jax.Array:
    """Frame -> NORMAL half-res map: 2x2 avg pool of the logical map."""
    q = _pos_blocks(xf)
    return ((q[0] + q[1]) + (q[2] + q[3])) * jnp.asarray(0.25, xf.dtype)


def max_positions(xf: jax.Array) -> jax.Array:
    """Frame -> NORMAL half-res map: 2x2 max pool of the logical map."""
    q = _pos_blocks(xf)
    return jnp.maximum(jnp.maximum(q[0], q[1]), jnp.maximum(q[2], q[3]))


def max_positions_pack(xf: jax.Array) -> jax.Array:
    """Frame level-k -> frame level-(k+1) in ONE op chain: 2x2 max pool of
    the logical map (the position-block maxima) re-packed into the next
    frame level. Equals pack(max_positions(xf)) — ROOFLINE §13.4, fusing
    the boundary reshape/transpose pair into a single XLA fusion instead of
    a materialized half-res NHWC intermediate."""
    b, h, w, c4 = xf.shape
    c = c4 // 4
    q = _pos_blocks(xf)
    m = jnp.maximum(jnp.maximum(q[0], q[1]), jnp.maximum(q[2], q[3]))
    y = m.reshape(b, h // 2, 2, w // 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def broadcast_positions(x: jax.Array) -> jax.Array:
    """NORMAL half-res map -> frame: nearest 2x upsample of the logical map."""
    return jnp.concatenate([x, x, x, x], axis=-1)


def interleave_channels_frame(af: jax.Array, bf: jax.Array) -> jax.Array:
    """Channel-interleave two frame maps (the logical-map equivalent of
    ops.pooling.interleave_channels): per position block p, out block p is
    [a_p0, b_p0, a_p1, b_p1, ...]. Used by the frame-layout MLFC merge."""
    b, h, w, c4 = af.shape
    c = c4 // 4
    a = af.reshape(b, h, w, 4, c)
    bb = bf.reshape(b, h, w, 4, c)
    return jnp.stack([a, bb], axis=-1).reshape(b, h, w, 8 * c)


def global_avg_pool(xf: jax.Array) -> jax.Array:
    """AdaptiveAvgPool2d(1) of the logical map: frame -> (B, C)."""
    b = xf.shape[0]
    c = xf.shape[-1] // 4
    return jnp.mean(xf.reshape(b, -1, 4, c), axis=(1, 2))


# ------------------------------------------------------------------- convs

_S2D_GEOM = []  # (pos_out, tap_u, tap_v) -> (pos_in, shift_i, shift_j)
for _po in range(4):
    _di, _dj = _po // 2, _po % 2
    for _u in (-1, 0, 1):
        for _v in (-1, 0, 1):
            _si, _sj = _di + _u, _dj + _v
            _pi, _pj = _si % 2, _sj % 2
            _S2D_GEOM.append(
                (_po, _u, _v, _pi * 2 + _pj, (_si - _pi) // 2, (_sj - _pj) // 2)
            )


def pack_conv3x3_kernel(w: jax.Array) -> jax.Array:
    """(3, 3, C, O) HWIO kernel -> (3, 3, 4C, 4O) frame kernel (exact)."""
    c, o = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4, c, 4, o), w.dtype)
    for po, u, v, pi, gi, gj in _S2D_GEOM:
        out = out.at[gi + 1, gj + 1, pi, :, po, :].add(w[u + 1, v + 1])
    return out.reshape(3, 3, 4 * c, 4 * o)


def conv3x3(xf: jax.Array, w: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """3x3 'SAME' conv of the logical map, computed in-frame.

    w is the ordinary (3, 3, C, O) kernel; it is packed at trace time (the
    pack is a scatter of the 36-element weight — free next to the conv)."""
    wp = pack_conv3x3_kernel(w).astype(xf.dtype)
    y = lax.conv_general_dilated(
        xf, wp, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    if bias is not None:
        y = y + tile4(bias).astype(y.dtype)
    return y


def conv1x1(xf: jax.Array, w: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """1x1 conv of the logical map: ONE dense (4C, 4O) matmul with the (C, O)
    kernel placed block-diagonally (exact — the off-block zeros contribute
    +0.0 terms to the fp32 accumulator).

    Measured on v5e at the cnv91 decoder block (256->768 frame, 112^2 b8):
    per-position-block matmuls on lane slices cost 1.74 ms (the 192-lane
    offsets defeat alignment and each block is a separate fusion); this
    dense form is one aligned MXU pass (~4x the MACs, still compute-cheap)."""
    c, o = w.shape
    wt = w.astype(xf.dtype)
    wd = jnp.zeros((4, c, 4, o), wt.dtype)
    for p in range(4):
        wd = wd.at[p, :, p, :].set(wt)
    y = lax.dot_general(
        xf, wd.reshape(4 * c, 4 * o), (((3,), (0,)), ((), ())),
        preferred_element_type=_acc_type(xf.dtype),
    ).astype(xf.dtype)
    if bias is not None:
        y = y + tile4(bias).astype(y.dtype)
    return y


def conv1x1_blocked(xf: jax.Array, w: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """Per-position-block matmul form of conv1x1 (kept for benchmarking)."""
    wt = w.astype(xf.dtype)
    outs = []
    for q in _pos_blocks(xf):
        y = lax.dot_general(
            q, wt, (((3,), (0,)), ((), ())), preferred_element_type=_acc_type(xf.dtype)
        ).astype(xf.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        outs.append(y)
    return jnp.concatenate(outs, axis=-1)


def _dwconv3x3_impl(xf: jax.Array, w: jax.Array) -> jax.Array:
    b, h, wd, c4 = xf.shape
    c = c4 // 4
    xp = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)))

    outs = []
    for po in range(4):
        acc = None
        for po2, u, v, pi, gi, gj in _S2D_GEOM:
            if po2 != po:
                continue
            src = xp[:, 1 + gi : 1 + gi + h, 1 + gj : 1 + gj + wd,
                     pi * c : (pi + 1) * c]
            term = src * w[u + 1, v + 1].astype(xf.dtype)
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


@jax.custom_vjp
def _dwconv3x3_cvjp(xf: jax.Array, w: jax.Array) -> jax.Array:
    return _dwconv3x3_impl(xf, w)


def _dwconv3x3_fwd(xf, w):
    return _dwconv3x3_impl(xf, w), (xf, w)


def _dwconv3x3_bwd(res, gf):
    """Hand-written transpose (ROOFLINE §22): XLA's autodiff of the slice-
    form forward transposes every tap into a zero-PAD + accumulate, so the
    dgrad materializes ~9 padded copies of the E-wide frame per position
    (the `pad_add_fusion` rows that dominated the §15 train-step bwd:
    2.7 ms on cnv91 alone). The transpose of a shifted SLICE is a shifted
    slice of the padded cotangent — structurally identical to the forward:
    pad gf ONCE, 9 static slices per position block, one fused read each.

    dgrad geometry: fwd entry (po, u, v, pi, gi, gj) sends x[pi][i, j] to
    out[po][i - gi, j - gj], so dx[pi][i, j] += w[u, v] * gf[po][i - gi,
    j - gj] — the same tap table with (po <-> pi) roles swapped and the
    frame shift negated.  wgrad: dw[u, v, :] = sum over the tap's four
    (po, pi) pairs of <shifted x, gf[po]> reduced over (B, Hf, Wf),
    accumulated in f32 (autodiff reduces in the primal dtype; f32 is
    strictly tighter — grad-parity is asserted in f64 where both agree,
    tests/test_s2d.py::test_dwconv3x3_custom_vjp_grads)."""
    xf, w = res
    b, h, wd, c4 = xf.shape
    c = c4 // 4
    dt = xf.dtype
    gp = jnp.pad(gf, ((0, 0), (1, 1), (1, 1), (0, 0)))

    dx = []
    for pi_want in range(4):
        acc = None
        for po, u, v, pi, gi, gj in _S2D_GEOM:
            if pi != pi_want:
                continue
            src = gp[:, 1 - gi : 1 - gi + h, 1 - gj : 1 - gj + wd,
                     po * c : (po + 1) * c]
            term = src * w[u + 1, v + 1].astype(dt)
            acc = term if acc is None else acc + term
        dx.append(acc)
    dxf = jnp.concatenate(dx, axis=-1)

    at = _acc_type(dt)
    xp = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for u in (-1, 0, 1):
        for v in (-1, 0, 1):
            acc = None
            for po, u2, v2, pi, gi, gj in _S2D_GEOM:
                if (u2, v2) != (u, v):
                    continue
                src = xp[:, 1 + gi : 1 + gi + h, 1 + gj : 1 + gj + wd,
                         pi * c : (pi + 1) * c]
                t = jnp.sum(
                    src.astype(at) * gf[..., po * c : (po + 1) * c].astype(at),
                    axis=(0, 1, 2),
                )
                acc = t if acc is None else acc + t
            taps.append(acc)
    dw = jnp.stack(taps).reshape(3, 3, c).astype(w.dtype)
    return dxf, dw


_dwconv3x3_cvjp.defvjp(_dwconv3x3_fwd, _dwconv3x3_bwd)


def dwconv3x3(xf: jax.Array, w: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """Depthwise 3x3 'SAME' conv of the logical map, in-frame.

    Plane formulation: each output position block is a 9-tap sum of
    spatially shifted position blocks scaled by the per-channel tap weight —
    all lane-aligned VPU math at half resolution. The frame is padded ONCE
    and every term is a static slice of that single buffer, so XLA fuses
    the taps into one read per output block (4 separately padded plane
    copies measured 0.91 ms vs 0.20 for the standard layout; this form
    removes the extra materializations). w: (3, 3, C).

    The backward runs a hand-written slice-form transpose (custom VJP, see
    _dwconv3x3_bwd; ACCUNET_DWCONV_VJP=0 reverts to XLA autodiff for A/B).
    """
    import os

    if os.environ.get("ACCUNET_DWCONV_VJP", "1") == "0":
        y = _dwconv3x3_impl(xf, w)
    else:
        y = _dwconv3x3_cvjp(xf, w)
    if bias is not None:
        y = y + tile4(bias).astype(y.dtype)
    return y


def dwconv3x3_unpack(xf: jax.Array, w: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """Depthwise 3x3 of the logical map via unpack -> grouped conv -> pack
    (kept for benchmarking against the in-frame 9-tap form)."""
    from accunet_tpu.ops.pallas.dwconv2d import dwconv2d

    return pack(dwconv2d(unpack(xf), w, bias))


def conv_transpose_2x2_to_frame(x: jax.Array, w: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """torch ConvTranspose2d(k=2, s=2) whose OUTPUT lands in the s2d frame.

    x: NORMAL (B, H, W, I) map; w: (2, 2, I, O); output frame (B, H, W, 4O)
    representing the logical (B, 2H, 2W, O) map. Position block p=(di,dj) is
    simply x @ w[di, dj] — a transposed conv with k == s has no overlap, so
    each output sub-position depends on exactly one input pixel."""
    outs = []
    for po in range(4):
        di, dj = po // 2, po % 2
        y = lax.dot_general(
            x, w[di, dj].astype(x.dtype), (((3,), (0,)), ((), ())),
            preferred_element_type=_acc_type(x.dtype),
        ).astype(x.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        outs.append(y)
    return jnp.concatenate(outs, axis=-1)


def concat_channels(af: jax.Array, bf: jax.Array) -> jax.Array:
    """Channel-concat of two frame maps (position-major blocks interleave)."""
    b, h, w, ca4 = af.shape
    cb4 = bf.shape[-1]
    ca, cb = ca4 // 4, cb4 // 4
    ra = af.reshape(b, h, w, 4, ca)
    rb = bf.reshape(b, h, w, 4, cb)
    return jnp.concatenate([ra, rb], axis=-1).reshape(b, h, w, 4 * (ca + cb))


def hanc_mix_frame(xf: jax.Array, w: jax.Array, bias: jax.Array, k: int) -> jax.Array:
    """HANC aggregation + 1x1 mix of the logical map, in-frame.

    Same telescoped math as nn.acc_blocks.HANCLayer, but the level-1 pool is
    a position reduce (lane math) and the final upsample-add is a position
    broadcast (lane math) — the two ops that dominate the standard-layout
    cost at full resolution. w: (C, 2k-1, Cout)."""
    from accunet_tpu.ops.pooling import avg_pool2d, max_pool2d, upsample_nearest

    cout = w.shape[-1]

    def mix(t, j):
        out = lax.dot_general(
            t, w[:, j, :].astype(t.dtype), (((t.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=_acc_type(t.dtype),
        )
        return out.astype(t.dtype)

    if k == 1:
        return conv1x1(xf, w[:, 0, :], None) + tile4(bias).astype(xf.dtype)

    # level-1 pools leave the frame (half-res normal maps) via lane reduces
    avg_maps = [avg_positions(xf)]
    max_maps = [max_positions(xf)]
    for _ in range(2, k):
        avg_maps.append(avg_pool2d(avg_maps[-1], 2))
        max_maps.append(max_pool2d(max_maps[-1], 2))

    acc = None
    for i in range(k - 1, 0, -1):  # coarsest first
        term = mix(avg_maps[i - 1], i) + mix(max_maps[i - 1], k - 1 + i)
        acc = term if acc is None else term + upsample_nearest(acc, 2)
    # acc is a normal map at frame resolution; entering the frame == tiling
    # across position blocks. The identity branch is ONE dense block-diagonal
    # matmul (see conv1x1) and the telescoped sum broadcasts across the four
    # position blocks in the same fused epilogue.
    add = acc + bias.astype(acc.dtype)
    return conv1x1(xf, w[:, 0, :], None) + broadcast_positions(add)
