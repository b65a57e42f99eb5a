"""Fused HANC (Hierarchical Aggregation of Neighborhood Context) Pallas
kernel — the hot op of ACC-UNet (ACC_UNet/ACC_UNet.py:53-142; SURVEY §7.2
step 4's "fused HANC" milestone).

Math (identical to nn/acc_blocks.HANCLayer's decomposed-XLA path):
    y = x@w0 + Σ_{i=1..k-1} up_{2^i}( avg_{2^i}(x)@w_i + max_{2^i}(x)@w_{k-1+i} ) + bias
with the pyramid evaluated hierarchically and the sum telescoped coarsest-
first so every add except one runs at low resolution.

Why a kernel: XLA evaluates the pyramid as separate reduce-windows +
upsample-adds, reading the full-res x three times and doing several full-res
read-modify-writes — measured 80 MB/img of HBM traffic for one level-1 layer
on v5e vs the 12.8 MB ideal. The kernel stages one (th, W, C) tile in VMEM
and computes the pools (lane-preserving reshape + static slices; Mosaic
rejects multi-axis reductions and the inverse upsample reshape here) and ALL
(2k-1) mixes (MXU) on-chip, emitting the full-res mix plus the tiny low-res
mixed terms; the telescoped upsample-add runs in XLA on those small maps.
Traffic per level-1 layer drops from ~80 MB/img to ~30 MB/img.

Tiles are multiples of 2^(k-1) rows so pooling never crosses a tile boundary
(pool windows are aligned, stride == window).

Backward: custom_vjp whose bwd differentiates the XLA reference formula
(pools/upsamples are cheap to re-derive; training keeps XLA speed while
inference gets the fused path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _xla_hanc_mix(x, w, bias, k):
    """Reference/fallback: telescoped XLA evaluation (math of the kernel)."""
    from accunet_tpu.ops.pooling import avg_pool2d, max_pool2d, upsample_nearest

    def mix(t, j):
        out = jax.lax.dot_general(
            t, w[:, j, :].astype(t.dtype), (((t.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.astype(t.dtype)

    avg_maps, max_maps = [], []
    a = m = x
    for _ in range(1, k):
        a = avg_pool2d(a, 2)
        m = max_pool2d(m, 2)
        avg_maps.append(a)
        max_maps.append(m)
    acc = None
    for i in range(k - 1, 0, -1):
        term = mix(avg_maps[i - 1], i) + mix(max_maps[i - 1], k - 1 + i)
        acc = term if acc is None else term + upsample_nearest(acc, 2)
    y = mix(x, 0)
    if acc is not None:
        y = y + upsample_nearest(acc, 2)
    return y + bias.astype(y.dtype)


def _stage1_kernel(x_ref, w_ref, y0_ref, a_ref, m_ref, t1_ref, *, k):
    """Minimal fusion: one read of the full-res x tile produces the full-res
    mix, both scale-2 pools, and the scale-2 mixed term. Deeper pyramid
    levels + the telescoped add run in XLA on quarter-size data."""
    x = x_ref[0]  # (th, W, C)
    w = w_ref[:]
    th, wd, c = x.shape
    cout = w.shape[-1]

    def mix(t, j):
        tt = t.reshape(-1, c)
        out = jax.lax.dot_general(
            tt, w[:, j, :].astype(tt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.astype(x.dtype).reshape(t.shape[0], t.shape[1], cout)

    r = x.reshape(th // 2, 2, wd // 2, 2, c)
    q = [r[:, 0, :, 0, :], r[:, 0, :, 1, :], r[:, 1, :, 0, :], r[:, 1, :, 1, :]]
    a = ((q[0] + q[1]) + (q[2] + q[3])) * jnp.asarray(0.25, x.dtype)
    m = jnp.maximum(jnp.maximum(q[0], q[1]), jnp.maximum(q[2], q[3]))

    y0_ref[0] = mix(x, 0)
    a_ref[0] = a
    m_ref[0] = m
    t1_ref[0] = mix(a, 1) + mix(m, k)


def _kernel(x_ref, w_ref, *out_refs, k):
    x = x_ref[0]  # (th, W, C)
    w = w_ref[:]  # (C, nv, Cout)
    th, wd, c = x.shape
    cout = w.shape[-1]

    def mix(t, j):
        tt = t.reshape(-1, c)
        out = jax.lax.dot_general(
            tt, w[:, j, :].astype(tt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.astype(x.dtype).reshape(t.shape[0], t.shape[1], cout)

    def pool(t, kind):
        # 2x2 pooling via lane-preserving reshape + static slices (multi-axis
        # jnp reductions produce a layout Mosaic can't relayout downstream)
        h, ww, cc = t.shape
        r = t.reshape(h // 2, 2, ww // 2, 2, cc)
        q = [r[:, 0, :, 0, :], r[:, 0, :, 1, :], r[:, 1, :, 0, :], r[:, 1, :, 1, :]]
        if kind == "max":
            return jnp.maximum(jnp.maximum(q[0], q[1]), jnp.maximum(q[2], q[3]))
        s = (q[0] + q[1]) + (q[2] + q[3])
        return s * jnp.asarray(0.25, t.dtype)

    out_refs[0][0] = mix(x, 0)
    a = m = x
    for i in range(1, k):
        a = pool(a, "avg")
        m = pool(m, "max")
        out_refs[i][0] = mix(a, i) + mix(m, k - 1 + i)


def _pick_tile(h: int, wd: int, c: int, k: int, itemsize: int) -> int:
    """Largest row-tile that is pool-aligned and keeps the staged input tile
    ≤~700 KB (Mosaic pads pooled reshapes to 8 sublanes, inflating live VMEM
    several-fold past the raw tile size)."""
    s = 2 ** (k - 1)
    for th in (32, 16, 8, 4, 2, 1):
        if th % s == 0 and h % th == 0 and th * wd * c * itemsize <= 700_000:
            return th
    return s if h % s == 0 else h


def _hanc_pallas(x, w, bias, k):
    from accunet_tpu.ops.pooling import upsample_nearest

    b, h, wd, c = x.shape
    cout = w.shape[-1]
    th = _pick_tile(h, wd, c, k, x.dtype.itemsize)
    grid = (b, h // th)

    def spec(i):
        s = 2 ** i
        return pl.BlockSpec(
            (1, th // s, wd // s, cout), lambda bi, hi: (bi, hi, 0, 0)
        )

    outs = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, wd, c), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((c, 2 * k - 1, cout), lambda bi, hi: (0, 0, 0)),
        ],
        out_specs=[spec(i) for i in range(k)],
        out_shape=[
            jax.ShapeDtypeStruct((b, h // 2 ** i, wd // 2 ** i, cout), x.dtype)
            for i in range(k)
        ],
    )(x, w.astype(x.dtype))
    if not isinstance(outs, (tuple, list)):
        outs = [outs]

    # telescoped upsample-add over the tiny low-res terms (XLA)
    acc = None
    for i in range(k - 1, 0, -1):
        acc = outs[i] if acc is None else outs[i] + upsample_nearest(acc, 2)
    y = outs[0]
    if acc is not None:
        y = y + upsample_nearest(acc, 2)
    return y + bias.astype(y.dtype)


def _hanc_pallas_stage1(x, w, bias, k):
    """Stage-1-fused evaluation: pallas computes mix0/avg2/max2/t1 from one
    read of x; XLA finishes the (quarter-size) deeper levels + telescope."""
    from accunet_tpu.ops.pooling import avg_pool2d, max_pool2d, upsample_nearest

    b, h, wd, c = x.shape
    cout = w.shape[-1]
    th = _pick_tile(h, wd, c, k, x.dtype.itemsize)
    grid = (b, h // th)
    wb = w.astype(x.dtype)

    y0, a2, m2, t1 = pl.pallas_call(
        functools.partial(_stage1_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, wd, c), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((c, 2 * k - 1, cout), lambda bi, hi: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, th, wd, cout), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, th // 2, wd // 2, c), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, th // 2, wd // 2, c), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, th // 2, wd // 2, cout), lambda bi, hi: (bi, hi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
            jax.ShapeDtypeStruct((b, h // 2, wd // 2, c), x.dtype),
            jax.ShapeDtypeStruct((b, h // 2, wd // 2, c), x.dtype),
            jax.ShapeDtypeStruct((b, h // 2, wd // 2, cout), x.dtype),
        ],
    )(x, wb)

    def mix(t, j):
        out = jax.lax.dot_general(
            t, wb[:, j, :], (((t.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.astype(t.dtype)

    avg_maps, max_maps = [a2], [m2]
    for _ in range(2, k):
        avg_maps.append(avg_pool2d(avg_maps[-1], 2))
        max_maps.append(max_pool2d(max_maps[-1], 2))
    acc = None
    for i in range(k - 1, 1, -1):
        term = mix(avg_maps[i - 1], i) + mix(max_maps[i - 1], k - 1 + i)
        acc = term if acc is None else term + upsample_nearest(acc, 2)
    acc = t1 if acc is None else t1 + upsample_nearest(acc, 2)
    y = y0 + upsample_nearest(acc, 2)
    return y + bias.astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def hanc_mix(x, w, bias, k):
    """Fused y = HANC(x; w, bias) (pre-BN). x (B,H,W,C), w (C, 2k-1, Cout),
    bias (Cout,). Dispatches to the Pallas kernel on TPU when the spatial
    dims are pool-aligned; XLA telescoped path otherwise."""
    return _hanc_dispatch(x, w, bias, k)


def _hanc_dispatch(x, w, bias, k):
    b, h, wd, c = x.shape
    s = 2 ** (k - 1)
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and h % s == 0 and wd % s == 0 and c % 8 == 0:
        return _hanc_pallas(x, w, bias, k)
    return _xla_hanc_mix(x, w, bias, k)


def _fwd(x, w, bias, k):
    return _hanc_dispatch(x, w, bias, k), (x, w, bias)


def _bwd(k, res, g):
    x, w, bias = res
    _, vjp = jax.vjp(lambda xx, ww, bb: _xla_hanc_mix(xx, ww, bb, k), x, w, bias)
    return vjp(g)


hanc_mix.defvjp(_fwd, _bwd)
