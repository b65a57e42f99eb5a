"""Fused HANC (Hierarchical Aggregation of Neighborhood Context) Pallas
kernel — the hot op of ACC-UNet (ACC_UNet/ACC_UNet.py:53-142; SURVEY §7.2
step 4's "fused HANC" milestone).

Math (identical to nn/acc_blocks.HANCLayer's decomposed-XLA path):
    y = x@w0 + Σ_{i=1..k-1} up_{2^i}( avg_{2^i}(x)@w_i + max_{2^i}(x)@w_{k-1+i} ) + bias
with the pyramid evaluated hierarchically and the sum telescoped coarsest-
first so every add except one runs at low resolution.

Why a kernel (measured on v5e, B8 224x224 C96 k3, chain-delta timing that
cancels the serving relay's ~30 ms round-trip):
  * XLA telescoped path: 1.50 ms/layer — dominated by the full-resolution
    nearest-upsample-add (1.13 ms alone: a sublane/lane relayout pass over
    77 MB) and the pool reshapes (0.22 ms each); the matmuls are 0.08 ms.
  * A kernel that fuses only pools+mixes and leaves the telescoped
    upsample-add to XLA is a wash (1.44-1.60 ms — the round-1 design).
  * This kernel runs the ENTIRE telescope in VMEM: each (th, W, C) tile
    computes its pools, all (2k-1) mixes (MXU), and the upsample-adds
    on-chip, emitting the finished y tile once. Full-res HBM traffic is
    read-x + write-y, nothing else.

Tiles are multiples of 2^(k-1) rows so pooling never crosses a tile boundary
(pool windows are aligned, stride == window).

Backward: custom_vjp whose bwd differentiates the XLA reference formula
(training keeps XLA's fused backward; inference gets the fused kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from accunet_tpu.ops.platform import on_tpu
from jax.experimental import pallas as pl


def _xla_hanc_mix(x, w, bias, k):
    """Reference/fallback: telescoped XLA evaluation (math of the kernel)."""
    from accunet_tpu.ops.pooling import avg_pool2d, max_pool2d, upsample_nearest

    def mix(t, j):
        out = jax.lax.dot_general(
            t, w[:, j, :].astype(t.dtype), (((t.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.promote_types(t.dtype, jnp.float32),
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


def _kernel(x_ref, w_ref, b_ref, y_ref, *, k):
    """One (th, W, C) tile -> finished (th, W, Cout) HANC output tile.

    Whole telescope in VMEM (measured: beats XLA ~2x at 56^2 and below,
    roughly par at 224^2/112^2 where Mosaic's pool/upsample relayout
    shuffles dominate — a plane-decomposed v3 that tried to avoid them hit
    Mosaic internal errors at 224^2 and was slower at 56^2)."""
    x = x_ref[0]  # (th, W, C)
    w = w_ref[:]  # (C, 2k-1, Cout)
    th, wd, c = x.shape
    cout = w.shape[-1]

    def mix(t, j):
        tt = t.reshape(-1, c)
        out = jax.lax.dot_general(
            tt, w[:, j, :].astype(tt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.reshape(t.shape[0], t.shape[1], cout)  # fp32

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

    def up2(t):
        # nearest upsample 2x (fp32 accum maps)
        h, ww, cc = t.shape
        r = jnp.broadcast_to(t[:, None, :, None, :], (h, 2, ww, 2, cc))
        return r.reshape(2 * h, 2 * ww, cc)

    avg_maps, max_maps = [], []
    a = m = x
    for _ in range(1, k):
        a = pool(a, "avg")
        m = pool(m, "max")
        avg_maps.append(a)
        max_maps.append(m)

    acc = None
    for i in range(k - 1, 0, -1):  # coarsest first; all low-res
        term = mix(avg_maps[i - 1], i) + mix(max_maps[i - 1], k - 1 + i)
        acc = term if acc is None else term + up2(acc)
    y = mix(x, 0)
    if acc is not None:
        y = y + up2(acc)
    y_ref[0] = (y + b_ref[:].astype(jnp.float32)).astype(y_ref.dtype)


def _pick_tile(h: int, wd: int, c: int, k: int, itemsize: int) -> int:
    """Largest row-tile that is pool-aligned and keeps the staged input tile
    <=~700 KB (Mosaic pads pooled reshapes to 8 sublanes, inflating live VMEM
    several-fold past the raw tile size)."""
    s = 2 ** (k - 1)
    for th in (32, 16, 8, 4, 2, 1):
        if th % s == 0 and h % th == 0 and th * wd * c * itemsize <= 700_000:
            return th
    return s if h % s == 0 else h


def _hanc_pallas(x, w, bias, k):
    b, h, wd, c = x.shape
    cout = w.shape[-1]
    th = _pick_tile(h, wd, c, k, x.dtype.itemsize)
    grid = (b, h // th)

    return pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, wd, c), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((c, 2 * k - 1, cout), lambda bi, hi: (0, 0, 0)),
            pl.BlockSpec((cout,), lambda bi, hi: (0,)),
        ],
        out_specs=pl.BlockSpec((1, th, wd, cout), lambda bi, hi: (bi, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
    )(x, w.astype(x.dtype), bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def hanc_mix(x, w, bias, k):
    """Fused y = HANC(x; w, bias) (pre-BN). x (B,H,W,C), w (C, 2k-1, Cout),
    bias (Cout,). Dispatches to the Pallas kernel on TPU when the spatial
    dims are pool-aligned; XLA telescoped path otherwise."""
    return _hanc_dispatch(x, w, bias, k)


def _hanc_dispatch(x, w, bias, k):
    b, h, wd, c = x.shape
    cout = w.shape[-1]
    s = 2 ** (k - 1)
    tpu = on_tpu()
    # v5e measurements (benchmarks/bench_hanc.py, chain-delta): the kernel
    # wins ~2x at 56^2 (0.27 vs 0.53 ms) but is par-to-slower at 224^2/112^2
    # where in-VMEM relayout shuffles dominate. Wide bottleneck channels
    # (C=1536 at 28^2) blow Mosaic's scoped-VMEM stack (54 MB > 16 MB limit)
    # — cap at the tested envelope and fall back to XLA elsewhere.
    if (
        tpu and k > 1 and h <= 64 and c <= 512 and cout <= 512
        and h % s == 0 and wd % s == 0 and c % 8 == 0
    ):
        return _hanc_pallas(x, w, bias, k)
    return _xla_hanc_mix(x, w, bias, k)


def _fwd(x, w, bias, k):
    return _hanc_dispatch(x, w, bias, k), (x, w, bias)


def _bwd(k, res, g):
    x, w, bias = res
    _, vjp = jax.vjp(lambda xx, ww, bb: _xla_hanc_mix(xx, ww, bb, k), x, w, bias)
    return vjp(g)


hanc_mix.defvjp(_fwd, _bwd)
