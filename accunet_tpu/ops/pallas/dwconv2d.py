"""Depthwise conv2d with a custom TPU VJP (Pallas weight-gradient).

TPU-native counterpart of the reference CUDA kernel
(/root/reference/kernels/dwconv2d: shared-memory tiled, register-unrolled FMA
per filter row, pybind11-wrapped; autograd wrapper with flipped-weight dgrad
at kernels/dwconv2d/Dwconv/dwconv_layer.py:6-31).

Forward: XLA's grouped conv. A Pallas forward (whole padded image staged in
VMEM, tap-loop FMA) was built in round 1 and DELETED after benchmarking
(benchmarks/bench_dwconv2d.py, the reference's own sweep: 24-layer stacks,
384 ch, 64^2, k=3..31): it lost to XLA at every k (9.4 vs 5.7 ms at k=3,
51.7 vs 12.5 ms at k=13). The reason is structural, not an implementation
gap: depthwise conv has no channel contraction, so the MXU (the only unit
with >100 TFLOP/s) cannot be engaged, and the op is pure VPU tap-math —
34 GFLOP at k=13 against a VPU ceiling of a few TFLOP/s, which XLA's own
grouped-conv lowering already saturates (~2.7 TFLOP/s measured). The
reference CUDA kernel's large-k win exploits CUDA-core register tiling, a
resource balance that does not exist on TPU; matching XLA here is the
ceiling, so the kernel was removed rather than shipped as dead weight.

What DOES earn its keep is the backward:
  * dgrad: depthwise conv of the cotangent with the spatially flipped
    kernel (same identity the reference uses, dwconv_layer.py:19-31).
  * wgrad: XLA's native depthwise weight-gradient lowering is pathological
    (measured ~20x the data-gradient cost on v5e); it is replaced by
    per-tap shifted XLA reductions. A Pallas wgrad kernel exists as well:
    its original tap loop used a traced start on the sublane dim (Mosaic:
    "cannot statically prove that index in dimension 2 is a multiple of
    8"); fixed by unrolling the kw column taps statically and keeping only
    the outer row index dynamic. Measured (chain-delta, 64x64x64x384, the
    reference's own sweep shape): ties per-tap XLA at k=3 (2.8 vs 2.6 ms),
    wins 1.87x at k=7 (7.8 vs 14.6 ms); k=13 still hits an opaque
    remote-compile failure on grids >8 steps. Production models only use
    k=3 depthwise, so the per-tap XLA form stays the dispatched wgrad and
    the Pallas kernel remains opt-in for large-k use.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from accunet_tpu.ops.conv import depthwise_conv2d as _xla_dwconv

_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom of 16MB VMEM


def _use_pallas(shape, kh, kw, tc):
    b, h, w, c = shape
    pad_tile = (h + kh - 1) * (w + kw - 1) * tc * 4
    out_tile = h * w * tc * 4
    return pad_tile + out_tile < _VMEM_BUDGET


def dwconv2d_reference(x, kernel, bias=None):
    """jax.lax reference (grouped conv), kernel (kh,kw,C)."""
    k4 = kernel[:, :, None, :]
    return _xla_dwconv(x, k4, bias)


# ------------------------------------------------------------------ pallas


def _pick_tc(c: int) -> int:
    for tc in (512, 256, 128):
        if c % tc == 0:
            return tc
    return c  # odd channel counts: single tile (Mosaic pads lanes)


@functools.partial(jax.jit, static_argnames=("kh", "kw", "interpret"))
def _dwconv2d_wgrad_pallas(x, g, kh: int, kw: int, interpret=False):
    """dw[i,j,c] = sum_{b,h,w} x_pad[b,h+i,w+j,c] * g[b,h,w,c]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    xp = jnp.pad(x, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
    tc = _pick_tc(c)

    def kern(xp_ref, g_ref, dw_ref):
        # batch is the INNERMOST grid dim: the dw block is revisited across
        # b, and Pallas TPU only guarantees read-modify-write accumulation
        # when revisits are consecutive grid steps (canonical K-loop rule)
        bi = pl.program_id(1)

        @pl.when(bi == 0)
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        gblk = g_ref[0].astype(jnp.float32)

        def body(i, _):
            # dynamic start only on the OUTER row dim; the kw column taps are
            # statically unrolled — a traced start on the sublane dim is what
            # Mosaic rejects ("cannot statically prove that index in
            # dimension 2 is a multiple of 8")
            row = xp_ref[0, pl.ds(i, h), :, :].astype(jnp.float32)
            for j in range(kw):
                win = row[:, j:j + w, :]
                dw_ref[i, j, :] += jnp.sum(win * gblk, axis=(0, 1))
            return 0

        lax.fori_loop(0, kh, body, 0)

    return pl.pallas_call(
        kern,
        grid=(c // tc, b),
        in_specs=[
            pl.BlockSpec(
                (1, h + kh - 1, w + kw - 1, tc),
                lambda ci, bi: (bi, 0, 0, ci),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, h, w, tc), lambda ci, bi: (bi, 0, 0, ci), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (kh, kw, tc), lambda ci, bi: (0, 0, ci), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((kh, kw, c), jnp.float32),
        interpret=interpret,
    )(xp, g)


# ------------------------------------------------------------- public op


@jax.custom_vjp
def _dwconv2d_vjp(x, kernel, bias):
    return _dwconv2d_impl(x, kernel, bias)


def dwconv2d(x, kernel, bias=None):
    """Depthwise conv2d, 'same' padding. x (B,H,W,C), kernel (kh,kw,C),
    bias (C,) optional. XLA grouped-conv forward (measured optimal — module
    docstring), custom VJP with a Pallas weight gradient on TPU."""
    if bias is None:
        bias = jnp.zeros((x.shape[-1],), x.dtype)
    return _dwconv2d_vjp(x, kernel, bias)


def _dwconv2d_impl(x, kernel, bias):
    return dwconv2d_reference(x, kernel, bias)


def _fwd(x, kernel, bias):
    return _dwconv2d_impl(x, kernel, bias), (x, kernel)


def _wgrad_pallas_ok(x) -> bool:
    """Dispatch the Pallas one-pass wgrad instead of the per-tap XLA form.

    Per-tap reads x+g once PER TAP (9 passes at k=3); the Pallas kernel
    stages a (1, H+2, W+2, tc)+(1, H, W, tc) block and accumulates all taps
    in VMEM — one pass. At the small shapes of the original sweep (64²x384)
    the forms tie (module docstring), but at the wide-decoder cnv72 train
    geometry (56², C=4352, bf16 — 109 MB per map) per-tap is ~9x the
    compulsory traffic; measured A/B in ROOFLINE §22. Engages when the
    channel width is large enough that the saved passes dominate the
    program-count overhead, and the block fits VMEM."""
    import os

    mode = os.environ.get("ACCUNET_DWCONV_WGRAD", "auto")
    if mode == "taps":
        return False
    b, h, w, c = x.shape
    tc = _pick_tc(c)
    vmem = ((h + 2) * (w + 2) + h * w) * tc * x.dtype.itemsize + 9 * tc * 4
    if 2 * vmem >= 14 * 2**20:  # the measured 2x Mosaic-stack margin
        return False
    if mode == "pallas":
        return True
    return c >= 1024


def _bwd(res, g):
    x, kernel = res
    kh, kw = kernel.shape[0], kernel.shape[1]
    # dgrad: conv of g with flipped kernel (dwconv_layer.py:19-31 identity)
    wflip = kernel[::-1, ::-1, :]
    dx = _dwconv2d_impl(g, wflip, None)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(g.dtype)
    from accunet_tpu.ops.platform import on_tpu

    if on_tpu() and _wgrad_pallas_ok(x):
        dw = _dwconv2d_wgrad_pallas(x, g, kh, kw).astype(kernel.dtype)
        return dx, dw, db
    # wgrad: per-tap shifted reductions. This replaces XLA's pathological
    # native depthwise weight-gradient (~20x the dgrad cost), and it ties
    # the Pallas kernel at small shapes (module docstring for the measured
    # sweep); the Pallas one-pass form takes over at wide-channel train
    # geometries (_wgrad_pallas_ok).
    b, h, w, c = x.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    xp = jnp.pad(x, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
    taps = []
    for i in range(kh):
        row = []
        for j in range(kw):
            win = lax.dynamic_slice(xp, (0, i, j, 0), (b, h, w, c))
            row.append(jnp.einsum("bhwc,bhwc->c", win, g))
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps).astype(kernel.dtype)
    return dx, dw, db


_dwconv2d_vjp.defvjp(_fwd, _bwd)
