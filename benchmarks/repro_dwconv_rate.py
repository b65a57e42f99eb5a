"""Minimal repro: at what VPU rate does a bare Mosaic 9-tap depthwise loop
run, vs XLA's depthwise conv on the same array? (ROOFLINE §12/§13 lever 1.)

Three kernels over x (B, H, W, C) bf16:
  * pallas_taps    — pad + 9 spatially-shifted multiply-accumulates (the
                     exact structure of the fused HANCBlock dwconv segment)
  * pallas_noshift — 9 unshifted multiply-accumulates (no slicing at all;
                     isolates slicing cost from raw FMA rate)
  * xla_conv       — lax.conv_general_dilated feature_group_count=C

Rates in T lane-FMA/s (elements * 9 / time).
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

B, H, W, C = 8, 112, 112, 256
TH = 16  # row tile; taps wrap at tile edges (rate measurement, not parity)
DT = jnp.bfloat16


def _taps_kernel(x_ref, w_ref, y_ref, *, shift: bool, th: int, w_: int):
    x = x_ref[0]
    w = w_ref[:]
    if shift:
        xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
        acc = None
        for t in range(9):
            gi, gj = t // 3, t % 3
            src = xp[gi:gi + th, gj:gj + w_, :]
            term = src * w[t]
            acc = term if acc is None else acc + term
    else:
        acc = None
        for t in range(9):
            term = x * w[t]
            acc = term if acc is None else acc + term
    y_ref[0] = acc


def pallas_dw(x, w, shift):
    b, h, w_, c = x.shape
    return pl.pallas_call(
        functools.partial(_taps_kernel, shift=shift, th=TH, w_=w_),
        grid=(b, h // TH),
        in_specs=[
            pl.BlockSpec((1, TH, w_, c), lambda b, hi: (b, hi, 0, 0)),
            pl.BlockSpec((9, c), lambda b, hi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, w_, c), lambda b, hi: (b, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, w)


def xla_dw(x, w):
    c = x.shape[-1]
    k = w.reshape(3, 3, 1, c).astype(x.dtype)
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def chain_time(fn, x, w, steps=20):
    @jax.jit
    def run(x):
        def body(_, carry):
            x, tot = carry
            y = fn(x + (1e-6 * tot).astype(x.dtype), w)
            return x, tot + y[:, ::16, ::16].mean().astype(jnp.float32)

        _, tot = lax.fori_loop(0, steps, body, (x, jnp.float32(0)))
        return tot

    float(run(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    for shape in ((B, H, W, C), (8, 56, 56, 4352)):
        b, h, w_, c = shape
        x = jax.random.normal(jax.random.PRNGKey(0), shape, DT)
        w = jax.random.normal(jax.random.PRNGKey(1), (9, c), DT) * 0.1
        n_fma = b * h * w_ * c * 9
        print(f"--- {shape} ---", flush=True)
        for name, fn in (
            ("xla_conv", xla_dw),
            ("pallas_taps", lambda x, w: pallas_dw(x, w, True)),
            ("pallas_noshift", lambda x, w: pallas_dw(x, w, False)),
        ):
            try:
                t = chain_time(fn, x, w)
                print(f"{name:15s} {t * 1e3:7.3f} ms   "
                      f"{n_fma / t / 1e12:5.2f} T lane-FMA/s", flush=True)
            except Exception as ex:
                print(f"{name:15s} FAIL {str(ex)[:80]}", flush=True)


if __name__ == "__main__":
    main()
