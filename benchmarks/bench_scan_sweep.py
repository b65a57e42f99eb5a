"""Scan roofline: bytes bound vs measured, chunk sweep, shift-cost isolation.

VERDICT r3 weak #1c: the selective-scan config reports 13.6-14.4 Mtok/s with
no roofline. Bound: the kernel reads a+b and writes h (3 fp32 arrays) — at
the measured ~620 GB/s effective HBM that is
    3 * B*L*D * 4 bytes / 620e9 s  ->  B*L tokens
For B=8, L=3136, D=768: 231 MB -> 0.373 ms -> ~67 Mtok/s. This script
measures, at the same shape:
  m0: 3-array streaming control (read a,b -> write a+b) = achievable bound
  m1: the current chunked_linear_scan at chunk 128/256/512/1024
  m2: a no-shift control (same FMA passes, no pad/slice shifted copies) to
      isolate what the Hillis-Steele shifts cost vs the arithmetic

Run: python benchmarks/bench_scan_sweep.py
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
from jax.experimental.pallas import tpu as pltpu

B, L, D = 8, 3136, 768
STEPS = 32
BYTES = 3 * B * L * D * 4


def timeit(fn, *args):
    """Chained serialized steps inside one jit (ROOFLINE §0 methodology)."""

    @jax.jit
    def chained(*args):
        def body(_, carry):
            tot = carry
            h = fn(*[a + 1e-12 * tot for a in args])
            return tot + h[(0,) * (h.ndim - 1) + (slice(None),)].mean()

        return lax.fori_loop(0, STEPS, body, jnp.float32(0))

    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    dt = (time.perf_counter() - t0) / STEPS
    return dt


def copy_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = a_ref[...] + b_ref[...]


def stream_control(a, b, chunk=256):
    return pl.pallas_call(
        copy_kernel,
        grid=(B, L // chunk),
        in_specs=[pl.BlockSpec((1, chunk, D), lambda bi, ci: (bi, ci, 0))] * 2,
        out_specs=pl.BlockSpec((1, chunk, D), lambda bi, ci: (bi, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, D), a.dtype),
    )(a, b)


def _noshift_kernel(a_ref, b_ref, h_ref, carry_ref, *, chunk, passes):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    a = a_ref[0].astype(jnp.float32)
    b = b_ref[0].astype(jnp.float32)
    for _ in range(passes):
        b = b + a * b
        a = a * a
    h = b + a * carry_ref[0][None, :]
    carry_ref[...] = h[-1:]
    h_ref[0] = h.astype(h_ref.dtype)


def noshift(a, b, chunk=256):
    import math

    passes = int(math.log2(chunk))
    lp = L + (-L) % chunk
    if lp != L:
        a = jnp.pad(a, ((0, 0), (0, lp - L), (0, 0)), constant_values=1.0)
        b = jnp.pad(b, ((0, 0), (0, lp - L), (0, 0)))
    return pl.pallas_call(
        functools.partial(_noshift_kernel, chunk=chunk, passes=passes),
        grid=(B, lp // chunk),
        in_specs=[pl.BlockSpec((1, chunk, D), lambda bi, ci: (bi, ci, 0))] * 2,
        out_specs=pl.BlockSpec((1, chunk, D), lambda bi, ci: (bi, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((B, lp, D), a.dtype),
        scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
    )(a, b)[:, :L]


def main():
    ka, kb = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.uniform(ka, (B, L, D), jnp.float32, 0.2, 0.99)
    b = jax.random.uniform(kb, (B, L, D), jnp.float32, -0.5, 0.5)

    dt = timeit(stream_control, a, b)
    print(f"m0 stream 3-array control : {dt*1e3:7.3f} ms  "
          f"{BYTES/dt/1e9:6.1f} GB/s  {B*L/dt/1e6:6.1f} Mtok/s-equiv")

    from accunet_tpu.ops.pallas.scan import _chunked_scan_fwd

    for chunk in (128, 256, 512, 1024):
        fn = functools.partial(_chunked_scan_fwd, chunk=chunk)
        dt = timeit(fn, a, b)
        print(f"m1 scan chunk={chunk:4d}       : {dt*1e3:7.3f} ms  "
              f"{BYTES/dt/1e9:6.1f} GB/s  {B*L/dt/1e6:6.1f} Mtok/s")

    for chunk in (256, 1024):
        fn = functools.partial(noshift, chunk=chunk)
        dt = timeit(fn, a, b)
        print(f"m2 noshift chunk={chunk:4d}    : {dt*1e3:7.3f} ms  "
              f"{BYTES/dt/1e9:6.1f} GB/s  {B*L/dt/1e6:6.1f} Mtok/s")


if __name__ == "__main__":
    main()
