"""Scan roofline follow-up: WHY does the (B, L, D)-blocked pallas stream
control reach only ~152 GB/s when XLA fusions demonstrate ~620 GB/s
(ROOFLINE §12 cnv72-maxpool anchor)? Sweeps the streaming geometry:

  x0: XLA-native a+b at the scan shape (what the compiler achieves)
  x1: pallas copy, block (1, chunk, D), grid (B, L/chunk)  [current scan's]
  x2: pallas copy, block (B, chunk, D), grid (L/chunk,)    [batch-folded]
  x3: the real scan kernel at the best-streaming geometry

Run: python benchmarks/bench_scan_stream_probe.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import os

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("ACCUNET_JAX_CACHE", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, L, D = 8, 3136, 768
STEPS = 32
BYTES = 3 * B * L * D * 4


def timeit(fn, *args):
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


def report(tag, dt):
    print(f"{tag:34s}: {dt*1e3:7.3f} ms  {BYTES/dt/1e9:6.1f} GB/s  "
          f"{B*L/dt/1e6:6.1f} Mtok/s-equiv", flush=True)


def copy_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = a_ref[...] + b_ref[...]


def stream_bl(a, b, chunk):
    return pl.pallas_call(
        copy_kernel,
        grid=(B, L // chunk),
        in_specs=[pl.BlockSpec((1, chunk, D), lambda bi, ci: (bi, ci, 0))] * 2,
        out_specs=pl.BlockSpec((1, chunk, D), lambda bi, ci: (bi, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L // chunk * chunk, D), a.dtype),
    )(a[:, : L // chunk * chunk], b[:, : L // chunk * chunk])


def stream_bfold(a, b, chunk):
    return pl.pallas_call(
        copy_kernel,
        grid=(L // chunk,),
        in_specs=[pl.BlockSpec((B, chunk, D), lambda ci: (0, ci, 0))] * 2,
        out_specs=pl.BlockSpec((B, chunk, D), lambda ci: (0, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L // chunk * chunk, D), a.dtype),
    )(a[:, : L // chunk * chunk], b[:, : L // chunk * chunk])


def main():
    ka, kb = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.uniform(ka, (B, L, D), jnp.float32, 0.2, 0.99)
    b = jax.random.uniform(kb, (B, L, D), jnp.float32, -0.5, 0.5)

    report("x0 XLA a+b", timeit(lambda a, b: a + b, a, b))

    for chunk in (128, 256, 448, 784):
        try:
            report(f"x1 pallas copy (1,{chunk},D)",
                   timeit(functools.partial(stream_bl, chunk=chunk), a, b))
        except Exception as e:
            print(f"x1 chunk={chunk}: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    for chunk in (56, 112, 196):
        try:
            report(f"x2 pallas copy (B,{chunk},D)",
                   timeit(functools.partial(stream_bfold, chunk=chunk), a, b))
        except Exception as e:
            print(f"x2 chunk={chunk}: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    from accunet_tpu.ops.pallas.scan import _chunked_scan_fwd

    for chunk in (64, 128):
        report(f"x3 scan chunk={chunk}",
               timeit(functools.partial(_chunked_scan_fwd, chunk=chunk),
                      a, b))


if __name__ == "__main__":
    main()
