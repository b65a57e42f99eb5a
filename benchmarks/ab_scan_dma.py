"""Interleaved same-window A/B: auto-pipelined scan vs hand-pipelined DMA scan.

ROOFLINE §16 bounded the auto-pipelined kernel at 146-153 GB/s with a
pallas-copy control, 25-35% under XLA's 192.6 GB/s pointwise rate at the
same shape. VERDICT r4 #4: try ONE manually-pipelined DMA variant before
calling that a floor. This harness interleaves, per round:

  x0   XLA-native a+b pointwise (the honest bytes-bound control)
  auto scan.chunked_linear_scan (shipping kernel, chunk=128)
  dmaN scan_dma.dma_chunked_scan at nbuf in {2, 3, 4, 6} (chunk=128)
  dmaC dma variants at chunk 256/512 (fewer, larger DMAs)

Usage: python benchmarks/ab_scan_dma.py [--rounds 5] [--steps 32]
Chained-inside-one-jit methodology per ROOFLINE §0.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from accunet_tpu.ops.pallas.scan import chunked_linear_scan
from accunet_tpu.ops.pallas.scan_dma import dma_chunked_scan

B, L, D = 8, 3136, 768
BYTES = B * L * D * 4 * 3  # 2 reads + 1 write f32


def chained(fn, steps):
    @jax.jit
    def run(a, b):
        def body(_, carry):
            a, tot = carry
            h = fn(a + 1e-9 * tot, b)
            return a, tot + h[:, -1].mean()

        _, tot = jax.lax.fori_loop(0, steps, body, (a, jnp.float32(0)))
        return tot

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    ka, kb = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.uniform(ka, (B, L, D), jnp.float32, 0.2, 0.99)
    b = jax.random.uniform(kb, (B, L, D), jnp.float32, -0.5, 0.5)

    variants = {
        "x0_xla_add": lambda a, b: a + b,
        "auto_c128": chunked_linear_scan,
    }
    # VMEM budget: 3 buffer arrays x nbuf x chunk x D x 4B must stay well
    # under the ~16M scoped limit (c512/n4 = 18.9M measured OOM at the
    # relay's AOT compiler)
    for nbuf in (2, 3, 4, 6):
        variants[f"dma_c128_n{nbuf}"] = (
            lambda a, b, n=nbuf: dma_chunked_scan(a, b, chunk=128, nbuf=n))
    variants["dma_c256_n4"] = (
        lambda a, b: dma_chunked_scan(a, b, chunk=256, nbuf=4))
    variants["dma_c512_n2"] = (
        lambda a, b: dma_chunked_scan(a, b, chunk=512, nbuf=2))

    # parity gate before timing anything; a variant that fails to compile
    # (Mosaic VMEM etc.) is dropped and reported, not fatal
    ref = chunked_linear_scan(a, b)
    for name, fn in list(variants.items()):
        if name.startswith("x0"):
            continue
        try:
            err = float(jnp.abs(fn(a, b) - ref).max())
        except Exception as e:  # noqa: BLE001 — record and drop
            print(f"parity {name}: COMPILE/RUN FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}")
            del variants[name]
            continue
        rel = err / float(jnp.abs(ref).max())
        print(f"parity {name}: max abs err {err:.3e} (rel {rel:.3e})")
        assert rel < 1e-5, f"{name} diverges from the shipping kernel"

    runs = {k: chained(fn, args.steps) for k, fn in variants.items()}
    for r in runs.values():
        float(r(a, b))  # compile + warm

    results = {k: [] for k in runs}
    for rnd in range(args.rounds):
        for name, run in runs.items():  # interleaved: same-window exposure
            t0 = time.perf_counter()
            float(r := run(a, b))
            dt = (time.perf_counter() - t0) / args.steps
            results[name].append(dt)
    print(f"\nshape B{B} L{L} D{D} f32, {BYTES / 1e6:.0f} MB/step, "
          f"{args.rounds} rounds x {args.steps} steps, medians:")
    for name, ts in results.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        print(f"  {name:14s} {med * 1e3:7.3f} ms  {BYTES / med / 1e9:6.1f} GB/s  "
              f"{B * L / med / 1e6:6.1f} Mtok/s   (min {min(ts)*1e3:.3f})")


if __name__ == "__main__":
    main()
