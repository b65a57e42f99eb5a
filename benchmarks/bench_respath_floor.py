"""Is the fused ResPath level kernel at its stream floor? (ROOFLINE §13.3)

VERDICT r4 weak #5: §13.3 ("chain x across levels in VMEM") was declared a
floor without evidence. The floor argument has two parts; this harness
measures both:

1. WHY staging is impossible: chaining level i -> i+1 inside one kernel
   must cross the SE global-mean barrier (the gate for level i+1 needs ALL
   of level i's channel sums), so x and y would have to persist in VMEM
   scratch across a two-sweep grid — a working set of 2 * Hf*Wf*4C bytes
   PER IMAGE (printed below) vs the ~16 MB more-or-less usable scoped VMEM.
2. HOW close the per-level kernel already is to the machine's stream rate:
   the kernel moves read(x)+read(y)+write(y')+write(x') (+9 c4xc4 matmuls
   that ride the MXU under the stream). We time the kernel standalone at
   the Lite rspth1 geometry and compare its GB/s to an XLA pointwise
   control of the SAME byte mix (2 reads + 2 writes) — the §16 methodology.

Usage: python benchmarks/bench_respath_floor.py [--rounds 5]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from accunet_tpu.ops.pallas.respath import respath_level_frame

# Lite rspth1 geometry: L1 skip in the s2d frame at 224^2, n_filts=32
# -> frame (B, 112, 112, 128) bf16
B, HF, WF, C4 = 8, 112, 112, 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    dt = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 6)
    x = jax.random.normal(ks[0], (B, HF, WF, C4), dt)
    y = jax.random.normal(ks[1], (B, HF, WF, C4), dt)
    gate = jax.nn.sigmoid(jax.random.normal(ks[2], (B, C4), jnp.float32))
    wp = jax.random.normal(ks[3], (3, 3, C4, C4), dt) * 0.05
    aff_bn = (jnp.ones((C4,)), jnp.zeros((C4,)))
    aff_se = (jnp.ones((C4,)), jnp.zeros((C4,)))

    bytes_kernel = (4 * B * HF * WF * C4) * 2  # 2r + 2w bf16
    print(f"per-level traffic: {bytes_kernel/1e6:.1f} MB  | per-image VMEM "
          f"working set if staged across the SE barrier: "
          f"{2*HF*WF*C4*2/1e6:.1f} MB (x+y, bf16) -> x{B} images")

    def kernel_step(x, y):
        y1, xn, sums = respath_level_frame(
            x, wp, aff_bn, y_prev=y, gate=gate, aff_se=aff_se)
        return y1, xn, sums

    @jax.jit
    def chained_kernel(x, y):
        def body(_, carry):
            x, y, tot = carry
            y1, xn, sums = kernel_step(x + (1e-9 * tot).astype(x.dtype), y)
            return xn, y1, tot + sums.mean()

        _, _, tot = jax.lax.fori_loop(
            0, args.steps, body, (x, y, jnp.float32(0)))
        return tot

    # control: same byte mix (2 reads + 2 writes), pure XLA pointwise
    @jax.jit
    def chained_control(x, y):
        def body(_, carry):
            x, y, tot = carry
            a = x + (1e-9 * tot).astype(x.dtype) + y
            b2 = x * jnp.asarray(0.5, x.dtype) - y
            return a, b2, tot + a[0, 0, 0, :8].astype(jnp.float32).sum()

        _, _, tot = jax.lax.fori_loop(
            0, args.steps, body, (x, y, jnp.float32(0)))
        return tot

    runs = {"rspth_kernel": chained_kernel, "xla_2r2w_control": chained_control}
    for r in runs.values():
        float(r(x, y))  # compile + warm
    res = {n: [] for n in runs}
    for _ in range(args.rounds):
        for n, r in runs.items():
            t0 = time.perf_counter()
            float(r(x, y))
            res[n].append((time.perf_counter() - t0) / args.steps)
    for n, ts in res.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{n:18s} {med*1e3:7.3f} ms  {bytes_kernel/med/1e9:6.1f} GB/s"
              f"  (min {min(ts)*1e3:.3f})")


if __name__ == "__main__":
    main()
