"""Selective-scan benchmark: Pallas chunked kernel vs lax.associative_scan.

Shapes mirror the SpatialMamba use (B, L=H*W, D=d_inner*d_state).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from accunet_tpu.ops.pallas.scan import _chunked_scan_fwd, _xla_scan


def chain_time(fn, a, b, steps=10):
    # fn returns a device scalar (sum over the full scan output) so the
    # 4-byte host readback is a completion barrier without dragging the
    # whole result through the relay
    out = fn(a, b)
    float(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        a2 = a + (1e-9 * out).astype(a.dtype)
        out = fn(a2, b)
        float(out)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--length", type=int, default=3136)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--chunks", type=int, nargs="*", default=[128, 256, 512])
    args = ap.parse_args()

    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.uniform(0.2, 0.99, (args.batch, args.length, args.dim)), jnp.float32)
    b = jnp.asarray(rs.uniform(-0.5, 0.5, (args.batch, args.length, args.dim)), jnp.float32)
    bytes_io = a.size * 4 * 3  # read a,b write h

    t_xla = chain_time(jax.jit(lambda a, b: _xla_scan(a, b).sum()), a, b)
    print(f"xla associative_scan: {t_xla*1e3:8.3f} ms  ({bytes_io/t_xla/1e9:6.1f} GB/s eff)")
    for chunk in args.chunks:
        fn = jax.jit(lambda a, b, c=chunk: _chunked_scan_fwd(a, b, chunk=c).sum())
        t = chain_time(fn, a, b)
        print(
            f"pallas chunk={chunk:4d}:  {t*1e3:8.3f} ms  "
            f"({bytes_io/t/1e9:6.1f} GB/s eff, {t_xla/t:4.2f}x vs xla)"
        )


if __name__ == "__main__":
    main()
