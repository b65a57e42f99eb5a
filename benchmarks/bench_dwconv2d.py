"""dwconv2d benchmark — XLA grouped-conv forward + custom-VJP backward.

(The round-1 Pallas forward was deleted after losing this sweep at every k;
see ops/pallas/dwconv2d.py.)

Mirrors the reference protocol (/root/reference/kernels/dwconv2d/test.py:
24-layer depthwise stacks, dim 384, 64x64 input, batch 64, k = 3..31,
forward and forward+backward wall-clock), adapted to the chained-dependency
timing needed behind the axon relay.

Run: python benchmarks/bench_dwconv2d.py [--ks 3 7 ...] [--layers 24]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from accunet_tpu.ops.pallas.dwconv2d import dwconv2d, dwconv2d_reference


def chain_time(fn, args, steps=10):
    """Chained-dependency timing with a forced scalar readback per call —
    the serving relay acks block_until_ready before execution completes, so
    only a host fetch measures real completion (see bench.py)."""
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        leader = jax.tree_util.tree_leaves(out)[0]
        args = (args[0] + (1e-6 * leader.ravel()[0]).astype(args[0].dtype),) + args[1:]
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", type=int, nargs="*", default=[3, 7, 13, 21, 31])
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(args.batch, args.hw, args.hw, args.dim), dt)

    for k in args.ks:
        ws = [
            jnp.asarray(rs.rand(k, k, args.dim) - 0.5, dt) for _ in range(args.layers)
        ]
        bs = [jnp.asarray(rs.rand(args.dim), dt) for _ in range(args.layers)]

        def stack_xla(x, ws=ws, bs=bs):
            for w, b in zip(ws, bs):
                x = dwconv2d_reference(x, w, b)
            return x

        def stack_train(x, ws=ws, bs=bs):
            def loss(ws):
                y = x
                for w, b in zip(ws, bs):
                    y = dwconv2d(y, w, b)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            return jax.grad(loss)(ws)[0]

        fx = jax.jit(stack_xla)
        ft = jax.jit(stack_train)
        tx = chain_time(fx, (x,))
        try:
            tt = chain_time(ft, (x,))
        except Exception as e:
            tt = float("nan")
            print(f"k={k} train failed: {e}", file=sys.stderr)
        print(
            f"k={k:2d}: fwd(xla) {tx*1e3:7.2f} ms  "
            f"fwd+bwd(custom vjp) {tt*1e3:7.2f} ms"
        )


if __name__ == "__main__":
    main()
