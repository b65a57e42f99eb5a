"""Standalone chain-delta timing of depthwise-conv candidates at the model's
real interior shapes (ACC-UNet HANCBlock dwconvs; ROOFLINE.md §0 methodology).
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

N_SHORT, N_LONG = 4, 20
DT = jnp.bfloat16


def xla_dwconv(x, w):
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, w.reshape(3, 3, 1, c), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def tap_dwconv(x, w):
    """Per-tap shifted adds on a single padded buffer (the wgrad trick)."""
    b, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for i in range(3):
        for j in range(3):
            win = lax.dynamic_slice(xp, (0, i, j, 0), (b, h, wd, c))
            t = win * w[i, j]
            acc = t if acc is None else acc + t
    return acc


def timeit(fn, x, w, iters=3):
    def chain(n):
        @jax.jit
        def run(x):
            tot = jnp.float32(0)

            def body(_, carry):
                x, tot = carry
                out = fn(x + (1e-6 * tot).astype(x.dtype), w)
                p = out[:, ::16, ::16].mean().astype(jnp.float32)
                return x, tot + p

            _, tot = jax.lax.fori_loop(0, n, body, (x, tot))
            return tot

        return run

    def t(n):
        f = chain(n)
        float(f(x))
        best = float("inf")
        for r in range(iters):
            xr = x + jnp.asarray(r * 1e-3, x.dtype)
            t0 = time.perf_counter()
            float(f(xr))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(N_LONG) - t(N_SHORT)) / (N_LONG - N_SHORT) * 1e3


SHAPES = [
    (8, 224, 224, 96),
    (8, 224, 224, 192),
    (8, 112, 112, 192),
    (8, 112, 112, 384),
    (8, 56, 56, 384),
]


def main():
    cands = {"xla_grouped": xla_dwconv, "per_tap": tap_dwconv}
    try:
        from accunet_tpu.ops.pallas.dwconv2d import dwconv2d_pallas_fwd  # noqa

        cands["pallas"] = lambda x, w: dwconv2d_pallas_fwd(x, w)
    except ImportError:
        pass
    for b, h, wd, c in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, wd, c), DT)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c), DT) * 0.1
        gbytes = 2 * b * h * wd * c * 2 / 1e9
        print(f"({b},{h},{wd},{c})  rw-bytes {gbytes*1000:.0f} MB  "
              f"(bw-bound @800GB/s: {gbytes/0.8*1e3:.2f} ms)")
        for name, fn in cands.items():
            try:
                ms = timeit(fn, x, w)
                print(f"  {name:12s} {ms:7.3f} ms   {gbytes/ (ms/1e3):6.0f} GB/s")
            except Exception as e:
                print(f"  {name:12s} FAIL {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
