"""HANC mix microbenchmark: XLA telescoped vs Pallas variants on real TPU.

Shapes = ACC_UNet(_Lite) HANCBlock interiors at 224^2 (the expanded
C*inv_fctr widths the HANC layer actually sees; ACC_UNet/ACC_UNet.py:224-286).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from accunet_tpu.ops.pallas.hanc import _hanc_pallas, _xla_hanc_mix

CASES = [
    # (B, H, W, C, k, Cout) — levels 1-3 of ACC_UNet_Lite(n_filts=32, inv=3)
    (8, 224, 224, 96, 3, 96),
    (8, 112, 112, 192, 3, 192),
    (8, 56, 56, 384, 3, 384),
]


N_SHORT, N_LONG = 8, 48


def chain(fn, n):
    """n sequential applications inside ONE jit call (C==Cout lets the output
    feed back as input — forced serialization) returning a SCALAR (the
    serving relay acks block_until_ready before execution completes, so
    completion must be forced by a host readback; see bench.py)."""

    @jax.jit
    def run(x, w, bias):
        for _ in range(n):
            x = fn(x, w, bias)
        return x.astype(jnp.float32).mean()

    return run


def _time_call(fn, x, w, bias, iters=4):
    float(fn(x, w, bias))  # compile + warm
    best = float("inf")
    for r in range(iters):
        # fresh input per repeat — identical calls can be served from the
        # relay's execution cache
        xr = x + jnp.asarray(r * 1e-3, x.dtype)
        t0 = time.perf_counter()
        float(fn(xr, w, bias))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(fn, x, w, bias):
    """Per-application ms via the chain-length delta — the relay's ~30 ms
    round-trip latency cancels out of (t_long - t_short) / (long - short)."""
    ts = _time_call(chain(fn, N_SHORT), x, w, bias)
    tl = _time_call(chain(fn, N_LONG), x, w, bias)
    return (tl - ts) / (N_LONG - N_SHORT) * 1e3


def main():
    dtype = jnp.bfloat16
    for b, h, wd, c, k, cout in CASES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, h, wd, c), dtype)
        w = jax.random.normal(key, (c, 2 * k - 1, cout), jnp.float32) * 0.05
        bias = jnp.zeros((cout,), jnp.float32)

        base = {
            "xla": functools.partial(_xla_hanc_mix, k=k),
            "pallas": functools.partial(_hanc_pallas, k=k),
        }
        ref = np.asarray(jax.jit(base["xla"])(x, w, bias), np.float32)
        res = {}
        for name, fn in base.items():
            try:
                ms = timeit(fn, x, w, bias)
                y = np.asarray(jax.jit(fn)(x, w, bias), np.float32)
                err = np.abs(y - ref).max()
                res[name] = f"{ms:7.3f} ms (maxerr {err:.2e})"
            except Exception as e:
                res[name] = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
        print(f"B{b} {h}x{wd} C{c} k{k}:")
        for name, line in res.items():
            print(f"  {name:12s} {line}")


if __name__ == "__main__":
    main()
