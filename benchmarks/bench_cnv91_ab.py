"""A/B of the frame-layout HANCBlock (cnv91 decoder shape) dwconv variants
and the dense conv1x1 (ROOFLINE.md §0 chain-delta methodology).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from accunet_tpu.ops import s2d

B, H, W = 8, 224, 224
CIN, E, NF, COUT = 64, 192, 64, 32
DT = jnp.bfloat16
N_SHORT, N_LONG = 4, 20


def timeit(fn, x0, iters=3):
    def chain(n):
        @jax.jit
        def run(x):
            def body(_, carry):
                x, tot = carry
                out = fn(x + (1e-6 * tot).astype(x.dtype))
                p = out[:, ::8, ::8].mean().astype(jnp.float32)
                return x, tot + p

            _, tot = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return tot

        return run

    def t(n):
        f = chain(n)
        float(f(x0))
        best = float("inf")
        for r in range(iters):
            xr = x0 + jnp.asarray(r * 1e-3, x0.dtype)
            t0 = time.perf_counter()
            float(f(xr))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(N_LONG) - t(N_SHORT)) / (N_LONG - N_SHORT) * 1e3


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    w1 = jax.random.normal(ks[0], (CIN, E), DT) * 0.05
    wd = jax.random.normal(ks[1], (3, 3, E), DT) * 0.1
    wh = jax.random.normal(ks[2], (E, 5, NF), DT) * 0.05
    bh = jnp.zeros((NF,), DT)
    w3 = jax.random.normal(ks[3], (NF, COUT), DT) * 0.05
    wf1 = jax.random.normal(ks[4], (COUT, COUT // 8), DT) * 0.1
    wf2 = jax.random.normal(ks[5], (COUT // 8, COUT), DT) * 0.1
    lrelu = lambda t: jax.nn.leaky_relu(t, 0.01)

    def block(conv1x1, dwconv):
        def f(x):
            t = lrelu(conv1x1(x, w1, None))
            t = lrelu(dwconv(t, wd, None))
            t = lrelu(s2d.hanc_mix_frame(t, wh, bh, 3))
            t = t + x
            t = lrelu(s2d.conv1x1(t, w3, None))
            s = s2d.global_avg_pool(t)
            s = jax.nn.sigmoid(lrelu(s @ wf1) @ wf2)
            return lrelu(t * jnp.tile(s, (1, 4))[:, None, None, :])

        return f

    xn = jax.random.normal(ks[6], (B, H, W, CIN), DT)
    xf = s2d.pack(xn)

    variants = {
        "blocked_c1+tap_dw": block(s2d.conv1x1_blocked, s2d.dwconv3x3),
        "dense_c1+tap_dw": block(s2d.conv1x1, s2d.dwconv3x3),
        "dense_c1+unpack_dw": block(s2d.conv1x1, s2d.dwconv3x3_unpack),
    }
    ref = None
    import numpy as np

    for name, fn in variants.items():
        y = np.asarray(jax.jit(fn)(xf), np.float32)
        if ref is None:
            ref = y
        err = np.abs(y - ref).max()
        ms = timeit(fn, xf)
        print(f"  {name:22s} {ms:7.3f} ms  (maxerr vs first {err:.2e})")


if __name__ == "__main__":
    main()
