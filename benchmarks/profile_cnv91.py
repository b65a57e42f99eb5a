"""Prefix-profile of the cnv91 HANCBlock (ACC-UNet level-1 decoder, the
single most expensive block: 64->32, 192-ch interior @224^2) on real TPU.

Methodology (ROOFLINE.md §0): each prefix P_i of the block's op sequence is
chained N times inside one jit via a scalar probe (x_next = x0 + eps*probe),
timed at two chain lengths, and differenced. Per-op cost = P_i - P_{i-1};
the probe/add overhead cancels in the difference. Run for both the standard
nhwc layout and the s2d frame layout.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from accunet_tpu.ops import s2d
from accunet_tpu.ops.pallas.hanc import _xla_hanc_mix
from accunet_tpu.ops.pooling import global_avg_pool

B, H, W = 8, 224, 224
CIN, E, NF, COUT = 64, 192, 64, 32  # cnv91: in 64, interior 192, hanc-out 64, out 32
DT = jnp.bfloat16

N_SHORT, N_LONG = 4, 20


def probe(t):
    return t[:, :: max(1, t.shape[1] // 16), :: max(1, t.shape[2] // 16)].mean().astype(jnp.float32)


def timeit(prefix_fn, x0, iters=3):
    def chain(n):
        @jax.jit
        def run(x):
            tot = jnp.float32(0)

            def body(_, carry):
                x, tot = carry
                out = prefix_fn(x + (1e-6 * tot).astype(x.dtype))
                return x, tot + probe(out)

            _, tot = jax.lax.fori_loop(0, n, body, (x, tot))
            return tot

        return run

    def t(n):
        fn = chain(n)
        float(fn(x0))
        best = float("inf")
        for r in range(iters):
            xr = x0 + jnp.asarray(r * 1e-3, x0.dtype)
            t0 = time.perf_counter()
            float(fn(xr))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(N_LONG) - t(N_SHORT)) / (N_LONG - N_SHORT) * 1e3


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    # parameters (bf16, inference BN folded to per-channel affine)
    w1 = jax.random.normal(ks[0], (CIN, E), DT) * 0.05
    g1, b1 = jnp.ones((E,), DT), jnp.zeros((E,), DT)
    wd = jax.random.normal(ks[1], (3, 3, E), DT) * 0.1
    g2, b2 = jnp.ones((E,), DT), jnp.zeros((E,), DT)
    wh = jax.random.normal(ks[2], (E, 5, NF), jnp.float32) * 0.05
    bh = jnp.zeros((NF,), jnp.float32)
    gn, bn_ = jnp.ones((NF,), DT), jnp.zeros((NF,), DT)
    w3 = jax.random.normal(ks[3], (NF, COUT), DT) * 0.05
    g3, b3 = jnp.ones((COUT,), DT), jnp.zeros((COUT,), DT)
    wf1 = jax.random.normal(ks[4], (COUT, COUT // 8), DT) * 0.1
    wf2 = jax.random.normal(ks[5], (COUT // 8, COUT), DT) * 0.1

    lrelu = lambda t: jax.nn.leaky_relu(t, 0.01)

    # ---------------- nhwc prefixes ----------------
    def n_conv1(x):
        return lrelu(jnp.einsum("bhwc,cd->bhwd", x, w1) * g1 + b1)

    def n_dw(x):
        t = n_conv1(x)
        from accunet_tpu.ops.pallas.dwconv2d import dwconv2d

        t = dwconv2d(t, wd, None)
        return lrelu(t * g2 + b2)

    def n_hanc(x):
        t = n_dw(x)
        t = _xla_hanc_mix(t, wh, bh, 3)
        return lrelu(t.astype(DT) * gn + bn_)

    def n_res(x):
        t = n_hanc(x)
        return t + x  # residual + BN-affine folded

    def n_conv3(x):
        t = n_res(x)
        return lrelu(jnp.einsum("bhwc,cd->bhwd", t, w3) * g3 + b3)

    def n_se(x):
        t = n_conv3(x)
        s = global_avg_pool(t)
        s = jax.nn.sigmoid(lrelu(s @ wf1) @ wf2)
        return lrelu(t * s[:, None, None, :])

    # ---------------- frame prefixes ----------------
    def f_conv1(x):
        return lrelu(s2d.conv1x1(x, w1, None) * s2d.tile4(g1) + s2d.tile4(b1))

    def f_dw(x):
        t = f_conv1(x)
        t = s2d.dwconv3x3(t, wd, None)
        return lrelu(t * s2d.tile4(g2) + s2d.tile4(b2))

    def f_hanc(x):
        t = f_dw(x)
        t = s2d.hanc_mix_frame(t, wh.astype(DT), bh.astype(DT), 3)
        return lrelu(t * s2d.tile4(gn) + s2d.tile4(bn_))

    def f_res(x):
        t = f_hanc(x)
        return t + x

    def f_conv3(x):
        t = f_res(x)
        return lrelu(s2d.conv1x1(t, w3, None) * s2d.tile4(g3) + s2d.tile4(b3))

    def f_se(x):
        t = f_conv3(x)
        s = s2d.global_avg_pool(t)
        s = jax.nn.sigmoid(lrelu(s @ wf1) @ wf2)
        return lrelu(t * jnp.tile(s, (1, 4))[:, None, None, :])

    xn = jax.random.normal(ks[6], (B, H, W, CIN), DT)
    xf = s2d.pack(xn)

    for tag, x0, prefixes in (
        ("nhwc", xn, [("conv1+bn", n_conv1), ("dwconv+bn", n_dw),
                      ("hanc+bn", n_hanc), ("residual", n_res),
                      ("conv3+bn", n_conv3), ("se", n_se)]),
        ("s2d ", xf, [("conv1+bn", f_conv1), ("dwconv+bn", f_dw),
                      ("hanc+bn", f_hanc), ("residual", f_res),
                      ("conv3+bn", f_conv3), ("se", f_se)]),
    ):
        prev = 0.0
        print(f"--- {tag} (input {x0.shape}) ---")
        for name, fn in prefixes:
            ms = timeit(fn, x0)
            print(f"  {name:10s} prefix {ms:7.3f} ms   op {ms - prev:7.3f} ms")
            prev = ms


if __name__ == "__main__":
    main()
