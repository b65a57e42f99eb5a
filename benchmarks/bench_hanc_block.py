"""A/B of the fused whole-HANCBlock kernel (ops/pallas/hanc_block.py) vs the
unfused s2d frame path at the real ACC_UNet_Lite level-1 shapes
(ROOFLINE.md §0 chain-delta methodology), with a row-tile sweep.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from accunet_tpu.ops import s2d
from accunet_tpu.ops.pallas.hanc_block import hanc_block_frame

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


def make_params(cin, e, nf, cout, k, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 10)
    w1 = jax.random.normal(ks[0], (cin, e), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[1], (e,), jnp.float32) * 0.01
    wd = jax.random.normal(ks[2], (3, 3, e), jnp.float32) * 0.1
    bd = jnp.zeros((e,), jnp.float32)
    wh = jax.random.normal(ks[3], (e, 2 * k - 1, nf), jnp.float32) * 0.05
    bh = jnp.zeros((nf,), jnp.float32)
    w3 = jax.random.normal(ks[4], (nf, cout), jnp.float32) * 0.05
    b3 = jnp.zeros((cout,), jnp.float32)
    bns = {}
    for name, c in (("norm1", e), ("norm2", e), ("hnc", nf), ("norm", nf),
                    ("norm3", cout)):
        s = 1.0 + 0.1 * jax.random.normal(ks[5], (c,), jnp.float32)
        t = 0.05 * jax.random.normal(ks[6], (c,), jnp.float32)
        bns[name] = (s, t)
    return dict(w1=w1, b1=b1, wd=wd, bd=bd, wh=wh, bh=bh, w3=w3, b3=b3,
                bns=bns)


def unfused(xf, p, k):
    """Op-by-op frame path (the production non-fused inference body)."""
    lrelu = lambda t: jax.nn.leaky_relu(t, 0.01)

    def aff(t, pair, bias=None):
        s, sh = pair
        sh = sh if bias is None else sh + bias * s
        return t * s2d.tile4(s).astype(t.dtype) + s2d.tile4(sh).astype(t.dtype)

    t = lrelu(aff(s2d.conv1x1(xf, p["w1"].astype(DT)), p["bns"]["norm1"], p["b1"]))
    t = lrelu(aff(s2d.dwconv3x3(t, p["wd"].astype(DT)), p["bns"]["norm2"], p["bd"]))
    t = lrelu(aff(s2d.hanc_mix_frame(t, p["wh"].astype(DT),
                                     jnp.zeros_like(p["bh"]).astype(DT), k),
                  p["bns"]["hnc"], p["bh"]))
    t = aff(t + xf, p["bns"]["norm"])
    t = lrelu(aff(s2d.conv1x1(t, p["w3"].astype(DT)), p["bns"]["norm3"], p["b3"]))
    return t


def fused(xf, p, k, th=None, pad_e=True):
    return hanc_block_frame(xf, p["w1"], p["b1"], p["wd"], p["bd"], p["wh"],
                            p["bh"], p["w3"], p["b3"], p["bns"], k, th=th,
                            pad_e=pad_e)


CASES = [
    ("cnv12 (32,E96)", 8, 112, 32, 96, 32, 32, 3),
    ("cnv91 (64,E192)", 8, 112, 64, 192, 64, 32, 3),
]


def main():
    for name, b, hf, cin, e, nf, cout, k in CASES:
        p = make_params(cin, e, nf, cout, k)
        xf = jax.random.normal(jax.random.PRNGKey(7), (b, hf, hf, 4 * cin), DT)
        ref = np.asarray(jax.jit(lambda x: unfused(x, p, k))(xf), np.float32)
        print(f"--- {name} frame {xf.shape} ---")
        ms_u = timeit(lambda x: unfused(x, p, k), xf)
        print(f"  unfused          {ms_u:7.3f} ms")
        for th in (8, 16):
            if hf % th:
                continue
            for pad_e in (False, True):
                try:
                    fn = lambda x: fused(x, p, k, th=th, pad_e=pad_e)
                    y = np.asarray(jax.jit(fn)(xf), np.float32)
                    err = np.abs(y - ref).max() / max(1e-6, np.abs(ref).max())
                    ms = timeit(fn, xf)
                    print(f"  fused th={th} pad={int(pad_e)}  {ms:7.3f} ms  (relerr {err:.2e})")
                except Exception as ex:
                    print(f"  fused th={th} pad={int(pad_e)}  FAIL {type(ex).__name__}: {str(ex)[:120]}")


if __name__ == "__main__":
    main()
