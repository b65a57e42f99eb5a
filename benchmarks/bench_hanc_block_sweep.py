"""Tile/pad sweep of the fused HANCBlock kernel over ALL six in-model
ACC_UNet_Lite geometries that the s2d=2 dispatch sends to the kernel
(ROOFLINE §12).  Finds the best (th, pad_e) per geometry; compile failures
(Mosaic scoped-VMEM) are caught and recorded.

Usage: python benchmarks/bench_hanc_block_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.bench_hanc_block import make_params, unfused, fused, timeit

DT = jnp.bfloat16

# name, b, hf(frame), cin, e, nf, cout, k  — nf == cin (residual), e = 3*cin
CASES = [
    ("cnv12  112f E96",  8, 112, 32, 96, 32, 32, 3),
    ("cnv92  112f E96",  8, 112, 32, 96, 32, 32, 3),
    ("cnv91  112f E192", 8, 112, 64, 192, 64, 32, 3),
    ("cnv21  56f E96",   8, 56, 32, 96, 32, 64, 3),
    ("cnv22  56f E192",  8, 56, 64, 192, 64, 64, 3),
    ("cnv82  56f E192",  8, 56, 64, 192, 64, 64, 3),
    ("cnv81  56f E384",  8, 56, 128, 384, 128, 64, 3),
]

THS = (8, 14, 16, 28)


def main():
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "hanc_tile_sweep.json")
    results = {}
    seen = set()
    for name, b, hf, cin, e, nf, cout, k in CASES:
        geom = (hf, cin, e, nf, cout, k)
        if geom in seen:
            continue  # identical geometry, identical timing
        seen.add(geom)
        p = make_params(cin, e, nf, cout, k)
        xf = jax.random.normal(jax.random.PRNGKey(7), (b, hf, hf, 4 * cin), DT)
        ref = np.asarray(jax.jit(lambda x: unfused(x, p, k))(xf), np.float32)
        row = {}
        print(f"--- {name} frame {xf.shape} ---", flush=True)
        ms_u = timeit(lambda x: unfused(x, p, k), xf)
        row["unfused"] = round(ms_u, 3)
        print(f"  unfused            {ms_u:7.3f} ms", flush=True)
        for th in THS:
            if hf % th or th % 2:
                continue
            for pad_e in (False, True):
                key = f"th={th} pad={int(pad_e)}"
                try:
                    fn = lambda x: fused(x, p, k, th=th, pad_e=pad_e)
                    y = np.asarray(jax.jit(fn)(xf), np.float32)
                    err = np.abs(y - ref).max() / max(1e-6, np.abs(ref).max())
                    assert err < 5e-2, f"relerr {err}"
                    ms = timeit(fn, xf)
                    row[key] = round(ms, 3)
                    print(f"  fused {key:14s} {ms:7.3f} ms (relerr {err:.1e})",
                          flush=True)
                except Exception as ex:
                    row[key] = f"FAIL {type(ex).__name__}"
                    print(f"  fused {key:14s} FAIL {str(ex)[:90]}", flush=True)
        results[name] = row
        with open(out_path, "w") as f:
            json.dump({"ts": time.time(), "results": results}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
