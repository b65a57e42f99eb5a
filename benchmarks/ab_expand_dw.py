"""Interleaved same-window A/B of the hybrid expand+dwconv kernel
(ROOFLINE §8 lever 2, env ACCUNET_HYBRID_EXPAND_DW) at the BASELINE
config-4 geometry: ACC_UNet_W mc 512² b2 s2d=2, where cnv72 (inv_fctr=34,
E=4352) runs NHWC at 128² and the §19 re-trace shows it is the single
biggest module (6.9 ms of a 40.6 ms step).

Run: python benchmarks/ab_expand_dw.py [--rounds 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("ACCUNET_JAX_CACHE", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from accunet_tpu.models import build


def make_w_infer(hybrid: bool, b=2, img=512, steps=16):
    os.environ["ACCUNET_HYBRID_EXPAND_DW"] = "1" if hybrid else "0"
    model = build("ACC_UNet_W", n_channels=3, n_classes=3,
                  dtype=jnp.bfloat16, s2d_levels=2)
    x = jax.jit(
        lambda k: jax.random.uniform(k, (b, img, img, 3)).astype(jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

    @jax.jit
    def chained(v, x):
        def body(_, carry):
            x, tot = carry
            out = model.apply(v, x + (1e-6 * tot).astype(x.dtype), train=False)
            return x, tot + out[:, ::8, ::8].mean().astype(jnp.float32)

        _, tot = jax.lax.fori_loop(0, steps, body, (x, jnp.float32(0)))
        return tot

    float(chained(variables, x))
    return (lambda: float(chained(variables, x))), b, steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    runs = {}
    for name, hy in (("xla", False), ("hybrid", True)):
        t0 = time.perf_counter()
        runs[name] = make_w_infer(hy)
        print(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s",
              flush=True)

    res = {k: [] for k in runs}
    for r in range(args.rounds):
        for name in ("xla", "hybrid") if r % 2 == 0 else ("hybrid", "xla"):
            fn, b, steps = runs[name]
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            ips = b * steps / dt
            res[name].append(ips)
            print(f"  round {r} {name:7s}: {ips:7.1f} img/s", flush=True)

    for name, vals in res.items():
        vals = sorted(vals)
        med = vals[len(vals) // 2]
        print(f"{name:7s}: median {med:7.1f} img/s  "
              f"(min {vals[0]:.1f} max {vals[-1]:.1f})")


if __name__ == "__main__":
    main()
