"""Interleaved same-window A/B of the fused frame pool-pack boundary op
(ROOFLINE §13.4 glue lever) on ACC_UNet_Lite b8@224 bf16 s2d=2.

Run: python benchmarks/ab_pool_pack.py [--rounds 6]
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

B, IMG, STEPS = 8, 224, 64


def make_fn(fused: bool):
    os.environ["ACCUNET_FUSED_POOL_PACK"] = "1" if fused else "0"
    model = build("ACC_UNet_Lite", n_channels=3, n_classes=1,
                  dtype=jnp.bfloat16, s2d_levels=2)
    x = jax.jit(
        lambda k: jax.random.uniform(k, (B, IMG, IMG, 3)).astype(jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

    @jax.jit
    def chained(v, x):
        def body(_, carry):
            x, tot = carry
            out = model.apply(v, x + (1e-6 * tot).astype(x.dtype), train=False)
            return x, tot + out[:, ::8, ::8].mean().astype(jnp.float32)

        _, tot = jax.lax.fori_loop(0, STEPS, body, (x, jnp.float32(0)))
        return tot

    float(chained(variables, x))  # compile+warm (env read at trace time)
    return lambda: float(chained(variables, x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()

    run_a = make_fn(True)   # fused pool-pack
    run_b = make_fn(False)  # two-op boundary (r3 shipping form)
    res = {"fused": [], "twoop": []}
    for r in range(args.rounds):
        for tag, fn in (("fused", run_a), ("twoop", run_b)):
            t0 = time.perf_counter()
            fn()
            dt = (time.perf_counter() - t0) / STEPS
            res[tag].append(B / dt)
            print(f"round {r} {tag:6s}: {B/dt:7.1f} img/s", flush=True)
    for tag, v in res.items():
        v = sorted(v)
        print(f"{tag}: median {v[len(v)//2]:.1f}  best {v[-1]:.1f}  "
              f"all {[round(x,1) for x in v]}")


if __name__ == "__main__":
    main()
