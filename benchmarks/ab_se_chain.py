"""Interleaved same-window A/B of SE-chained fused block pairs
(ROOFLINE §13.2/§13.4: block1's SE apply runs on block2's staged rows in
VMEM; the concat+SE XLA boundary pass between the pair disappears).

Configs (both s2d_levels=2, bf16):
  * ACC_UNet_Lite b8@224 inference (BASELINE config 1 — the §13 target)
  * ACC_UNet_W mc b2@512 inference (BASELINE config 4)

Run: python benchmarks/ab_se_chain.py [--rounds 5]
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


def make(chain: bool, name, b, img, n_classes, steps):
    os.environ["ACCUNET_SE_CHAIN"] = "1" if chain else "0"
    model = build(name, n_channels=3, n_classes=n_classes,
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

    jobs = [
        ("lite_chain", *make(True, "ACC_UNet_Lite", 8, 224, 1, 64)),
        ("lite_plain", *make(False, "ACC_UNet_Lite", 8, 224, 1, 64)),
        ("w512_chain", *make(True, "ACC_UNet_W", 2, 512, 3, 16)),
        ("w512_plain", *make(False, "ACC_UNet_W", 2, 512, 3, 16)),
    ]
    res = {tag: [] for tag, *_ in jobs}
    for r in range(args.rounds):
        for tag, fn, b, steps in jobs:
            t0 = time.perf_counter()
            fn()
            dt = (time.perf_counter() - t0) / steps
            res[tag].append(b / dt)
            print(f"round {r} {tag:11s}: {b/dt:7.1f} img/s", flush=True)
    for tag, v in res.items():
        v = sorted(v)
        print(f"{tag}: median {v[len(v)//2]:.1f}  best {v[-1]:.1f}  "
              f"all {[round(x, 1) for x in v]}")


if __name__ == "__main__":
    main()
