"""ACC_UNet_W multi-class 512² batch sweep + per-module budget
(BASELINE config 4 — VERDICT r3 weak #1b: b2 was asserted, not swept).

Run: python benchmarks/bench_w512_sweep.py [--batch 1 2 4] [--trace]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import os

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("ACCUNET_JAX_CACHE", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from accunet_tpu.models import build


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="*", default=[1, 2, 4])
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--s2d", type=int, default=2)
    ap.add_argument("--trace", default=None,
                    help="trace dir: also dump the per-module device table "
                         "at the FIRST batch size")
    args = ap.parse_args()

    model = build("ACC_UNet_W", n_channels=3, n_classes=3,
                  dtype=jnp.bfloat16, s2d_levels=args.s2d)

    for bs in args.batch:
        x = jax.jit(
            lambda k: jax.random.uniform(
                k, (bs, args.img, args.img, 3)).astype(jnp.bfloat16)
        )(jax.random.PRNGKey(0))
        variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

        steps = args.steps

        @jax.jit
        def chained(v, x):
            def body(_, carry):
                x, tot = carry
                out = model.apply(v, x + (1e-6 * tot).astype(x.dtype),
                                  train=False)
                probe = out[:, ::8, ::8].mean().astype(jnp.float32)
                return x, tot + probe

            _, tot = jax.lax.fori_loop(0, steps, body, (x, jnp.float32(0)))
            return tot

        t0 = time.perf_counter()
        float(chained(variables, x))
        print(f"b{bs}: compile+warm {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.perf_counter()
        float(chained(variables, x))
        dt = (time.perf_counter() - t0) / steps
        print(f"ACC_UNet_W mc {args.img}^2 b{bs} s2d={args.s2d}: "
              f"{dt*1e3:7.1f} ms/step  {bs/dt:6.1f} img/s", flush=True)

        if args.trace and bs == args.batch[0]:
            with jax.profiler.trace(args.trace):
                float(chained(variables, x))
            from accunet_tpu.utils.trace_report import module_times, top_ops
            print(f"\nper-module device ms/step (b{bs}@{args.img}):")
            for mod, ms in module_times(args.trace, steps=steps)[:24]:
                print(f"  {ms:8.3f}  {mod}")
            print("top ops:")
            for name, ms, src in top_ops(args.trace, n=12, steps=steps):
                print(f"  {ms:8.3f}  {name[:40]:40s} {src[:60]}")


if __name__ == "__main__":
    main()
