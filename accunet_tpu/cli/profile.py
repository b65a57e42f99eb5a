"""Profiling entry point (replaces Experiments/profile_model.py and the THOP
hooks in test_model_flop.py).

Uses XLA's own cost model — jitted.lower().compile().cost_analysis() — for
FLOPs/bytes, plus parameter counts and optional wall-clock timing, and can
emit a jax.profiler trace for xprof.

    python -m accunet_tpu.cli.profile --model ACC_UNet --img 256 [--trace DIR]
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ACC_UNet")
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--channels", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--trace", default=None, help="profiler trace output dir")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--s2d", type=int, default=None,
                    help="ACC-UNet family: top-N levels in the s2d frame")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from accunet_tpu.models import build as build_model

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.model.startswith("Segmamba"):
        model = build_model(args.model, in_chans=args.channels, out_chans=1)
    else:
        kw = {} if args.s2d is None else {"s2d_levels": args.s2d}
        model = build_model(
            args.model, n_channels=args.channels, n_classes=1, dtype=dtype, **kw
        )
    x = jnp.zeros((args.batch, args.img, args.img, args.channels), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"])
    )
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    compiled = fwd.lower(variables, x).compile()
    ca = compiled.cost_analysis() or {}
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))
    print(f"model={args.model} input={args.batch}x{args.img}x{args.img}x{args.channels}")
    print(f"params: {n_params/1e6:.2f} M")
    print(f"flops/fwd: {flops/1e9:.2f} GF ({flops/args.batch/1e9:.2f} GF/img)")
    print(f"bytes accessed: {bytes_acc/1e6:.1f} MB")

    out = fwd(variables, x)
    jax.block_until_ready(out)
    if args.trace:
        # Chained in-jit steps (each input depends on the previous output)
        # so the device timeline reflects serialized execution — naive
        # repeated dispatch can be value-cached / overlap-acked by the
        # serving relay (ROOFLINE.md §0).
        @jax.jit
        def chained(v, x):
            def body(_, carry):
                x, tot = carry
                out = model.apply(v, x + (1e-6 * tot).astype(x.dtype),
                                  train=False)
                o = out[0] if isinstance(out, (tuple, list)) else out
                return x, tot + o[:, ::8, ::8].mean().astype(jnp.float32)

            _, tot = jax.lax.fori_loop(0, args.steps, body, (x, jnp.float32(0)))
            return tot

        float(chained(variables, x))  # compile + warm outside the trace
        with jax.profiler.trace(args.trace):
            float(chained(variables, x))
        print(f"profiler trace written to {args.trace}")
        try:
            from accunet_tpu.utils.trace_report import module_times, top_ops

            print(f"\nper-module device time (ms/step over {args.steps} steps):")
            for mod, ms in module_times(args.trace, steps=args.steps)[:25]:
                print(f"  {ms:8.3f}  {mod}")
            print("\ntop ops:")
            for name, ms, src in top_ops(args.trace, n=15, steps=args.steps):
                print(f"  {ms:8.3f}  {name[:48]:48s} {src[:60]}")
        except FileNotFoundError as e:
            print(f"(no parsable device trace: {e})")
    t0 = time.perf_counter()
    for _ in range(args.steps):
        xc = x + (0 * out.ravel()[0]).astype(x.dtype)
        out = fwd(variables, xc)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"wall: {dt*1e3:.2f} ms/fwd  ({args.batch/dt:.1f} img/s)"
          "  [naive dispatch timing — behind a serving relay the per-module"
          " device-trace numbers above are the honest ones; see ROOFLINE.md §0]")


if __name__ == "__main__":
    main()
