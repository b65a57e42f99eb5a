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
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from accunet_tpu.models import build as build_model

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.model.startswith("Segmamba"):
        model = build_model(args.model, in_chans=args.channels, out_chans=1)
    else:
        model = build_model(
            args.model, n_channels=args.channels, n_classes=1, dtype=dtype
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
        with jax.profiler.trace(args.trace):
            for _ in range(args.steps):
                out = fwd(variables, x)
            jax.block_until_ready(out)
        print(f"profiler trace written to {args.trace}")
    t0 = time.perf_counter()
    for _ in range(args.steps):
        xc = x + (0 * out.ravel()[0]).astype(x.dtype)
        out = fwd(variables, xc)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"wall: {dt*1e3:.2f} ms/fwd  ({args.batch/dt:.1f} img/s)")


if __name__ == "__main__":
    main()
