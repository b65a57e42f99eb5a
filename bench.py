"""Headline benchmark: 224x224 inference throughput (images/sec/chip).

Runs ACC_UNet_Lite (the BASELINE.json config-1 model) in bfloat16 on the
available accelerator, sweeps batch size, and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
vs_baseline is measured against the driver target of 5,000 img/s/chip
(BASELINE.md). Pass --model/--batch/--steps to explore.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

TARGET = 5000.0


def build(model_name: str, dtype):
    from accunet_tpu.models import build as build_model

    kwargs = {"n_channels": 3, "n_classes": 1, "dtype": dtype}
    return build_model(model_name, **kwargs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="UNext")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batches", type=int, nargs="*", default=[512, 1024])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3,
                    help="timing repeats per batch size (best taken; the "
                         "axon relay pool shares chips, so single runs are "
                         "noisy)")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build(args.model, dtype)

    best = 0.0
    best_bs = 0
    for bs in args.batches:
        x = jnp.zeros((bs, args.img, args.img, 3), jnp.float32)
        try:
            variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
            fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
            out = fwd(variables, x)
            out.block_until_ready()
            # timed steps; each step's input depends on the previous output
            # so executions serialize on one chip (the pool behind the axon
            # relay would otherwise run independent steps concurrently and
            # inflate throughput); repeats + best-of defends against pool
            # contention
            dt = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    xc = x + (0 * out[0, 0, 0, 0]).astype(x.dtype)
                    out = fwd(variables, xc)
                out.block_until_ready()
                dt = min(dt, time.perf_counter() - t0)
        except Exception as e:  # OOM at large batch etc.
            print(f"batch {bs} failed: {e}", file=sys.stderr)
            continue
        ips = bs * args.steps / dt
        print(f"batch {bs}: {ips:.1f} img/s", file=sys.stderr)
        if ips > best:
            best, best_bs = ips, bs
    print(
        json.dumps(
            {
                "metric": f"{args.model} {args.img}x{args.img} bf16 inference throughput (batch {best_bs})",
                "value": round(best, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(best / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
