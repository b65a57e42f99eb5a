"""Train-step throughput benchmark (BASELINE config: full ACC-UNet 16.77M,
BCE+Dice, batch 8 @ 224; sweepable).

Run: python benchmarks/bench_train_step.py [--model ACC_UNet] [--batch 8 32]
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
import numpy as np
import optax

from accunet_tpu.models import build
from accunet_tpu.train import losses as L


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ACC_UNet")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batch", type=int, nargs="*", default=[8, 32])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--s2d", type=int, default=None,
                    help="ACC-UNet family: top-N levels in the s2d frame "
                         "(exact in training too — frame BN reduces over "
                         "positions)")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    kwargs = {"remat": True} if args.remat else {}
    if args.s2d is not None:
        kwargs["s2d_levels"] = args.s2d
    model = build(args.model, n_channels=3, n_classes=1, dtype=dt, **kwargs)
    tx = optax.adam(1e-3)

    for bs in args.batch:
        x = jnp.asarray(np.random.rand(bs, args.img, args.img, 3), jnp.float32)
        y = jnp.asarray(np.random.rand(bs, args.img, args.img, 1) > 0.5, jnp.float32)
        var = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
        opt = tx.init(var["params"])

        def loss_fn(p, bstats, x, y):
            out, upd = model.apply(
                {"params": p, "batch_stats": bstats}, x, train=True,
                mutable=["batch_stats"],
            )
            return L.weighted_dice_bce(out, y), upd["batch_stats"]

        def step(carry, x, y):
            p, bstats, o, l = carry
            xc = x + (1e-6 * l).astype(x.dtype)
            (l, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bstats, xc, y)
            u, no = tx.update(g, o, p)
            return optax.apply_updates(p, u), nbs, no, l

        n_steps = args.steps

        @jax.jit
        def run(p, bstats, o, x, y):
            # chained inside one jit: serialized on device, no per-step relay
            # dispatch; the scalar loss readback forces completion
            carry = (p, bstats, o, jnp.float32(0))
            for _ in range(n_steps):
                carry = step(carry, x, y)
            return carry[3]

        p, bstats = var["params"], var["batch_stats"]
        float(run(p, bstats, opt, x, y))  # compile + warm
        t0 = time.perf_counter()
        l = run(p, bstats, opt, x, y)
        lf = float(l)
        dtm = (time.perf_counter() - t0) / args.steps
        print(
            f"{args.model} b{bs}@{args.img} {args.dtype} train: "
            f"{dtm*1e3:7.1f} ms/step  {bs/dtm:7.1f} img/s  loss={lf:.4f}"
        )


if __name__ == "__main__":
    main()
