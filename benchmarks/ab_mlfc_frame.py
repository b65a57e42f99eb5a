"""Interleaved same-window A/B of the frame-layout MLFC level-1 path
(ROOFLINE §17 lever: the three MLFC stacks are 38% of the ACC_UNet_W 512²
step). Two configs, both with s2d_levels=2:

  * ACC_UNet_W mc 512² b2 inference (BASELINE config 4)
  * ACC_UNet 224² b8 train step     (BASELINE config 2) — full MLFC shares
    the same level-1 path

Run: python benchmarks/ab_mlfc_frame.py [--rounds 5] [--skip-train]
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
import optax

from accunet_tpu.models import build


def make_w_infer(frame: bool, b=2, img=512, steps=16):
    os.environ["ACCUNET_MLFC_FRAME"] = "1" if frame else "0"
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


def make_train(frame: bool, b=8, img=224, steps=8):
    """Mirror of bench.py's config-2 construction (weighted_dice_bce on the
    sigmoid output, chained fori_loop, Adam)."""
    from accunet_tpu.train import losses as L

    os.environ["ACCUNET_MLFC_FRAME"] = "1" if frame else "0"
    model = build("ACC_UNet", n_channels=3, n_classes=1,
                  dtype=jnp.bfloat16, s2d_levels=2)
    x = jax.jit(
        lambda k: jax.random.uniform(k, (b, img, img, 3)).astype(jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    y = jax.jit(
        lambda k: (jax.random.uniform(k, (b, img, img, 1)) > 0.5
                   ).astype(jnp.float32)
    )(jax.random.PRNGKey(7))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
    params, bstats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(params, stats, x, y):
        preds, upd = model.apply(
            {"params": params, "batch_stats": stats},
            x, train=True, mutable=["batch_stats"],
        )
        return L.weighted_dice_bce(preds, y), upd["batch_stats"]

    @jax.jit
    def chained(params, stats, opt, x, y):
        def body(_, carry):
            params, stats, opt, _ = carry
            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, stats, x, y)
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            return params, stats, opt, loss

        carry = jax.lax.fori_loop(
            0, steps, body, (params, stats, opt, jnp.float32(0)))
        return carry[-1]

    float(chained(params, bstats, opt, x, y))
    return (lambda: float(chained(params, bstats, opt, x, y))), b, steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    jobs = [("w512_frame", *make_w_infer(True)),
            ("w512_nhwc", *make_w_infer(False))]
    if not args.skip_train:
        jobs += [("train_frame", *make_train(True)),
                 ("train_nhwc", *make_train(False))]

    res = {tag: [] for tag, *_ in jobs}
    for r in range(args.rounds):
        for tag, fn, b, steps in jobs:
            t0 = time.perf_counter()
            fn()
            dt = (time.perf_counter() - t0) / steps
            res[tag].append(b / dt)
            print(f"round {r} {tag:12s}: {b/dt:7.1f} img/s", flush=True)
    for tag, v in res.items():
        v = sorted(v)
        print(f"{tag}: median {v[len(v)//2]:.1f}  best {v[-1]:.1f}  "
              f"all {[round(x, 1) for x in v]}")


if __name__ == "__main__":
    main()
