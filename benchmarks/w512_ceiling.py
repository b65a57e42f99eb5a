"""W-512 ceiling inputs (ROOFLINE §17.2): whole-graph cost analysis of the
BASELINE config-4 graph (ACC_UNet_W, 3-class softmax, b2@512, bf16, s2d=2)
for the bound-vs-measured row.

Prints XLA's own flop/byte counts for the compiled single-step graph plus
floors at the §12-calibrated machine rates. Per-module floors are derived
in ROOFLINE §17.2 from the trace table (bench_w512_sweep.py --trace), the
same method as §12; this script supplies the whole-graph side.

Run (TPU): python benchmarks/w512_ceiling.py [--batch 2] [--img 512]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("ACCUNET_JAX_CACHE", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from accunet_tpu.models import build


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--s2d", type=int, default=2)
    args = ap.parse_args()

    model = build("ACC_UNet_W", n_channels=3, n_classes=3,
                  dtype=jnp.bfloat16, s2d_levels=args.s2d)
    x = jnp.zeros((args.batch, args.img, args.img, 3), jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)

    step = jax.jit(lambda v, x: model.apply(v, x, train=False))
    compiled = step.lower(variables, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_ = ca.get("bytes accessed", float("nan"))
    print(f"flops            : {flops/1e9:10.2f} GF")
    print(f"bytes accessed   : {bytes_/1e6:10.1f} MB")
    # §12-calibrated rates (same chip class): MXU 197 TF/s bf16 nominal,
    # ~highly derated by K/N fill at these widths — report both; HBM
    # effective 620 GB/s (reduction-fusion anchor) and the 192-231 GB/s
    # XLA pointwise-stream band (§16/§20) as the conservative bound.
    for name, rate in [("MXU nominal 197 TF/s", 197e12),
                       ("MXU derated 1/2", 98.5e12)]:
        print(f"flops floor @ {name:22s}: {flops/rate*1e3:7.2f} ms")
    for name, rate in [("HBM 620 GB/s (reduction anchor)", 620e9),
                       ("HBM 231 GB/s (pointwise band hi)", 231e9)]:
        print(f"bytes floor @ {name:32s}: {bytes_/rate*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
