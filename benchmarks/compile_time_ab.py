"""Offline (relay-independent) compile-time attribution of the driver specs.

VERDICT r4 #2: cold compiles killed the r4 bench (W-512 >420s, train >765s
in the r5 window) and compile seconds were untracked. Relay-side compile
times vary ~5x with relay load (ROOFLINE §19), so this harness compiles the
EXACT driver-spec graphs offline against the local libtpu topology
(jax.experimental.topologies — the same real XLA:TPU + Mosaic pipeline,
aot_check.py mechanism) where times are deterministic, and A/Bs the graph
levers that might explain the big numbers:

  * ACC_UNet train step (fwd+bwd+Adam, b8@224, s2d=2): frame-MLFC vs nhwc
  * ACC_UNet_W mc 512^2 b2 infer: frame-MLFC vs nhwc, fused kernels on/off
  * UNext b8 vs b1024 infer
  * ACC_UNet_Lite b8 infer (the 312s cold spec)

Each config runs in a fresh subprocess (env gates are import-time-ish and a
Mosaic crash must not kill the sweep). 1-core host: absolute numbers are
slower than the relay's compile servers; RELATIVE ratios are the signal.

Usage: python benchmarks/compile_time_ab.py [--only substr] [--timeout 3600]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("unext_b8_infer", {"model": "UNext", "kind": "infer", "batch": 8}, {}),
    ("unext_b1024_infer",
     {"model": "UNext", "kind": "infer", "batch": 1024}, {}),
    ("lite_b8_infer",
     {"model": "ACC_UNet_Lite", "kind": "infer", "batch": 8, "s2d": 2}, {}),
    ("train_b8_frameMLFC",
     {"model": "ACC_UNet", "kind": "train", "batch": 8, "s2d": 2}, {}),
    ("train_b8_nhwcMLFC",
     {"model": "ACC_UNet", "kind": "train", "batch": 8, "s2d": 2},
     {"ACCUNET_MLFC_FRAME": "0"}),
    ("train_b8_nos2d",
     {"model": "ACC_UNet", "kind": "train", "batch": 8}, {}),
    ("w512_b2_frameMLFC",
     {"model": "ACC_UNet_W", "kind": "infer", "batch": 2, "img": 512,
      "n_classes": 3, "s2d": 2}, {}),
    ("w512_b2_nhwcMLFC",
     {"model": "ACC_UNet_W", "kind": "infer", "batch": 2, "img": 512,
      "n_classes": 3, "s2d": 2}, {"ACCUNET_MLFC_FRAME": "0"}),
    ("w512_b2_nofuse",
     {"model": "ACC_UNet_W", "kind": "infer", "batch": 2, "img": 512,
      "n_classes": 3, "s2d": 2}, {"ACCUNET_FUSED_HANC": "0"}),
]


def _worker(spec: dict) -> dict:
    os.environ["JAX_PLATFORMS"] = "cpu"  # never touch the relay
    os.environ["ACCUNET_FORCE_TPU_PATH"] = "1"  # real Mosaic lowering
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies

    sys.path.insert(0, REPO)
    from accunet_tpu.models import build as build_model

    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    sh = jax.sharding.SingleDeviceSharding(topo.devices[0])

    kwargs = {"n_channels": 3,
              "n_classes": spec.get("n_classes", 1),
              "dtype": jnp.bfloat16}
    if spec.get("s2d"):
        kwargs["s2d_levels"] = spec["s2d"]
    model = build_model(spec["model"], **kwargs)

    bs, img = spec["batch"], spec.get("img", 224)
    xz = jnp.zeros((bs, img, img, 3), jnp.bfloat16)
    t_trace0 = time.time()

    if spec["kind"] == "train":
        import optax

        from accunet_tpu.train import losses as L

        yz = jnp.zeros((bs, img, img, 1), jnp.float32)
        variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), xz))()
        params, stats = variables["params"], variables["batch_stats"]
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        def loss_fn(params, stats, x, y):
            preds, upd = model.apply(
                {"params": params, "batch_stats": stats},
                x, train=True, mutable=["batch_stats"])
            return L.weighted_dice_bce(preds, y), upd["batch_stats"]

        def step(params, stats, opt_state, x, y):
            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, stats, x, y)
            updates, opt_state = tx.update(grads, opt_state, params)
            return loss, optax.apply_updates(params, updates), stats, opt_state

        fn = jax.jit(step, out_shardings=sh)
        sds = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh),
            (params, stats, opt_state, xz, yz))
        lowered = fn.lower(*sds)
    else:
        variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), xz))()
        fn = jax.jit(lambda v, x: model.apply(v, x, train=False),
                     out_shardings=sh)
        sds = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh),
            (variables, xz))
        lowered = fn.lower(*sds)

    t_c0 = time.time()
    compiled = lowered.compile()
    t1 = time.time()
    ca = compiled.cost_analysis() or {}
    hlo_ops = lowered.compiler_ir("hlo").as_hlo_text().count("\n")
    return {
        "ok": True,
        "trace_lower_s": round(t_c0 - t_trace0, 1),
        "compile_s": round(t1 - t_c0, 1),
        "hlo_lines": hlo_ops,
        "flops": ca.get("flops"),
        "bytes": ca.get("bytes accessed"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--timeout", type=float, default=3600)
    ap.add_argument("--_worker", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._worker:
        try:
            out = _worker(json.loads(args._worker))
        except Exception as e:  # noqa: BLE001
            out = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        print("RESULT " + json.dumps(out), flush=True)
        return

    for name, spec, env in CONFIGS:
        if args.only and args.only not in name:
            continue
        child_env = dict(os.environ)
        child_env.update(env)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--_worker",
                 json.dumps(spec)],
                capture_output=True, text=True, timeout=args.timeout,
                cwd=REPO, env=child_env,
            )
            out = {}
            for line in (proc.stdout or "").splitlines():
                if line.startswith("RESULT "):
                    out = json.loads(line[len("RESULT "):])
            if not out:
                out = {"ok": False,
                       "error": (proc.stderr or "")[-300:]}
        except subprocess.TimeoutExpired:
            out = {"ok": False, "error": f"timeout {args.timeout:.0f}s"}
        out["wall_s"] = round(time.time() - t0, 1)
        print(f"{name}: {json.dumps(out)}", flush=True)


if __name__ == "__main__":
    main()
