"""Offline Mosaic/XLA compile check of the lever configs — no TPU needed.

The image ships a local ``libtpu`` even though the chip sits behind the
serving relay, and JAX's AOT path can compile against an *offline topology
description* (``jax.experimental.topologies.get_topology_desc('v5e:2x2',
'tpu')``) with no devices attached.  That runs the REAL XLA:TPU pipeline —
including the Mosaic kernel compiler that otherwise only reports opaque
``HTTP 500: tpu_compile_helper subprocess exit code 1`` through the relay —
so every gated lever config (ROOFLINE §8) can be compile-validated and
cost-analyzed while the relay is down, and A/B windows are spent measuring,
never bisecting compile crashes.

Each config runs in a watchdog subprocess (a Mosaic crash must not kill the
sweep).  Reports ok/fail + XLA cost analysis (flops, bytes accessed,
optimal_seconds) per config.

Usage: python benchmarks/aot_check.py [--model ACC_UNet_Lite] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# same lever axes as ab_acc_lite.py
CONFIGS = [
    ("baseline_r2", {}, {}),
    ("gb=auto", {"ACCUNET_FUSED_HANC_GB": "auto"}, {}),
    ("E96 fused gb=auto", {"ACCUNET_FUSED_HANC_MIN_E": "96",
                           "ACCUNET_FUSED_HANC_GB": "auto"}, {}),
    ("E96 fused gb=1", {"ACCUNET_FUSED_HANC_MIN_E": "96"}, {}),
    ("gb=2 forced", {"ACCUNET_FUSED_HANC_GB": "2"}, {}),
    ("gb=4 forced E96", {"ACCUNET_FUSED_HANC_GB": "4",
                         "ACCUNET_FUSED_HANC_MIN_E": "96"}, {}),
    ("hybrid cnv72", {"ACCUNET_HYBRID_EXPAND_DW": "1"}, {}),
    ("hybrid all-E (minE=96)", {"ACCUNET_HYBRID_EXPAND_DW": "1",
                                "ACCUNET_HYBRID_E_MIN": "96"}, {}),
    ("fused respath", {"ACCUNET_FUSED_RESPATH": "1"}, {}),
    ("ALL levers", {"ACCUNET_HYBRID_EXPAND_DW": "1",
                    "ACCUNET_FUSED_HANC_GB": "auto",
                    "ACCUNET_FUSED_HANC_MIN_E": "96",
                    "ACCUNET_FUSED_RESPATH": "1"}, {}),
    ("s2d=3 + hybrid", {"ACCUNET_HYBRID_EXPAND_DW": "1"}, {"s2d": 3}),
    ("s2d=3 + ALL", {"ACCUNET_HYBRID_EXPAND_DW": "1",
                     "ACCUNET_FUSED_HANC_GB": "auto",
                     "ACCUNET_FUSED_HANC_MIN_E": "96",
                     "ACCUNET_FUSED_RESPATH": "1"}, {"s2d": 3}),
]


def _worker(spec: dict) -> dict:
    os.environ["JAX_PLATFORMS"] = "cpu"  # never touch the relay
    # The ambient backend is CPU during AOT tracing, which would switch every
    # env-gated Pallas kernel to its interpret/XLA fallback and validate
    # nothing (the hole that let the fused-ResPath tiling bug and the gb>1
    # scoped-VMEM OOM reach the 2026-08-18 measured window — ROOFLINE §10).
    # Force the TPU dispatch path so Mosaic actually lowers the kernels.
    os.environ["ACCUNET_FORCE_TPU_PATH"] = "1"
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies

    sys.path.insert(0, REPO)
    from accunet_tpu.models import build as build_model

    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    sh = jax.sharding.SingleDeviceSharding(topo.devices[0])

    kwargs = {"n_channels": 3, "n_classes": 1, "dtype": jnp.bfloat16}
    if spec.get("s2d"):
        kwargs["s2d_levels"] = spec["s2d"]
    model = build_model(spec["model"], **kwargs)

    bs, img = spec["batch"], spec.get("img", 224)
    x = jax.ShapeDtypeStruct((bs, img, img, 3), jnp.bfloat16, sharding=sh)
    # real variables (init on CPU) so BN folding constants etc. are concrete
    xz = jnp.zeros((bs, img, img, 3), jnp.bfloat16)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), xz))()

    fn = jax.jit(lambda v, x: model.apply(v, x, train=False),
                 out_shardings=sh)
    t0 = time.time()
    lowered = fn.lower(
        jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh),
            variables,
        ),
        x,
    )
    compiled = lowered.compile()
    dt = time.time() - t0
    ca = compiled.cost_analysis() or {}
    return {
        "ok": True,
        "compile_s": round(dt, 1),
        "flops": ca.get("flops"),
        "bytes": ca.get("bytes accessed"),
        "optimal_seconds": ca.get("optimal_seconds"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ACC_UNet_Lite")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--timeout", type=float, default=900)
    ap.add_argument("--only", default=None, help="substring filter on name")
    ap.add_argument("--_worker", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._worker is not None:
        try:
            out = _worker(json.loads(args._worker))
        except Exception as e:  # noqa: BLE001
            out = {"ok": False, "error": f"{type(e).__name__}: {str(e)[:500]}"}
        print(json.dumps(out), flush=True)
        return

    results = {}
    for name, env_extra, kw in CONFIGS:
        if args.only and args.only not in name:
            continue
        spec = {"model": args.model, "batch": args.batch,
                "img": args.img, "s2d": kw.get("s2d", 2)}
        env = dict(os.environ)
        env.update(env_extra)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--_worker",
                 json.dumps(spec)],
                capture_output=True, text=True, timeout=args.timeout,
                cwd=REPO, env=env,
            )
            res = None
            for line in reversed((proc.stdout or "").strip().splitlines()):
                try:
                    res = json.loads(line)
                    break
                except ValueError:
                    continue
            if res is None:
                tail = (proc.stderr or "").strip().splitlines()[-3:]
                res = {"ok": False,
                       "error": f"rc={proc.returncode}: {' | '.join(tail)}"}
        except subprocess.TimeoutExpired:
            res = {"ok": False, "error": "timeout"}
        results[name] = res
        status = "ok" if res.get("ok") else f"FAIL: {res.get('error')}"
        extra = ""
        if res.get("ok"):
            extra = (f"  compile {res['compile_s']}s"
                     f"  opt {res.get('optimal_seconds')}")
        print(f"{name:28s} {status}{extra}", flush=True)
    print(json.dumps(results), flush=True)
    n_fail = sum(1 for r in results.values() if not r.get("ok"))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
