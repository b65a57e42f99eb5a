"""Round-3 ACC_UNet_Lite A/B matrix on the real chip.

Runs the lever experiments from ROOFLINE §6 in one relay-uptime window and
prints a result table + JSON. Each config is measured in a WATCHDOG
SUBPROCESS (a Mosaic compile failure surfaces as an opaque HTTP 500 or a
hang through the relay — it must not kill the sweep).

Usage: python benchmarks/ab_acc_lite.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure(env_extra: dict, model="ACC_UNet_Lite", batch=8, s2d=2,
            timeout=420) -> dict:
    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_extra.items()})
    spec = {"kind": "infer", "model": model, "img": 224, "batch": batch,
            "steps": max(8, -(-1000 // batch)), "dtype": "bfloat16",
            "s2d": s2d, "repeats": 1}
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--_worker",
             json.dumps(spec)],
            capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
        )
    except subprocess.TimeoutExpired:
        return {"ok": False, "error": "timeout"}
    for line in reversed((proc.stdout or "").strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    tail = (proc.stderr or "").strip().splitlines()[-2:]
    return {"ok": False, "error": f"rc={proc.returncode}: {' | '.join(tail)}"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="baseline + one lever each instead of the full matrix")
    ap.add_argument("--timeout", type=float, default=420)
    args = ap.parse_args()

    configs = [
        # name, env, kwargs
        ("baseline_r2 (gb=1, no hybrid, minE=128)", {}, {}),
        ("gb=auto", {"ACCUNET_FUSED_HANC_GB": "auto"}, {}),
        ("E96 fused gb=auto", {"ACCUNET_FUSED_HANC_MIN_E": "96",
                               "ACCUNET_FUSED_HANC_GB": "auto"}, {}),
        ("hybrid cnv72", {"ACCUNET_HYBRID_EXPAND_DW": "1"}, {}),
        ("fused respath", {"ACCUNET_FUSED_RESPATH": "1"}, {}),
        ("ALL levers", {"ACCUNET_HYBRID_EXPAND_DW": "1",
                        "ACCUNET_FUSED_HANC_GB": "auto",
                        "ACCUNET_FUSED_HANC_MIN_E": "96",
                        "ACCUNET_FUSED_RESPATH": "1"}, {}),
    ]
    if not args.quick:
        configs += [
            ("E96 fused gb=1", {"ACCUNET_FUSED_HANC_MIN_E": "96"}, {}),
            ("gb=2 forced", {"ACCUNET_FUSED_HANC_GB": "2"}, {}),
            ("gb=4 forced E96", {"ACCUNET_FUSED_HANC_GB": "4",
                                 "ACCUNET_FUSED_HANC_MIN_E": "96"}, {}),
            ("hybrid all-E (minE=96)", {"ACCUNET_HYBRID_EXPAND_DW": "1",
                                        "ACCUNET_HYBRID_E_MIN": "96"}, {}),
            ("s2d=3 + hybrid", {"ACCUNET_HYBRID_EXPAND_DW": "1"},
             {"s2d": 3}),
            ("s2d=3 + hybrid + gb=auto",
             {"ACCUNET_HYBRID_EXPAND_DW": "1",
              "ACCUNET_FUSED_HANC_GB": "auto"}, {"s2d": 3}),
            ("b16 best-combo", {"ACCUNET_HYBRID_EXPAND_DW": "1",
                                "ACCUNET_FUSED_HANC_GB": "auto",
                                "ACCUNET_FUSED_HANC_MIN_E": "96"},
             {"batch": 16}),
        ]

    results = {}
    env_by_name = {}
    for name, env, kw in configs:
        t0 = time.time()
        r = measure(env, timeout=args.timeout, **kw)
        ips = r.get("ips")
        results[name] = round(ips, 1) if ips else r.get("error")
        env_by_name[name] = env
        print(f"{name:42s} {results[name]} "
              f"({time.time() - t0:.0f}s)", flush=True)
        with open(os.path.join(REPO, "benchmarks", "ab_results.json"),
                  "w") as f:
            json.dump({"ts": time.time(), "results": results}, f, indent=1)

    # run the full driver bench (headline + BASELINE extras) under the
    # winning env so the same relay window captures a driver-style artifact
    numeric = {n: v for n, v in results.items() if isinstance(v, float)}
    if numeric:
        best = max(numeric, key=numeric.get)
        print(f"\nbest config: {best} ({numeric[best]} img/s); "
              "running full bench under it", flush=True)
        env = dict(os.environ)
        env.update({k: str(v) for k, v in env_by_name[best].items()})
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, cwd=REPO, env=env,
            timeout=max(args.timeout * 4, 1800),
        )
        print(proc.stdout.strip(), flush=True)
        results["_full_bench_best_env"] = {"config": best,
                                           "stdout": proc.stdout.strip()}
        with open(os.path.join(REPO, "benchmarks", "ab_results.json"),
                  "w") as f:
            json.dump({"ts": time.time(), "results": results}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
