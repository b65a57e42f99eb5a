"""A/B the §22 dwconv-backward levers under the EXACT driver train spec.

Runs bench.py's worker entry (the same 16-step chained train loop the
driver measures, ROOFLINE §15/§22) in alternating subprocesses:
ACCUNET_DWCONV_VJP=1 (shipping: hand-written transpose VJP + Pallas wgrad
where it engages) vs =0 (r4 shipping path: XLA autodiff of the slice-form
forward).  Alternation brackets window drift; the first =0 run pays one
cold relay compile (the =1 graph is already in the persistent cache after
a driver bench run).  Serialized — never run concurrently with another
TPU job (ROOFLINE §19.1 relay-poisoning).

Usage: python benchmarks/ab_dwconv_vjp.py [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPEC = {"kind": "train", "model": "ACC_UNet", "img": 224, "batch": 8,
        "steps": 16, "dtype": "bfloat16", "s2d": 2, "n_classes": 1,
        "repeats": 1, "attempt_s": 1800}


def run_once(vjp: str) -> dict:
    env = dict(os.environ)
    env["ACCUNET_DWCONV_VJP"] = vjp
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--_worker",
         json.dumps(SPEC)],
        capture_output=True, text=True, timeout=2400, env=env, cwd=REPO)
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        return {"ok": False, "error": proc.stdout[-400:] + proc.stderr[-400:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    results: dict[str, list[float]] = {"1": [], "0": []}
    for r in range(args.rounds):
        for vjp in ("1", "0"):
            out = run_once(vjp)
            ips = out.get("ips")
            print(f"round {r} VJP={vjp}: {out}", flush=True)
            if out.get("ok") and ips:
                results[vjp].append(ips)

    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2] if xs else float("nan")

    print(json.dumps({
        "vjp_on_med_ips": med(results["1"]), "vjp_on_all": results["1"],
        "vjp_off_med_ips": med(results["0"]), "vjp_off_all": results["0"],
    }), flush=True)


if __name__ == "__main__":
    main()
