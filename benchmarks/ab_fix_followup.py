"""Follow-up A/B for the two levers fixed after the 2026-08-18 window
(ROOFLINE §10): fused-ResPath Mosaic tiling and the calibrated gb picker.

Baseline re-measured in the same window so deltas are clock-honest.
Writes benchmarks/ab_fix_results.json incrementally.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_acc_lite import measure, REPO  # noqa: E402

CONFIGS = [
    ("default (minE=96, gb=1)", {}, {}),
    ("gb=auto calibrated", {"ACCUNET_FUSED_HANC_GB": "auto"}, {}),
    ("fused respath fixed", {"ACCUNET_FUSED_RESPATH": "1"}, {}),
    ("respath + gb=auto", {"ACCUNET_FUSED_RESPATH": "1",
                           "ACCUNET_FUSED_HANC_GB": "auto"}, {}),
    ("s2d=3 default", {}, {"s2d": 3}),
]


def main():
    out = os.path.join(REPO, "benchmarks", "ab_fix_results.json")
    results = {}
    for name, env, kw in CONFIGS:
        t0 = time.time()
        r = measure(env, timeout=420, **kw)
        ips = r.get("ips")
        results[name] = round(ips, 1) if ips else r.get("error")
        print(f"{name:32s} {results[name]} ({time.time() - t0:.0f}s)",
              flush=True)
        with open(out, "w") as f:
            json.dump({"ts": time.time(), "results": results}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
