"""Parse a jax.profiler trace into per-op / per-module device-time tables.

The reference profiles with THOP hooks and torch.autograd.profiler
(Experiments/profile_model.py, test_model_flop.py:120-160), which attribute
wall time to nn.Module boundaries. The TPU-native equivalent is the XLA
device trace: `jax.profiler.trace` writes a Chrome-trace json whose ops
carry their originating jaxpr scope (module path) in `args.tf_op`, so the
same per-module attribution falls out of a groupby — including through the
serving relay, where host-side timing is unreliable (ROOFLINE.md §0).

Works on the trace.json.gz the TPU runtime emits; no tensorboard needed.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os


def _load_device_events(trace_dir: str):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    pids = {
        e["pid"]: e["args"]["name"]
        for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = [p for p, n in pids.items() if "TPU" in n or "device" in n.lower()]
    raw = [
        e
        for e in tr["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") in dev
    ]
    # trace window on the device lanes — used to tell an *envelope* span
    # (covers nearly the whole window) from a genuine op that happens to
    # have an all-digits name and no tf_op scope
    window = 0.0
    if raw:
        t0 = min(e.get("ts", 0.0) for e in raw)
        t1 = max(e.get("ts", 0.0) + e.get("dur", 0.0) for e in raw)
        window = max(t1 - t0, 1.0)
    events = []
    for e in raw:
        name = e["name"]
        if name.startswith(("jit_", "while")):  # enclosing regions, not ops
            continue
        if (name.isdigit() and "tf_op" not in e.get("args", {})
                and e.get("dur", 0.0) > 0.5 * window):
            # whole-execution envelope spans (name "0", no op scope) that
            # cover (most of) the jit region would double-count every op;
            # a short digit-named event is a real kernel and is kept
            continue
        events.append((name, e.get("dur", 0.0), e.get("args", {})))
    return events


def top_ops(trace_dir: str, n: int = 30, steps: int = 1):
    """[(op_name, ms_per_step, source_scope)] sorted by device time."""
    agg = collections.defaultdict(float)
    src = {}
    for name, dur, args in _load_device_events(trace_dir):
        agg[name] += dur
        src.setdefault(name, str(args.get("tf_op", "")))
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:n]
    return [(name, us / 1e3 / steps, src[name]) for name, us in rows]


def module_times(trace_dir: str, steps: int = 1, depth: int = 1):
    """Aggregate device time by originating module scope.

    The scope is the `tf_op` jaxpr path (e.g. `jit(f)/.../ACCUNet/cnv91/...`);
    `depth` counts path components after the model scope to keep.  Returns
    [(module, ms_per_step)] sorted by time, plus a ('total', ms) last row.
    """
    grp = collections.defaultdict(float)
    total = 0.0
    for name, dur, args in _load_device_events(trace_dir):
        path = str(args.get("tf_op", "")).split("/")
        # drop jit(...)/while/body wrappers; keep named module scopes
        mods = [p for p in path if p and "(" not in p and not p.startswith(
            ("while", "body", "closed_call", "jit", "transpose", "broadcast")
        )]
        key = "/".join(mods[1:1 + depth]) if len(mods) > 1 else (
            mods[0] if mods else "other")
        grp[key or "other"] += dur
        total += dur
    rows = sorted(grp.items(), key=lambda kv: -kv[1])
    out = [(m, us / 1e3 / steps) for m, us in rows]
    out.append(("total", total / 1e3 / steps))
    return out
