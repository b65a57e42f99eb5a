"""Headline benchmark: 224x224 inference throughput (images/sec/chip).

Default run walks an ordered job ladder and prints a RUNNING JSON line after
every successful measurement (the driver parses the LAST line, so a run
killed mid-way still reports everything measured so far):

  1. UNext b8 inference        — a nonzero headline within ~1 min, even cold
  2. ACC_UNet_Lite b8          — BASELINE config 1
  3. UNext b1024 inference     — the full headline (>20k img/s/chip, round 3)
  4. ACC_UNet train step b8    — BASELINE config 2
  5. ACC_UNet_W mc 512x512 b2  — BASELINE config 4
  6. selective-scan block      — BASELINE config 5 (kernel reading, Mtok/s)
  7. SpatialMambaBlock         — BASELINE config 5 (end-to-end block, img/s)
  8. UNext b512 inference      — headline backstop geometry

  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "extras": {...}, "compile_s": {...}}

vs_baseline is measured against the driver target of 5,000 img/s/chip
(BASELINE.md). Pass --model/--batches/--steps/--s2d to explore.

Outage hardening (the serving relay in front of the chip has multi-hour
outages during which backend init BLOCKS rather than raising — BENCH_r02 was
rc=124 with no output): every measurement attempt runs in a watchdog
subprocess. The worker emits heartbeat lines naming its phase
(backend/build/compile/measure), so the parent can tell "the chip is
compiling a big graph" (allowed its full per-spec budget, NOT an outage)
from "the relay is hung" (no heartbeats, or stuck in backend init — killed
fast and counted toward relay-down). BENCH_r04 lost the headline to exactly
this confusion: cold compiles >420s were treated as outages and never
retried. Cold-compile seconds per spec are now reported in "compile_s".
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

TARGET = 5000.0
REPO = os.path.dirname(os.path.abspath(__file__))

_HB_INTERVAL = float(os.environ.get("BENCH_HB_INTERVAL", "10"))


# --------------------------------------------------------------------------
# worker side: one measurement in one subprocess (the only code that touches
# the jax backend, and therefore the only code that can hang)
# --------------------------------------------------------------------------

_PHASE = {"name": "start", "t0": 0.0}


def _set_phase(name: str) -> None:
    _PHASE["name"] = name
    _PHASE["t0"] = time.time()
    print(json.dumps({"hb": name, "elapsed": 0.0}), flush=True)


def _heartbeat_forever() -> None:
    while True:
        time.sleep(_HB_INTERVAL)
        print(
            json.dumps(
                {
                    "hb": _PHASE["name"],
                    "elapsed": round(time.time() - _PHASE["t0"], 1),
                }
            ),
            flush=True,
        )


def _worker_main(spec: dict) -> dict:
    if os.environ.get("_BENCH_TEST_HANG") == "1":  # watchdog test hook:
        time.sleep(3600)  # dead silence — simulates a relay hang
    fake = os.environ.get("_BENCH_TEST_FAKE")  # fast-path test hook (no jax)
    fake_map = os.environ.get("_BENCH_TEST_FAKE_MAP")
    if fake_map:
        label = f"{spec['model']}/{spec['kind']}/b{spec['batch']}"
        table = json.loads(fake_map)
        fake = json.dumps(table.get(label, table.get("default")))
    if fake and fake != "null":
        res = json.loads(fake)
        if res.get("behavior") == "compile_hang":
            # simulates a healthy chip stuck in a >budget compile: heartbeats
            # flow, phase says "compile"
            _PHASE["t0"] = time.time()
            threading.Thread(target=_heartbeat_forever, daemon=True).start()
            _set_phase("compile")
            time.sleep(3600)
        return res

    _PHASE["t0"] = time.time()
    threading.Thread(target=_heartbeat_forever, daemon=True).start()
    _set_phase("import")

    import jax
    import jax.numpy as jnp

    # persistent compile cache: the ACC-UNet fwd+bwd train step alone can
    # take minutes to compile cold over the serving relay — without the
    # cache a cold round can blow the per-attempt watchdog budget
    jax.config.update("jax_compilation_cache_dir", os.environ.get("ACCUNET_JAX_CACHE", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, REPO)

    _set_phase("backend")
    jax.devices()  # force backend init under the "backend" phase label
    _set_phase("build")
    t_build0 = time.time()

    if spec["kind"] == "ssmblock":
        # BASELINE config 5, block reading: a full SpatialMambaBlock (CPE
        # dwconvs + LayerNorms + StructureAwareSSM with the chunked Pallas
        # scan + state fusion + FFN) at the stage-1 geometry, img/s.
        from accunet_tpu.nn.ssm import SpatialMambaBlock

        b, hw, c, steps = 8, 56, 64, spec["steps"]
        model = SpatialMambaBlock(hidden_dim=c, d_state=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, c),
                              jnp.float32)
        variables = jax.jit(lambda: model.init(jax.random.PRNGKey(1), x))()

        @jax.jit
        def chained(v, x):
            def body(_, carry):
                x, tot = carry
                y = model.apply(v, x + (1e-9 * tot).astype(x.dtype))
                return x, tot + y[:, ::8, ::8].mean()

            _, tot = jax.lax.fori_loop(0, steps, body, (x, jnp.float32(0)))
            return tot

        _set_phase("compile")
        float(chained(variables, x))  # compile + warm
        compile_s = time.time() - t_build0
        _set_phase("measure")
        t0 = time.perf_counter()
        float(chained(variables, x))
        dt = time.perf_counter() - t0
        return {"ok": True, "ips": b * steps / dt, "batch": b,
                "compile_s": round(compile_s, 1)}

    if spec["kind"] == "scan":
        # BASELINE config 5: the selective-scan Pallas chunked-scan block at
        # the SpatialMamba shape (B, L=56*56, D=d_inner*d_state). Reports
        # millions of scanned tokens per second.
        from accunet_tpu.ops.pallas.scan import chunked_linear_scan

        b, l, d, steps = 8, 3136, 768, spec["steps"]
        ka, kb = jax.random.split(jax.random.PRNGKey(0))
        a = jax.random.uniform(ka, (b, l, d), jnp.float32, 0.2, 0.99)
        bb = jax.random.uniform(kb, (b, l, d), jnp.float32, -0.5, 0.5)

        @jax.jit
        def chained(a, bb):
            def body(_, carry):
                a, tot = carry
                h = chunked_linear_scan(a + 1e-9 * tot, bb)
                return a, tot + h[:, -1].mean()

            _, tot = jax.lax.fori_loop(0, steps, body, (a, jnp.float32(0)))
            return tot

        _set_phase("compile")
        float(chained(a, bb))  # compile + warm
        compile_s = time.time() - t_build0
        _set_phase("measure")
        t0 = time.perf_counter()
        float(chained(a, bb))
        dt = time.perf_counter() - t0
        return {"ok": True, "ips": b * l * steps / dt, "batch": b,
                "compile_s": round(compile_s, 1)}

    from accunet_tpu.models import build as build_model

    dtype = jnp.bfloat16 if spec["dtype"] == "bfloat16" else jnp.float32
    kwargs = {"n_channels": 3, "n_classes": spec.get("n_classes", 1),
              "dtype": dtype}
    if spec.get("s2d"):
        kwargs["s2d_levels"] = spec["s2d"]
    model = build_model(spec["model"], **kwargs)
    bs, img, steps = spec["batch"], spec["img"], spec["steps"]

    # Timing methodology for the serving relay in front of the chip:
    # block_until_ready is acked before execution completes and per-execution
    # dispatch carries large variable overhead, so `steps` iterations are
    # CHAINED INSIDE ONE JIT (each step's input depends numerically on the
    # previous step's output — forced serialization, no value-cache reuse, no
    # per-step dispatch cost) and completion is forced by a 4-byte scalar
    # host readback. See ROOFLINE.md §0.
    x = jax.jit(
        lambda k: jax.random.uniform(k, (bs, img, img, 3)).astype(dtype)
    )(jax.random.PRNGKey(0))

    if spec["kind"] == "train":
        import optax

        from accunet_tpu.train import losses as L

        y = jax.jit(
            lambda k: (jax.random.uniform(k, (bs, img, img, 1)) > 0.5)
            .astype(jnp.float32)
        )(jax.random.PRNGKey(7))
        variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
        params, batch_stats = variables["params"], variables["batch_stats"]
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        def loss_fn(params, stats, x, y):
            preds, upd = model.apply(
                {"params": params, "batch_stats": stats},
                x, train=True, mutable=["batch_stats"],
            )
            return L.weighted_dice_bce(preds, y), upd["batch_stats"]

        @jax.jit
        def chained(params, stats, opt_state, x, y):
            def body(_, carry):
                params, stats, opt_state, _ = carry
                (loss, stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, stats, x, y)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, stats, opt_state, loss

            carry = jax.lax.fori_loop(
                0, steps, body, (params, stats, opt_state, jnp.float32(0))
            )
            return carry[-1]

        _set_phase("compile")
        float(chained(params, batch_stats, opt_state, x, y))  # compile+warm
        compile_s = time.time() - t_build0
        _set_phase("measure")
        t0 = time.perf_counter()
        float(chained(params, batch_stats, opt_state, x, y))
        dt = time.perf_counter() - t0
        return {"ok": True, "ips": bs * steps / dt, "batch": bs,
                "compile_s": round(compile_s, 1)}

    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

    @jax.jit
    def chained(v, x):
        def body(_, carry):
            x, tot = carry
            out = model.apply(v, x + (1e-6 * tot).astype(x.dtype), train=False)
            # strided sample: keeps the step serialized on the output without
            # paying a full-resolution reduce per step (a (B,224,224,1) mean
            # costs multiple ms on its own)
            probe = out[:, ::8, ::8].mean().astype(jnp.float32)
            return x, tot + probe

        _, tot = jax.lax.fori_loop(0, steps, body, (x, jnp.float32(0)))
        return tot

    _set_phase("compile")
    float(chained(variables, x))  # compile + warm
    compile_s = time.time() - t_build0
    _set_phase("measure")
    dt = float("inf")
    for r in range(spec.get("repeats", 1)):
        xr = jax.jit(
            lambda k: jax.random.uniform(k, (bs, img, img, 3)).astype(dtype)
        )(jax.random.PRNGKey(r + 1))
        t0 = time.perf_counter()
        float(chained(variables, xr))
        dt = min(dt, time.perf_counter() - t0)
    return {"ok": True, "ips": bs * steps / dt, "batch": bs,
            "compile_s": round(compile_s, 1)}


# --------------------------------------------------------------------------
# parent side: job scheduling, phase-aware watchdogs, deadline, running JSON
# --------------------------------------------------------------------------

_TRANSIENT = ("UNAVAILABLE", "INTERNAL", "DEADLINE", "remote_compile",
              "Unavailable", "RESOURCE_EXHAUSTED")
_RETRY_SLEEP = float(os.environ.get("BENCH_RETRY_SLEEP", "20"))
# a healthy worker heartbeats every _HB_INTERVAL seconds; silence this long
# means the process is wedged (relay outage blocking even the hb thread)
_STALL_S = float(os.environ.get("BENCH_STALL_S", "120"))
# backend init is seconds when the relay is up; minutes of "backend" phase
# IS the outage signature (init blocks rather than raises)
_BACKEND_CAP_S = float(os.environ.get("BENCH_BACKEND_CAP_S", "240"))


def _reader(stream, sink, state):
    for line in iter(stream.readline, ""):
        state["last_out"] = time.time()
        line = line.strip()
        if not line:
            continue
        try:
            d = json.loads(line)
        except ValueError:
            sink.append(line)
            continue
        if isinstance(d, dict) and "hb" in d:
            state["phase"] = d["hb"]
            state["phase_elapsed"] = float(d.get("elapsed", 0.0))
        else:
            state["result"] = d
    stream.close()


def _run_attempt(spec: dict, budget: float) -> dict:
    """Run one measurement attempt in a phase-aware watchdog subprocess.

    Kill rules (in priority order):
      * no output for _STALL_S           -> hang (relay outage)
      * "backend" phase > _BACKEND_CAP_S -> hang (init blocking = outage)
      * total attempt time > budget      -> compile_timeout if the last
        heartbeat said "compile" (healthy chip, graph too big for the
        budget — NOT an outage), else hang
    """
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--_worker",
         json.dumps(spec)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
    )
    state = {"last_out": time.time(), "phase": "start", "phase_elapsed": 0.0,
             "result": None}
    err_tail: list[str] = []
    t_out = threading.Thread(target=_reader, args=(proc.stdout, [], state),
                             daemon=True)
    t_err = threading.Thread(target=_reader,
                             args=(proc.stderr, err_tail, state), daemon=True)
    t_out.start()
    t_err.start()
    t0 = time.time()
    stall = min(_STALL_S, budget)
    backend_cap = min(_BACKEND_CAP_S, budget)
    kill_reason = None
    while proc.poll() is None:
        now = time.time()
        if now - state["last_out"] > stall:
            kill_reason = {
                "ok": False, "hang": True,
                "error": (f"stall timeout: no worker output for {stall:.0f}s "
                          f"(phase {state['phase']})")}
        elif state["phase"] == "backend" and (
                state["phase_elapsed"] > backend_cap
                or now - t0 > backend_cap + 60):
            kill_reason = {
                "ok": False, "hang": True,
                "error": (f"backend init exceeded {backend_cap:.0f}s "
                          "— relay outage signature")}
        elif now - t0 > budget:
            if state["phase"] == "compile":
                kill_reason = {
                    "ok": False, "compile_timeout": True,
                    "error": (f"compile exceeded {budget:.0f}s budget "
                              "(chip healthy — heartbeats in compile phase)")}
            else:
                kill_reason = {
                    "ok": False, "hang": True,
                    "error": (f"attempt timeout after {budget:.0f}s "
                              f"(phase {state['phase']})")}
        if kill_reason is not None:
            proc.kill()
            proc.wait()
            return kill_reason
        time.sleep(0.25)
    t_out.join(timeout=5)
    t_err.join(timeout=5)
    if state["result"] is not None:
        return state["result"]
    tail = " | ".join(err_tail[-3:])
    return {"ok": False, "error": f"worker rc={proc.returncode}: {tail}"}


def _measure(spec, deadline, errors, state):
    """Measure one spec with retries, respecting the global deadline.

    Returns the worker result dict or None. ``state['hangs']`` counts
    consecutive relay-hang kills — after 2 the relay is considered down and
    everything left is skipped (retrying a hung backend just burns the
    driver budget). Compile timeouts do NOT count: the chip is healthy, the
    graph is just big — they are retried once with a 1.5x budget when the
    deadline allows (the persistent cache cannot help a killed compile, but
    module-level XLA caching makes a longer second attempt worthwhile).
    """
    label = f"{spec['model']}/{spec['kind']}/b{spec['batch']}"
    budget = float(spec.get("attempt_s", 420.0))
    cap = os.environ.get("BENCH_ATTEMPT_CAP")
    if cap:
        budget = min(budget, float(cap))
    for attempt in range(3):
        remaining = deadline - time.time()
        if state["hangs"] >= 2:
            errors.append(f"{label}: skipped (relay appears down)")
            return None
        if remaining < min(60.0, budget + 10):
            errors.append(f"{label}: skipped (deadline)")
            return None
        res = _run_attempt(spec, min(budget, remaining - 10))
        if res.get("ok"):
            state["hangs"] = 0
            print(f"{label}: {res['ips']:.1f} img/s "
                  f"(compile {res.get('compile_s', '?')}s)", file=sys.stderr)
            return res
        err = res.get("error", "unknown")
        print(f"{label} attempt {attempt + 1} failed: {err}", file=sys.stderr)
        if res.get("compile_timeout"):
            if attempt < 1 and deadline - time.time() > budget * 1.5 + 30:
                budget *= 1.5
                continue
            errors.append(f"{label}: {err}")
            return None
        if res.get("hang"):
            state["hangs"] += 1
            errors.append(f"{label}: {err}")
            return None  # a hang is an outage, not a flake — don't re-hang
        if any(s in err for s in _TRANSIENT) and attempt < 2:
            time.sleep(min(_RETRY_SLEEP * (attempt + 1),
                           max(0, deadline - time.time())))
            continue
        errors.append(f"{label}: {err}")
        return None
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="UNext")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batches", type=int, nargs="*", default=[8, 1024, 512],
                    help="headline batch ladder, measured in this order: "
                         "first entry lands a nonzero headline fast, later "
                         "entries (after the BASELINE extras) improve it")
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
    ap.add_argument("--no-extras", action="store_true",
                    help="skip the BASELINE-config extras (ACC_UNet_Lite "
                         "inference, ACC-UNet train step, W-512, scan, "
                         "SpatialMambaBlock)")
    ap.add_argument("--total-timeout", type=float,
                    default=float(os.environ.get("BENCH_TOTAL_TIMEOUT", 1740)),
                    help="hard wall-clock cap for the whole run (s). The "
                         "driver's own kill is >=~28 min (BENCH_r02 tail "
                         "shows 25+ min of activity before its rc=124), and "
                         "a driver kill is harmless anyway: the running "
                         "JSON line emitted after every measurement is "
                         "captured from the output tail")
    ap.add_argument("--attempt-timeout", type=float,
                    default=float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", 420)),
                    help="default watchdog budget per measurement attempt (s);"
                         " compile-heavy specs carry larger per-spec budgets")
    ap.add_argument("--_worker", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._worker is not None:
        try:
            out = _worker_main(json.loads(args._worker))
        except Exception as e:  # noqa: BLE001 — report, parent decides
            out = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(out), flush=True)
        return

    deadline = time.time() + args.total_timeout
    errors: list[str] = []
    state = {"hangs": 0}

    s2d = args.s2d
    if s2d is None and args.model.startswith("ACC_UNet"):
        s2d = 2

    def spec(kind, model, batch, steps, s2d_lv=None, img=None, n_classes=1,
             cap_steps=True, attempt_s=None):
        return {"kind": kind, "model": model, "img": img or args.img,
                "batch": batch,
                "steps": max(steps, -(-1000 // batch)) if cap_steps else steps,
                "dtype": args.dtype, "s2d": s2d_lv,
                "n_classes": n_classes, "repeats": args.repeats,
                "attempt_s": attempt_s or args.attempt_timeout}

    # Big compiles measured on this host (ROOFLINE §19): the frame-MLFC train
    # graph and the 512^2 W graph can take >420s to compile COLD. Their specs
    # carry a 900s budget — cached reruns take ~30s, and the phase-aware
    # watchdog tells a long compile from a relay hang either way.
    big = max(args.attempt_timeout, 900)

    result = {
        "metric": (f"{args.model} {args.img}x{args.img} {args.dtype} "
                   f"inference throughput (batch 0)"),
        "value": 0.0,
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
    }
    extras: dict = {}
    compile_s: dict = {}
    best = {"ips": 0.0, "bs": 0}

    def emit():
        result["metric"] = (f"{args.model} {args.img}x{args.img} "
                            f"{args.dtype} inference throughput "
                            f"(batch {best['bs']})")
        result["value"] = round(best["ips"], 1)
        result["vs_baseline"] = round(best["ips"] / TARGET, 3)
        out = dict(result)
        if extras:
            out["extras"] = extras
        if compile_s:
            out["compile_s"] = compile_s
        if errors:
            out["error"] = "; ".join(errors)
        print(json.dumps(out), flush=True)
        return out

    def run_headline(bs, attempt_s):
        res = _measure(spec("infer", args.model, bs, args.steps, s2d,
                            attempt_s=attempt_s), deadline, errors, state)
        if res:
            if res.get("compile_s") is not None:
                compile_s[f"{args.model}_b{bs}"] = res["compile_s"]
            if res["ips"] > best["ips"]:
                best["ips"], best["bs"] = res["ips"], bs
            emit()

    def run_extra(name, sp):
        res = _measure(sp, deadline, errors, state)
        if res:
            extras[name] = round(
                res["ips"] / 1e6 if name.endswith("Mtok_s") else res["ips"], 1)
            if res.get("compile_s") is not None:
                compile_s[name] = res["compile_s"]
            emit()

    ladder = args.batches
    # 1) small-batch headline first: nonzero "value" within the first minute
    run_headline(ladder[0], args.attempt_timeout)
    if not args.no_extras:
        # BASELINE config 1: ACC_UNet_Lite 1x3x224x224 binary inference
        run_extra("ACC_UNet_Lite_infer_b8",
                  spec("infer", "ACC_UNet_Lite", 8, 64, 2, attempt_s=600))
    # 2) the full-size headline (big-batch graphs can compile slowly cold)
    for bs in ladder[1:2]:
        run_headline(bs, big)
    if not args.no_extras:
        # BASELINE config 5 first — both specs compile in ~1 min, so they
        # land even in a fully cold round (they starved on the deadline in
        # r4 and had never been driver-witnessed):
        # selective-scan Pallas chunked-scan block (SpatialMamba shape) —
        # millions of scanned tokens per second
        run_extra("selective_scan_Mtok_s",
                  spec("scan", "scan_block", 8, 32, cap_steps=False,
                       attempt_s=600))
        # config 5, end-to-end block reading: whole SpatialMambaBlock img/s
        run_extra("spatialmamba_block_img_s",
                  spec("ssmblock", "SpatialMambaBlock", 8, 32,
                       cap_steps=False, attempt_s=600))
        # BASELINE config 4: ACC_UNet_W multi-class at 512x512 (3+1-way
        # softmax head, the GlaS/Synapse-style config). Runs BEFORE the
        # train spec: the train graph's relay compile is memory-killed
        # server-side in degraded windows (ROOFLINE §22.1) and its retries
        # must not starve this compilable spec (the r4 lesson, same shape).
        run_extra("ACC_UNet_W_mc512_infer_b2",
                  spec("infer", "ACC_UNet_W", 2, 8, 2, img=512, n_classes=3,
                       cap_steps=False, attempt_s=big))
        # BASELINE config 2: full ACC-UNet (16.77M) train step, BCE+Dice, b8.
        # s2d=2: the frame is exact in training too (grad-parity test in
        # tests/test_s2d.py) and measured +20% (ROOFLINE §15.2). COLD fwd+bwd
        # compile of the frame-MLFC graph is 5-13 min (ROOFLINE §19).
        run_extra("ACC_UNet_train_b8",
                  spec("train", "ACC_UNet", 8, 16, 2, attempt_s=big))
    # 3) remaining headline ladder entries, best kept
    for bs in ladder[2:]:
        run_headline(bs, big)

    emit()


if __name__ == "__main__":
    main()
