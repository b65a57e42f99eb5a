"""Outage-proofing tests for the two driver artifacts.

Round-1/round-2 driver runs of ``__graft_entry__.dryrun_multichip`` and
``bench.py`` timed out (rc=124) because the serving relay in front of the TPU
was down and backend init BLOCKS forever rather than raising (a try/except
can't catch a hang). These tests simulate a blocking backend and assert both
entries return in bounded time with a usable result.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(extra_args, env_extra, timeout=120):
    env = dict(os.environ)
    # the parent process must never touch a jax backend itself — but clear
    # any CPU forcing anyway so a regression would hang the hung-worker test
    env.pop("JAX_PLATFORMS", None)
    env.update(env_extra)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, BENCH, *extra_args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    elapsed = time.time() - t0
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no stdout; stderr tail: {proc.stderr[-500:]}"
    return json.loads(lines[-1]), elapsed, proc


@pytest.mark.quick
def test_bench_survives_hung_backend():
    """Worker hangs with NO output (simulated relay outage) -> the stall
    watchdog kills it, the final JSON line is still printed, value 0 + error
    field, in bounded time."""
    result, elapsed, _ = _run_bench(
        ["--batches", "32", "--attempt-timeout", "3", "--total-timeout", "30"],
        # BENCH_ATTEMPT_CAP bounds even the compile-heavy specs' 600-900s
        # budgets so the test finishes fast
        {"_BENCH_TEST_HANG": "1", "BENCH_ATTEMPT_CAP": "3"},
    )
    assert elapsed < 60
    assert result["value"] == 0
    assert result["unit"] == "images/sec/chip"
    assert "error" in result and "timeout" in result["error"]
    # two hangs mark the relay down; the rest must be skipped, not re-hung
    assert "skipped" in result["error"]


@pytest.mark.quick
def test_bench_headline_survives_big_batch_compile_timeout():
    """VERDICT r4 #1: the b1024 graph compiling past its budget must NOT
    zero the headline (BENCH_r04 failure mode). The b8 rung lands first; a
    compile-phase timeout is classified from the worker's heartbeat (not an
    outage), so later rungs still run and the best nonzero number ships."""
    fake_map = json.dumps({
        "UNext/infer/b8": {"ok": True, "ips": 100.0, "batch": 8,
                           "compile_s": 1.0},
        "UNext/infer/b512": {"ok": True, "ips": 200.0, "batch": 512,
                             "compile_s": 2.0},
        # b1024 simulates a healthy chip stuck compiling (heartbeats flow)
        "default": {"behavior": "compile_hang"},
    })
    result, elapsed, proc = _run_bench(
        ["--batches", "8", "1024", "512", "--no-extras",
         "--total-timeout", "120"],
        {"_BENCH_TEST_FAKE_MAP": fake_map, "BENCH_ATTEMPT_CAP": "3",
         "BENCH_HB_INTERVAL": "0.5"},
        timeout=180,
    )
    assert elapsed < 120
    # best rung wins; the compile timeout neither zeroes nor aborts the run
    assert result["value"] == 200.0
    assert "batch 512" in result["metric"]
    assert "compile exceeded" in result["error"]
    assert "relay appears down" not in result["error"]
    assert result["compile_s"] == {"UNext_b8": 1.0, "UNext_b512": 2.0}
    # a running JSON line was emitted after the first success, so even a
    # driver-side kill after rung 1 would have captured a nonzero headline
    lines = [json.loads(ln) for ln in proc.stdout.strip().splitlines()]
    assert lines[0]["value"] == 100.0


@pytest.mark.quick
def test_bench_reports_headline_and_extras():
    # ips large enough that the scan extra's /1e6 conversion survives the
    # round(-, 1) — a sub-1e5 stub would assert 0.0 and could not tell a
    # real conversion from a broken/zero rate (advisor r3)
    fake = json.dumps({"ok": True, "ips": 12345600.0, "batch": 32})
    result, _, _ = _run_bench(
        ["--batches", "32", "--attempt-timeout", "30"],
        {"_BENCH_TEST_FAKE": fake},
    )
    assert result["value"] == 12345600.0
    assert result["vs_baseline"] == pytest.approx(2469.12, abs=1e-2)
    assert result["extras"] == {
        "ACC_UNet_Lite_infer_b8": 12345600.0,
        "ACC_UNet_train_b8": 12345600.0,
        "ACC_UNet_W_mc512_infer_b2": 12345600.0,
        # the scan extra reports millions of tokens/sec (ips / 1e6)
        "selective_scan_Mtok_s": 12.3,
        "spatialmamba_block_img_s": 12345600.0,
    }
    assert "error" not in result


@pytest.mark.quick
def test_bench_retries_transient_then_reports_error():
    fake = json.dumps({"ok": False, "error": "XlaRuntimeError: UNAVAILABLE"})
    result, _, proc = _run_bench(
        ["--batches", "32", "--no-extras", "--attempt-timeout", "30",
         "--total-timeout", "120"],
        {"_BENCH_TEST_FAKE": fake, "BENCH_RETRY_SLEEP": "0.1"},
    )
    assert result["value"] == 0
    assert "UNAVAILABLE" in result["error"]
    assert "attempt 3 failed" in proc.stderr  # transient errors are retried


@pytest.mark.quick
def test_dryrun_multichip_never_probes_ambient_backend(monkeypatch):
    """The parent-side dryrun must go straight to the forced-CPU subprocess:
    no jax.devices() call (it hangs during relay outages), CPU platform and
    virtual device count forced in the child env, hard timeout set."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    def poisoned_devices(*a, **k):
        raise AssertionError("dryrun_multichip touched the ambient backend")

    monkeypatch.setattr(ge.jax, "devices", poisoned_devices)
    monkeypatch.delenv("_GRAFT_FORCED_CPU_MESH", raising=False)

    captured = {}

    def fake_run(cmd, env=None, cwd=None, timeout=None):
        captured.update(cmd=cmd, env=env, timeout=timeout)

        class R:
            returncode = 0

        return R()

    import subprocess as sp

    monkeypatch.setattr(sp, "run", fake_run)
    ge.dryrun_multichip(8)

    assert captured, "no subprocess was launched"
    assert captured["env"]["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in captured["env"]["XLA_FLAGS"]
    assert captured["env"]["_GRAFT_FORCED_CPU_MESH"] == "1"
    assert captured["timeout"] and captured["timeout"] <= 3600


def test_dryrun_multichip_executes_on_virtual_mesh():
    """Full execution of the driver's multichip dryrun (forced-CPU child).

    Not in the quick tier: the XLA:CPU compile of the dp x tp train step takes
    a couple of minutes on this 1-core host.
    """
    env = dict(os.environ)
    env.pop("_GRAFT_FORCED_CPU_MESH", None)
    code = "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
