"""Tunnel-outage robustness of the driver-graded artifacts (round-3 lesson).

Round 3 lost BOTH driver artifacts to the axon tunnel: BENCH_r03 rc=1
(jax.devices() crashed on a transient UNAVAILABLE at t=0) and MULTICHIP_r03
rc=124 (parent-process backend init hung on the stalled tunnel). These tests
simulate the outage (``_KUROSIWO_FAKE_OUTAGE`` makes the first N probe
children exit 17) and a poisoned default backend (``JAX_PLATFORMS`` set to a
nonexistent platform, so any parent-process backend init raises instead of
hanging) to prove:

  * bench.py retries the probe through a transient outage and still benches;
  * bench.py's terminal failure is ONE parseable JSON line, rc=0 — never a
    bare traceback (the driver's parse must not come back null);
  * dryrun_multichip's parent NEVER initializes the default backend — the
    child re-exec is decided purely from the env var;
  * the dryrun child subprocess is bounded by a timeout.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (repo-root module)


@pytest.fixture(autouse=True)
def _reset_emit_latch():
    bench._RESULT_PRINTED.clear()
    yield
    bench._RESULT_PRINTED.clear()


def test_probe_retries_through_transient_outage(monkeypatch):
    # first 2 probe attempts fail (simulated outage); attempt 3 reaches the
    # real trivial-op probe on the CPU backend and succeeds. The axon
    # sitecustomize must not run in the probe children (register() at
    # interpreter start would touch the possibly-stalled tunnel even though
    # this test probes the CPU backend).
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("_KUROSIWO_FAKE_OUTAGE", "2")
    monkeypatch.setenv("KUROSIWO_BENCH_RETRY_DELAY", "0.1")
    monkeypatch.setenv("KUROSIWO_BENCH_MAX_WAIT", "300")
    bench.wait_for_backend()  # raises on failure


def test_probe_final_failure_raises_with_summary(monkeypatch):
    monkeypatch.setenv("_KUROSIWO_FAKE_OUTAGE", "999999")
    monkeypatch.setenv("KUROSIWO_BENCH_RETRY_DELAY", "0.05")
    monkeypatch.setenv("KUROSIWO_BENCH_MAX_WAIT", "0.5")
    with pytest.raises(RuntimeError, match="backend unavailable"):
        bench.wait_for_backend()


def test_emit_prints_exactly_once(capsys):
    bench.emit({"value": 1})
    bench.emit({"value": 2})
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ['{"value": 1}']


def test_bench_emits_json_error_line_on_sustained_outage():
    """End-to-end driver-style invocation under a sustained outage: rc=0 and
    stdout is exactly one parseable JSON line with value 0 + an error field."""
    env = dict(os.environ)
    env.update(
        _KUROSIWO_FAKE_OUTAGE="999999",
        KUROSIWO_BENCH_RETRY_DELAY="0.05",
        KUROSIWO_BENCH_MAX_WAIT="1",
        KUROSIWO_BENCH_DEADLINE="60",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py", "--steps", "1", "--warmup", "0"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    payload = json.loads(lines[0])
    assert payload["value"] == 0.0
    assert "error" in payload and "unavailable" in payload["error"]
    assert payload["unit"] == "patches/sec/chip"


def test_dryrun_parent_never_initializes_default_backend():
    """Round-3 regression: with the default backend poisoned (a nonexistent
    platform — the raising stand-in for a hung axon tunnel), the parent must
    still hand off to the CPU child and the dry run must pass."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "nonexistent_tpu_tunnel"
    env.pop("_KUROSIWO_DRYRUN_CHILD", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the spawned parent's startup tunnel-free
    code = "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_OK')"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (proc.stdout[-500:], proc.stderr[-1000:])
    assert "DRYRUN_OK" in proc.stdout


def test_dryrun_child_subprocess_is_time_bounded():
    env = dict(os.environ)
    env["KUROSIWO_DRYRUN_TIMEOUT"] = "0.5"  # child can't finish in 0.5s
    env.pop("_KUROSIWO_DRYRUN_CHILD", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the spawned parent's startup tunnel-free
    code = (
        "import __graft_entry__ as g\n"
        "try:\n"
        "    g.dryrun_multichip(8)\n"
        "except RuntimeError as e:\n"
        "    assert 'exceeded' in str(e), e\n"
        "    print('TIMEOUT_BOUNDED')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-1000:]
    assert "TIMEOUT_BOUNDED" in proc.stdout


def test_error_line_carries_the_actual_leg_label():
    """A failed non-default leg must NOT emit a row labeled as the unet
    train headline (it would overwrite the real graded number downstream)."""
    env = dict(os.environ)
    env.update(
        _KUROSIWO_FAKE_OUTAGE="999999",
        KUROSIWO_BENCH_RETRY_DELAY="0.05",
        KUROSIWO_BENCH_MAX_WAIT="1",
        KUROSIWO_BENCH_DEADLINE="60",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py", "--model", "changeformer", "--eval",
         "--steps", "1", "--warmup", "0"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    assert "changeformer" in payload["metric"] and "eval" in payload["metric"]
    assert "unet" not in payload["metric"]
    assert payload["value"] == 0.0 and "error" in payload
