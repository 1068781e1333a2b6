"""Bench device-watchdog behavior (CPU, subprocess).

The watchdog (`bench.py:_device_watchdog`) guards the round's one driver
measurement: it must (a) stay silent when the device answers AND one
trivial program completes, and (b) emit a single error-attributed JSON
line and exit 3 when neither gate clears — instead of hanging forever and
leaving no artifact (the round-4 failure shape; see VERDICT round 4 #1).
Runs in subprocesses because the failure leg calls ``os._exit``.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LOAD_BENCH = """
import importlib.util, os, time, sys
spec = importlib.util.spec_from_file_location("bench", os.path.join(%r, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
""" % (
    REPO,
)


def _run(code: str, env_extra: dict, timeout: float) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )


def test_watchdog_passes_when_device_and_program_answer():
    """Healthy backend: both gates clear, process runs to completion."""
    code = _LOAD_BENCH + (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "bench._device_watchdog()\n"
        "time.sleep(6)\n"  # outlive the 5 s budget: a false fire would exit 3
        "print('SURVIVED')\n"
    )
    r = _run(
        code,
        {"JAX_PLATFORMS": "cpu", "BENCH_DEVICE_TIMEOUT": "5"},
        timeout=120,
    )
    assert r.returncode == 0, (r.returncode, r.stdout, r.stderr)
    assert "SURVIVED" in r.stdout


def test_watchdog_fails_loudly_when_backend_never_answers():
    """Unreachable backend: one attributed JSON line on stdout, exit 3.

    An invalid platform makes ``jax.devices()`` raise inside the probe
    thread, so neither gate ever clears — the same observable state as a
    hung tunnel, without needing one.
    """
    code = _LOAD_BENCH + (
        "bench._device_watchdog()\n"
        "time.sleep(30)\n"  # watchdog must exit us long before this returns
        "print('SHOULD_NOT_REACH')\n"
    )
    r = _run(
        code,
        {"JAX_PLATFORMS": "no_such_platform", "BENCH_DEVICE_TIMEOUT": "2"},
        timeout=120,
    )
    assert r.returncode == 3, (r.returncode, r.stdout, r.stderr)
    assert "SHOULD_NOT_REACH" not in r.stdout
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    assert payload["error"] == "device_unreachable"
    assert payload["value"] == 0.0
    assert "did not complete" in payload["detail"]


def test_staging_deadline_fires_when_never_cancelled():
    """A crawling data channel: attributed JSON + exit 5, not a hang."""
    code = _LOAD_BENCH + (
        "bench._staging_deadline('float16')\n"  # cancel callable discarded
        "time.sleep(30)\n"
        "print('SHOULD_NOT_REACH')\n"
    )
    r = _run(code, {"BENCH_STAGING_TIMEOUT": "1"}, timeout=120)
    assert r.returncode == 5, (r.returncode, r.stdout, r.stderr)
    assert "SHOULD_NOT_REACH" not in r.stdout
    payload = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert payload["error"] == "staging_timeout"
    assert "float16" in payload["detail"]


def test_staging_deadline_cancel_and_disable():
    """Cancelled or disabled (<=0) deadlines never fire."""
    code = _LOAD_BENCH + (
        "bench._staging_deadline('float16')()\n"  # cancel immediately
        "bench.os.environ['BENCH_STAGING_TIMEOUT'] = '0'\n"
        "bench._staging_deadline('float16')\n"  # disabled: no thread at all
        "time.sleep(3)\n"
        "print('SURVIVED')\n"
    )
    r = _run(code, {"BENCH_STAGING_TIMEOUT": "1"}, timeout=120)
    assert r.returncode == 0, (r.returncode, r.stdout, r.stderr)
    assert "SURVIVED" in r.stdout
