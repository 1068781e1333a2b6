"""One-shot health probe for the remote-device tunnel's two channels.

The tunnel degrades in (at least) three distinct modes, each of which has
burned a measurement session (CLAUDE.md "Environment gotchas"):

  1. fully down — ``jax.devices()`` itself hangs;
  2. program channel degraded — device listing answers instantly while
     every compile/program RPC hangs for minutes (observed 15+ min,
     2026-08-20);
  3. data channel degraded — programs run fine but host<->device
     transfers crawl at <1 MB/s vs ~100 MB/s healthy, independently of
     mode 2.

Run this BEFORE believing any timing (or before starting a long repop /
capture): it prints ONE JSON line attributing each channel, with every
step bounded so the probe itself cannot hang. A program result is forced
to a host value — ``block_until_ready`` alone can return before remote
execution finishes.

Usage::

    python tools/tunnel_probe.py            # 120 s budget per step
    python tools/tunnel_probe.py 300        # custom budget (seconds)

Exit code: 0 = both channels healthy, 2 = devices unreachable,
3 = program channel degraded/hung, 4 = data channel degraded (<5 MB/s).

No reference counterpart (the reference targets local CPU; see
/root/reference/README.md) — this is remote-accelerator operations
tooling.
"""

import json
import os
import subprocess
import sys
import time

BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
DATA_MB = 4.0  # small enough to finish inside the budget on a ~1 MB/s wire


def _step(code: str) -> tuple:
    """Run a probe snippet in a bounded subprocess; (seconds, stdout|None).

    Subprocess, not in-process: a hung RPC inside jax cannot be cancelled
    from Python, so an in-process probe would wedge the prober itself.

    Honors an explicit ``JAX_PLATFORMS`` env var: the environment's
    sitecustomize pins the accelerator platform unless the config is ALSO
    updated after import (CLAUDE.md gotcha), so each snippet re-applies it.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        code = (
            "import jax; jax.config.update('jax_platforms', %r)\n" % plat
        ) + code
    t0 = time.perf_counter()
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=BUDGET,
            env=dict(os.environ),
        )
    except subprocess.TimeoutExpired:
        return time.perf_counter() - t0, None
    dt = time.perf_counter() - t0
    return dt, (out.stdout.strip() if out.returncode == 0 else None)


def main() -> int:
    report = {"budget_s": BUDGET}

    dt, out = _step("import jax; print(len(jax.devices()))")
    report["devices_s"] = round(dt, 2)
    if out is None:
        report.update(healthy=False, mode="devices_unreachable")
        print(json.dumps(report))
        return 2

    dt, out = _step(
        "import jax, jax.numpy as jnp;"
        "print(float(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128)))))"
    )
    report["program_s"] = round(dt, 2)
    if out is None:
        report.update(healthy=False, mode="program_channel_degraded")
        print(json.dumps(report))
        return 3

    n = int(DATA_MB * 1e6 / 4)
    dt, out = _step(
        "import time, numpy as np, jax;"
        f"x = np.ones(({n},), np.float32);"
        "t0 = time.time();"
        "d = jax.device_put(x);"
        "v = float(jax.numpy.sum(d));"  # forced value: full round trip
        "print(time.time() - t0)"
    )
    if out is None:
        report.update(
            data_mbps=0.0, healthy=False, mode="data_channel_degraded"
        )
        print(json.dumps(report))
        return 4
    transfer_s = float(out)
    mbps = DATA_MB / max(transfer_s, 1e-9)
    report["data_mbps"] = round(mbps, 2)
    if mbps < 5.0:  # healthy is ~100; <5 makes 10k-frame staging minutes
        report.update(healthy=False, mode="data_channel_degraded")
        print(json.dumps(report))
        return 4
    report.update(healthy=True, mode="healthy")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
