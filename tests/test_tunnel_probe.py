"""tools/tunnel_probe.py healthy path (CPU, subprocess)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_probe_healthy_on_cpu():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tunnel_probe.py"), "60"],
        capture_output=True,
        text=True,
        timeout=200,
        env=env,
    )
    assert r.returncode == 0, (r.returncode, r.stdout, r.stderr)
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["healthy"] is True
    assert payload["mode"] == "healthy"
    assert payload["data_mbps"] > 5.0
