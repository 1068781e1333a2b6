"""Smoke tests for the example scripts (tiny sizes)."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
needs_pdb = pytest.mark.skipif(
    not Path("/root/reference/tests/data/cln025.pdb").exists(),
    reason="cln025.pdb unavailable",
)


def _run(script: str, *args: str) -> subprocess.CompletedProcess:
    import os

    # prepend the repo root so the examples import aggforce_tpu even when
    # the package is not installed into the interpreter environment
    pypath = os.pathsep.join(
        p for p in (str(REPO), os.environ.get("PYTHONPATH")) if p
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=pypath)
    return subprocess.run(
        [sys.executable, str(REPO / "examples" / script), *args],
        capture_output=True,
        text=True,
        timeout=560,
        env=env,
        cwd=str(REPO),
    )


@pytest.mark.slow
@needs_pdb
def test_gauss_example():
    proc = _run("gauss.py", "--frames", "80")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "in-sample force residuals" in proc.stdout
    assert "staged save/load OK" in proc.stdout


@pytest.mark.slow
@needs_pdb
def test_cv_feat_example():
    proc = _run("cv_feat.py", "--frames", "90", "--folds", "2", "--quick")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "best point" in proc.stdout
    assert "static-map control" in proc.stdout
    assert "full-data refit residual" in proc.stdout


@pytest.mark.slow
@needs_pdb
def test_production_fit_example():
    proc = _run("production_fit.py", "--frames", "100")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "production fit demo OK" in proc.stdout
    assert "serialized map round-trips" in proc.stdout


@pytest.mark.slow
def test_sharded_example():
    proc = _run("sharded.py", "--frames", "300", "--atoms", "30")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "sharded demo OK" in proc.stdout
    assert "mesh: OrderedDict({'frames': 8})" in proc.stdout


@pytest.mark.slow
def test_multihost_sweep_demo():
    proc = _run("multihost_sweep.py", "--demo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "multihost sweep demo OK" in proc.stdout


@pytest.mark.slow
def test_bootstrap_example():
    proc = _run("bootstrap.py", "--n-maps", "4", "--window", "2")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "coefficient spread" in proc.stdout
    assert "mean squared mapped force" in proc.stdout
