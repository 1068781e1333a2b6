"""Test configuration: CPU platform with a virtual 8-device mesh.

Environment variables must be set before jax initializes, so this module
touches os.environ at import time (conftest imports precede test modules).
Multi-chip sharding logic is validated on the virtual CPU mesh; real-TPU
performance is exercised by bench.py, not the test suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the environment's sitecustomize may pin an accelerator platform at
# interpreter startup; force the virtual CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")

from pathlib import Path

import numpy as np
import pytest

REFERENCE_DATA = Path("/root/reference/tests/data")
REPO_ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def cln_pdb_path() -> str:
    """Path to the CLN025 topology PDB (read from the mounted reference data)."""
    p = REFERENCE_DATA / "cln025.pdb"
    if not p.exists():
        pytest.skip("cln025.pdb fixture not available")
    return str(p)


@pytest.fixture(scope="session")
def waterdimer():
    """Upstream water-dimer trajectory data (coords, forces)."""
    p = REFERENCE_DATA / "waterdimer.npz"
    if not p.exists():
        pytest.skip("waterdimer.npz fixture not available")
    data = np.load(p)
    return {"coords": data["coords"], "forces": data["Fs"]}


@pytest.fixture(scope="session")
def cln_fixture(cln_pdb_path):
    """Synthetic CLN025-style trajectory (2000 frames) with exact constraints."""
    from aggforce_tpu.utils.synth import synthesize_protein_fixture

    return synthesize_protein_fixture(cln_pdb_path, n_frames=2000, seed=1234)


@pytest.fixture(scope="module")
def cln_fixture_module(cln_pdb_path):
    """Module-scoped alias of the synthetic CLN fixture (for heavy modules)."""
    from aggforce_tpu.utils.synth import synthesize_protein_fixture

    return synthesize_protein_fixture(cln_pdb_path, n_frames=2000, seed=1234)


@pytest.fixture(scope="module")
def cln_ca_map_module(cln_pdb_path):
    """Module-scoped CA map."""
    from aggforce_tpu import LinearMap
    from aggforce_tpu.utils.pdblite import ca_map_from_pdb, n_atoms

    inds = ca_map_from_pdb(cln_pdb_path)
    return LinearMap(inds, n_fg_sites=n_atoms(cln_pdb_path))


@pytest.fixture(scope="session")
def cln_ca_map(cln_pdb_path):
    """Carbon-alpha configurational LinearMap for CLN025."""
    from aggforce_tpu import LinearMap
    from aggforce_tpu.utils.pdblite import ca_map_from_pdb, n_atoms

    inds = ca_map_from_pdb(cln_pdb_path)
    return LinearMap(inds, n_fg_sites=n_atoms(cln_pdb_path))
