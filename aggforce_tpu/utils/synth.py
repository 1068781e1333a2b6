"""Synthetic molecular-trajectory fixtures.

The reference test-suite depends on a 10k-frame CLN025 trajectory npz that is
absent from the snapshot (reference .MISSING_LARGE_BLOBS:1). This module
synthesizes physically structured stand-ins with the properties the tests and
benchmarks exercise:

  * exact holonomic pair constraints (constrained groups move rigidly, so
    their pairwise distances are constant and ``guess_pairwise_constraints``
    recovers them);
  * large zero-sum intra-group forces (the physics that makes optimal force
    maps aggregate constrained partners);
  * a coordinate-dependent force component (harmonic tether) so featurized /
    configuration-dependent maps have recoverable signal;
  * per-atom thermal noise.
"""

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..constraints.tools import reduce_constraint_sets
from .pdblite import guess_h_bond_groups, pdb_coordinates


def synthesize_trajectory(
    base_coords: np.ndarray,
    constraint_groups: List[frozenset],
    n_frames: int,
    seed: int = 0,
    motion_scale: float = 0.02,
    internal_force_scale: float = 60.0,
    kbt: float = 0.6955215,
    noise_force_scale: float = 1.5,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Build (coords, forces) with exact group constraints and Boltzmann forces.

    The ensemble is exactly Boltzmann-consistent at temperature ``kbt`` for a
    harmonic tether potential: displacements are Gaussian with std
    ``motion_scale`` and the conservative force is -(kbt/motion_scale^2) *
    displacement, so statistical identities that rely on the equilibrium
    density (e.g. the divergence correction of featurized maps, MSCG
    projections) hold on this data. Constraint groups translate rigidly (one
    shared displacement; tether force split evenly across members), keeping
    intra-group distances exactly constant. The additional zero-sum
    intra-group forces model constraint (Lagrange-multiplier) forces, which
    do not alter the configurational ensemble; the small per-atom noise force
    is mean-zero and configuration-independent.

    Arguments:
    ---------
    base_coords:
        (n_sites, 3) reference geometry (e.g. from a PDB).
    constraint_groups:
        Disjoint site groups that move rigidly.
    n_frames:
        Number of frames to generate.
    seed:
        RNG seed (fully deterministic output).
    motion_scale:
        Std-dev (nm) of per-frame displacements.
    internal_force_scale:
        Std-dev of the zero-sum intra-group (constraint) force component;
        dominating this makes constraint-aware aggregation strongly optimal.
    kbt:
        Temperature (in force*length units) of the synthetic ensemble; sets
        the tether stiffness kbt/motion_scale^2.
    noise_force_scale:
        Std-dev of independent per-atom force noise.

    Returns:
    -------
    coords, forces arrays of shape (n_frames, n_sites, 3).
    """
    rng = np.random.default_rng(seed)
    n_sites = base_coords.shape[0]
    groups = [sorted(g) for g in reduce_constraint_sets(set(constraint_groups))]
    grouped = set()
    for g in groups:
        grouped.update(g)
    loose = sorted(set(range(n_sites)) - grouped)

    k_spring = kbt / motion_scale**2
    disp = np.zeros((n_frames, n_sites, 3))
    tether = np.zeros((n_frames, n_sites, 3))
    # rigid per-group translation: the group's collective coordinate is
    # harmonic, and its restoring force is shared evenly by the members
    for g in groups:
        t_g = rng.normal(scale=motion_scale, size=(n_frames, 1, 3))
        disp[:, g, :] = t_g
        tether[:, g, :] = -(k_spring / len(g)) * t_g
    loose_disp = rng.normal(scale=motion_scale, size=(n_frames, len(loose), 3))
    disp[:, loose, :] = loose_disp
    tether[:, loose, :] = -k_spring * loose_disp

    coords = base_coords[None, :, :] + disp

    forces = tether + rng.normal(
        scale=noise_force_scale, size=(n_frames, n_sites, 3)
    )
    for g in groups:
        internal = rng.normal(
            scale=internal_force_scale, size=(n_frames, len(g), 3)
        )
        internal -= internal.mean(axis=1, keepdims=True)  # zero-sum per group
        forces[:, g, :] += internal
    return coords.astype(dtype), forces.astype(dtype)


def synthesize_protein_fixture(
    pdb_path: str,
    n_frames: int,
    seed: int = 0,
    **kwargs,
) -> Dict[str, np.ndarray]:
    """CLN025-style fixture from a PDB: coords, forces, kbt, constraints."""
    base = pdb_coordinates(pdb_path)
    groups = guess_h_bond_groups(pdb_path)
    coords, forces = synthesize_trajectory(
        base, groups, n_frames=n_frames, seed=seed, **kwargs
    )
    return {
        "coords": coords,
        "forces": forces,
        "kbt": np.float64(0.6955215),  # 350 K in kcal/mol, reference convention
        "constraint_groups": groups,
    }


def synthesize_dimer_fixture(
    n_frames: int = 500, seed: int = 7
) -> Dict[str, np.ndarray]:
    """Flexible two-molecule fixture (no constraints).

    Intramolecular forces are large and zero-sum per molecule, so the optimal
    force map for an oxygen-slice coordinate map aggregates whole molecules —
    the same qualitative structure as the reference's water-dimer fixture.
    """
    rng = np.random.default_rng(seed)
    base = np.array(
        [
            [0.0, 0.0, 0.0],
            [0.096, 0.0, 0.0],
            [-0.024, 0.093, 0.0],
            [0.30, 0.0, 0.0],
            [0.396, 0.0, 0.0],
            [0.276, 0.093, 0.0],
        ]
    )
    coords = base[None] + rng.normal(scale=0.01, size=(n_frames, 6, 3))
    forces = rng.normal(scale=0.5, size=(n_frames, 6, 3))
    for mol in ([0, 1, 2], [3, 4, 5]):
        internal = rng.normal(scale=80.0, size=(n_frames, 3, 3))
        internal -= internal.mean(axis=1, keepdims=True)
        forces[:, mol, :] += internal
    return {
        "coords": coords.astype(np.float32),
        "forces": forces.astype(np.float32),
    }


def reference_waterdimer(path: str = "/root/reference/tests/data/waterdimer.npz") -> Optional[Dict[str, np.ndarray]]:
    """Load the upstream water-dimer data fixture if mounted (else None)."""
    import os

    if not os.path.exists(path):
        return None
    data = np.load(path)
    return {"coords": data["coords"], "forces": data["Fs"]}
