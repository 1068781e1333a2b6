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

    # vectorized construction: label every site with a "unit" index (its
    # group, or itself if loose), draw one displacement per unit per frame,
    # and gather — no per-group python loop over the frame arrays.
    n_units = len(groups) + len(loose)
    unit_of_site = np.empty(n_sites, dtype=np.int64)
    inv_size = np.empty(n_sites, dtype=dtype)
    constrained_mask = np.zeros(n_sites, dtype=bool)
    for u, g in enumerate(groups):
        unit_of_site[g] = u
        inv_size[g] = 1.0 / len(g)
        constrained_mask[g] = True
    for u, site in enumerate(loose, start=len(groups)):
        unit_of_site[site] = u
        inv_size[site] = 1.0

    k_spring = dtype(kbt / motion_scale**2)
    unit_disp = motion_scale * rng.standard_normal(
        (n_frames, n_units, 3), dtype=dtype
    )
    disp = unit_disp[:, unit_of_site, :]
    tether = (-k_spring * inv_size[None, :, None]) * disp

    coords = base_coords[None, :, :].astype(dtype) + disp

    forces = tether + noise_force_scale * rng.standard_normal(
        (n_frames, n_sites, 3), dtype=dtype
    )
    # zero-sum intra-group (constraint) forces: draw per-site noise, subtract
    # the group mean via the unit gather
    raw = internal_force_scale * rng.standard_normal(
        (n_frames, n_sites, 3), dtype=dtype
    )
    raw[:, ~constrained_mask, :] = 0.0
    # group sums via contiguous-run reduction: sites sorted by unit form
    # contiguous segments, so reduceat computes all sums vectorized
    order = np.argsort(unit_of_site, kind="stable")
    seg_starts = np.searchsorted(unit_of_site[order], np.arange(n_units))
    group_sum = np.add.reduceat(raw[:, order, :], seg_starts, axis=1)
    forces += raw - group_sum[:, unit_of_site, :] * inv_size[None, :, None]
    return coords, forces


def synthesize_trajectory_device(
    base_coords: np.ndarray,
    constraint_groups: List[frozenset],
    n_frames: int,
    seed: int = 0,
    motion_scale: float = 0.02,
    internal_force_scale: float = 60.0,
    kbt: float = 0.6955215,
    noise_force_scale: float = 1.5,
):
    """Device-resident twin of :func:`synthesize_trajectory` (jax arrays).

    Same construction (exact rigid groups, Boltzmann tether, zero-sum
    constraint forces) with jax PRNG and on-device gathers/GEMMs — built for
    the 100k-frame sweep where single-core host generation is the
    bottleneck. RNG stream differs from the numpy twin.
    """
    import jax
    import jax.numpy as jnp

    n_sites = base_coords.shape[0]
    groups = [sorted(g) for g in reduce_constraint_sets(set(constraint_groups))]
    grouped = set()
    for g in groups:
        grouped.update(g)
    loose = sorted(set(range(n_sites)) - grouped)
    n_units = len(groups) + len(loose)
    unit_of_site = np.empty(n_sites, dtype=np.int32)
    inv_size = np.empty(n_sites, dtype=np.float32)
    constrained = np.zeros(n_sites, dtype=np.float32)
    for u, g in enumerate(groups):
        unit_of_site[g] = u
        inv_size[g] = 1.0 / len(g)
        constrained[g] = 1.0
    for u, site in enumerate(loose, start=len(groups)):
        unit_of_site[site] = u
        inv_size[site] = 1.0

    # build in frame blocks under lax.map so transient buffers stay ~1 GB
    # while only the two (T, N, 3) outputs are fully resident; prefer a
    # block count that divides n_frames exactly (a trailing slice of the
    # stacked output would copy the whole multi-GB array)
    n_blocks = -(-n_frames // 8192)
    while n_blocks <= 64 and n_frames % n_blocks != 0:
        n_blocks += 1
    if n_frames % n_blocks != 0:
        n_blocks = -(-n_frames // 8192)
    block = -(-n_frames // n_blocks)
    t_pad = n_blocks * block

    @jax.jit
    def build(key):
        uos = jnp.asarray(unit_of_site)
        inv = jnp.asarray(inv_size)
        onehot = jax.nn.one_hot(uos, n_units, dtype=jnp.float32)
        cmask = jnp.asarray(constrained)
        base = jnp.asarray(base_coords, jnp.float32)
        k_spring = kbt / motion_scale**2

        def one_block(bkey):
            k1, k2, k3 = jax.random.split(bkey, 3)
            unit_disp = motion_scale * jax.random.normal(
                k1, (block, n_units, 3), dtype=jnp.float32
            )
            disp = jnp.take(unit_disp, uos, axis=1)
            tether = (-k_spring * inv[None, :, None]) * disp
            coords = base[None] + disp
            raw = (
                internal_force_scale
                * jax.random.normal(k2, (block, n_sites, 3), dtype=jnp.float32)
                * cmask[None, :, None]
            )
            gsum = jnp.einsum("tja,ju->tua", raw, onehot, precision="highest")
            internal = raw - jnp.take(gsum, uos, axis=1) * inv[None, :, None]
            forces = (
                tether
                + internal
                + noise_force_scale
                * jax.random.normal(k3, (block, n_sites, 3), dtype=jnp.float32)
            )
            return coords, forces

        keys = jax.random.split(key, n_blocks)
        coords_b, forces_b = jax.lax.map(one_block, keys)
        shape = (t_pad, n_sites, 3)
        coords_full = coords_b.reshape(shape)
        forces_full = forces_b.reshape(shape)
        if t_pad != n_frames:
            coords_full = coords_full[:n_frames]
            forces_full = forces_full[:n_frames]
        return coords_full, forces_full

    return build(jax.random.PRNGKey(seed))


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
