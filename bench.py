"""Benchmark: featurized QP force-map fit (the BASELINE.json north-star config).

Default mode (config #3 of BASELINE.md): CLN025-scale system (175 atoms),
10k frames, id_feat + 7-basis gb_feat featurization, l2_regularization=1e3 —
fit end to end on the available accelerator via the fused device-resident
path. The JSON line carries extra diagnostic fields: ``first_fit_s`` (fresh
process end-to-end incl. compile/cache-load — the <10 s north-star),
``mfu`` and ``tflops`` (useful-work Gram FLOPs over the steady fit time vs
the chip's bf16 MXU peak).

``BENCH_MODE`` selects the other BASELINE configs:
  static   config #1 — CLN025 static optimal linear map (uni + optimized)
  gauss    config #2 — Gaussian noised maps (joptgauss + staged), device-resident
  cv       config #4 — featurized grid CV (folds x l2 in single dispatches)
  sweep    config #5 — 100k-frame, thousands-of-atoms linear-map sweep
  all      every config in sequence (one JSON line each; featurized last)

Each mode prints ONE JSON line:
  metric       config-specific throughput
  value        frames/sec/chip (fit wall-clock, steady-state)
  vs_baseline  value / 125 — the north-star target is the 10k-frame fit in
               <10 s on a v5e-8 slice, i.e. 125 frames/sec/chip; >1 beats it.

Diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

# process-relative clock for the end-to-end (import -> first fit) metric;
# only meaningful when the featurized config is the sole workload of the
# process (BENCH_MODE=all runs four configs first, so main() clears this)
_T0 = time.perf_counter()
_E2E_VALID = True


def log(*args):
    print(*args, file=sys.stderr, flush=True)


# cumulative wall seconds inside the compile/persistent-cache RPCs
# (compile_or_get_cached covers both a miss's remote compile and a hit's
# executable upload to the remote compile service). Lets the emitted JSON
# attribute warm-up time to the remote channel vs host-side work.
_RPC_S = [0.0]


def _meter_compile_rpcs() -> None:
    # private-API patch: degrade to unmetered timing (prep_rpc_s stays 0)
    # rather than crash the bench when a jax upgrade moves the symbol
    try:
        import jax._src.compiler as comp

        orig = comp.compile_or_get_cached
    except (ImportError, AttributeError) as e:
        log(f"compile-RPC metering unavailable ({e!r}); timings unmetered")
        return

    def traced(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        _RPC_S[0] += time.perf_counter() - t0
        return out

    comp.compile_or_get_cached = traced


# persistent-cache keys that MISSED (compiled instead of loading) this
# process; BENCH_CACHE_AUDIT=1 turns any miss into a loud failure
_CACHE_MISSES: list = []
# whether the get_executable_and_time hook installed / ever fired — the
# audit must not report green when it never watched anything (private-API
# drift or a disabled persistent cache would otherwise pass vacuously)
_CACHE_TRACE_INSTALLED = False
_CACHE_TRACE_OBSERVED = False


def _trace_cache_accesses() -> None:
    """AGGFORCE_TRACE_CACHE=<path>: append every persistent-cache key this
    process touches (hit or miss) to <path>, one `key hit|miss` per line.

    Lets `tools/prune_cache.py` prune `.jax_cache` to the union of keys the
    bench modes actually load — stale generations otherwise accumulate
    every time a jitted program's code changes (each is multi-MB).

    BENCH_CACHE_AUDIT=1 additionally records misses for the audit gate in
    ``main()``: the committed `.jax_cache` is supposed to cover every
    headline program, and Mosaic cache keys embed call-site tracebacks, so
    a line shift in the pallas trace stack silently invalidates entries —
    the audit catches that at commit time instead of on measurement day.
    """
    path = os.environ.get("AGGFORCE_TRACE_CACHE")
    audit = os.environ.get("BENCH_CACHE_AUDIT", "0") == "1"
    if not path and not audit:
        return
    # private-API patch: degrade to untraced/unaudited rather than crash —
    # but RECORD the degradation so the audit gate fails instead of
    # certifying a run it never observed
    try:
        import jax._src.compilation_cache as cc

        orig = cc.get_executable_and_time
    except (ImportError, AttributeError) as e:
        log(f"cache tracing unavailable ({e!r}); continuing untraced")
        return

    def traced(cache_key, *a, **k):
        global _CACHE_TRACE_OBSERVED
        _CACHE_TRACE_OBSERVED = True
        out = orig(cache_key, *a, **k)
        hit = out[0] is not None
        if not hit:
            _CACHE_MISSES.append(cache_key)
        if path:
            with open(path, "a") as fh:
                fh.write(f"{cache_key} {'hit' if hit else 'miss'}\n")
        return out

    cc.get_executable_and_time = traced
    global _CACHE_TRACE_INSTALLED
    _CACHE_TRACE_INSTALLED = True


def _cache_audit_gate() -> None:
    """BENCH_CACHE_AUDIT=1: fail (rc=4) when any program compiled instead
    of loading from the committed cache — the staleness gate of VERDICT r4.

    Run it after `tools/repop_cache.sh` + prune + commit: a green audit
    proves the committed `.jax_cache` still covers every program the bench
    modes execute. Any miss means a code change shifted a cache key (for
    pallas programs even a pure line shift does it) and the repop protocol
    must run again before measurement numbers are believable.
    """
    if os.environ.get("BENCH_CACHE_AUDIT", "0") != "1":
        return
    if not (_CACHE_TRACE_INSTALLED and _CACHE_TRACE_OBSERVED):
        # refusing to certify: the hook never installed (jax private API
        # moved) or never fired (persistent cache disabled), so every
        # program may have compiled fresh without being counted
        _emit(
            "cache_audit_misses",
            -1.0,
            extra={
                "unit": "misses",
                "vs_baseline": 0.0,
                "error": "cache_audit_not_engaged",
                "detail": (
                    "audit hook "
                    + (
                        "never fired (persistent compile cache disabled?)"
                        if _CACHE_TRACE_INSTALLED
                        else "could not install (jax private API moved?)"
                    )
                    + " — cannot certify cache coverage"
                ),
            },
        )
        sys.stdout.flush()
        sys.exit(4)
    if not _CACHE_MISSES:
        log("cache audit: OK (0 misses)")
        return
    _emit(
        "cache_audit_misses",
        float(len(_CACHE_MISSES)),
        extra={
            "unit": "misses",
            "vs_baseline": 0.0,
            "error": "cache_audit_failed",
            "detail": (
                f"{len(_CACHE_MISSES)} program(s) compiled instead of "
                "loading from .jax_cache — stale entries; re-run "
                "tools/repop_cache.sh + prune + commit"
            ),
            "first_miss_keys": [str(k)[:32] for k in _CACHE_MISSES[:5]],
        },
    )
    sys.stdout.flush()
    sys.exit(4)


def _enable_compile_cache() -> None:
    """Persist compiled executables across bench processes when supported.

    First-call compile latency through the remote-compile service is highly
    variable (observed 24-260 s for the same program), and even trivial ops
    (pad/add/select) cost ~0.4 s each through the compile RPC — a fit path
    touching ~20 of them pays ~8 s before the big programs even start. The
    cache ships *inside the repo* (`.jax_cache/`, committed) so a fresh
    checkout/process starts warm, and the persistence threshold is 0 so the
    tiny ops are cached too.
    """
    from aggforce_tpu.utils.cache import enable_compile_cache

    cache_dir = os.environ.get(
        "AGGFORCE_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    if enable_compile_cache(cache_dir) is None:
        log("compilation cache unavailable")


def _cached_synth(pdb: str, n_frames: int, seed: int):
    """Synthesize the fixture trajectory, memoized to local disk.

    The bench's trajectory synthesis stands in for production disk
    loading; on this container's (slow, shared) host CPU it costs 10-20 s
    of pure RNG draws, which would dominate the <10 s end-to-end budget
    with a number that measures the host, not the framework. Caching the
    synthetic arrays to /tmp turns repeat runs into exactly the production
    pattern: load from disk -> stage -> fit. A cache miss synthesizes and
    is reported as such (``fixture_source`` in the log line).
    """
    import hashlib

    from aggforce_tpu.utils.synth import synthesize_protein_fixture

    key = hashlib.sha1(
        f"{pdb}:{os.path.getmtime(pdb)}:{n_frames}:{seed}:v2".encode()
    ).hexdigest()[:16]
    cache_dir = os.environ.get(
        "AGGFORCE_BENCH_CACHE", "/tmp/aggforce_bench_cache"
    )
    # float16 memmaps: the "load" is an mmap (milliseconds — the old
    # monolithic npz read cost ~7 s cold), pages fault in lazily DURING
    # chunked staging (overlapping disk IO with the H2D transfer), and
    # float16 on disk matches the default float16 staging wire so no
    # precision is lost relative to what crosses the tunnel anyway.
    c_path = os.path.join(cache_dir, f"fix_{key}_coords.npy")
    f_path = os.path.join(cache_dir, f"fix_{key}_forces.npy")
    if os.path.exists(c_path) and os.path.exists(f_path):
        return {
            "coords": np.load(c_path, mmap_mode="r"),
            "forces": np.load(f_path, mmap_mode="r"),
        }, "disk"
    fix = synthesize_protein_fixture(pdb, n_frames=n_frames, seed=seed)
    os.makedirs(cache_dir, exist_ok=True)
    for path, arr in ((c_path, fix["coords"]), (f_path, fix["forces"])):
        tmp = os.path.join(cache_dir, f"tmp_{os.getpid()}_{os.path.basename(path)}")
        np.save(tmp, np.asarray(arr, dtype=np.float16))
        os.replace(tmp, path)
    return {
        "coords": np.load(c_path, mmap_mode="r"),
        "forces": np.load(f_path, mmap_mode="r"),
    }, "synthesized"


def build_fixture(n_frames: int, warm=None):
    """Build the CLN025-scale benchmark fixture.

    ``warm``, when given, is called as ``warm(cmap, groups)`` BEFORE the
    (seconds-long) trajectory load/synthesis and should kick off background
    program warm-up (:mod:`aggforce_tpu.utils.warmup`); its return value is
    stored under ``fix["warmup_handle"]`` so the caller can join it —
    program preparation overlaps data loading exactly as it would
    overlap disk IO in production.
    """
    from aggforce_tpu import LinearMap
    from aggforce_tpu.utils.pdblite import (
        ca_map_from_pdb,
        guess_h_bond_groups,
        n_atoms,
    )
    from aggforce_tpu.utils.synth import synthesize_trajectory

    pdb = "/root/reference/tests/data/cln025.pdb"
    if os.path.exists(pdb):
        # topology-derived inputs first (cheap) so warm-up can start before
        # the seconds-long trajectory load/synthesis
        cmap = LinearMap(ca_map_from_pdb(pdb), n_fg_sites=n_atoms(pdb))
        groups = guess_h_bond_groups(pdb)
        handle = warm(cmap, groups) if warm is not None else None
        t0 = time.perf_counter()
        data, source = _cached_synth(pdb, n_frames, seed=2024)
        fix_s = time.perf_counter() - t0
        log(f"fixture ({source}): {fix_s:.3f}s")
        fix = {
            "coords": data["coords"],
            "forces": data["forces"],
            "kbt": np.float64(0.6955215),
            "constraint_groups": groups,
            "warmup_handle": handle,
            "fixture_s": fix_s,
        }
        return fix, cmap
    # standalone fallback: 175-atom synthetic system, 10 cg sites
    rng = np.random.default_rng(0)
    n_sites = 175
    base = rng.normal(scale=0.5, size=(n_sites, 3))
    groups = [frozenset((i, i + 1)) for i in range(0, 60, 2)]
    cmap = LinearMap(
        [[i] for i in range(0, n_sites, 18)], n_fg_sites=n_sites
    )
    handle = warm(cmap, groups) if warm is not None else None
    coords, forces = synthesize_trajectory(base, groups, n_frames, seed=2024)
    fix = {
        "coords": coords,
        "forces": forces,
        "kbt": 0.6955215,
        "constraint_groups": groups,
        "warmup_handle": handle,
    }
    return fix, cmap


def run_sweep() -> None:
    """Config #5: large solvated-system sweep via the linear-map pipeline.

    ``BENCH_SWEEP_STREAMED=1`` routes the fit through the streamed mesh
    path instead (chunks round-robined over every available device with a
    psum-merged Gram — the multi-host composition, exercised on however
    many chips the process sees). ``BENCH_SWEEP_FEAT=1`` runs the
    FEATURIZED map at solvated-system scale through the site-blocked
    fused path instead (see run_sweep_featurized).
    """
    if os.environ.get("BENCH_SWEEP_FEAT", "0") == "1":
        return run_sweep_featurized()
    import jax

    from aggforce_tpu import LinearMap, guess_pairwise_constraints
    from aggforce_tpu.qp import qp_linear_map
    from aggforce_tpu.trajectory import Trajectory
    from aggforce_tpu.utils.synth import synthesize_trajectory_device

    streamed = os.environ.get("BENCH_SWEEP_STREAMED", "0") == "1"
    # streamed default is smaller: its source is HOST-synthesized (the mode
    # models a multi-host host-resident stream) and this bench host's
    # single-thread RAM path is slow enough (~20 MB/s big gathers, measured)
    # that a 100k-frame host synthesis takes >10 minutes; the mode is
    # tunnel-bandwidth-bound, so 20k frames measures the same stream rate
    default_frames = "20000" if streamed else "100000"
    n_frames = int(os.environ.get("BENCH_FRAMES", default_frames))
    n_atoms = int(os.environ.get("BENCH_ATOMS", "3000"))
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")
    rng = np.random.default_rng(0)
    base = rng.normal(scale=1.5, size=(n_atoms, 3))
    groups = [frozenset((i, i + 1)) for i in range(0, n_atoms // 2, 2)]
    t0 = time.perf_counter()
    # streamed mode consumes the HOST fixture; the device fixture is then
    # only the final 64-frame finiteness check, so synthesize just those
    # frames instead of holding the full (n_frames, N, 3) pair in HBM
    dev_frames = 64 if streamed else n_frames
    coords, forces = synthesize_trajectory_device(
        base, groups, dev_frames, seed=1, motion_scale=0.02
    )
    jax.block_until_ready((coords, forces))
    log(f"device fixture synthesis: {time.perf_counter() - t0:.3f}s")
    cmap = LinearMap(
        [[i] for i in range(0, n_atoms, max(1, n_atoms // 64))],
        n_fg_sites=n_atoms,
    )
    log(f"sweep fixture: {coords.shape}, cg sites {cmap.n_cg_sites}")
    traj = Trajectory(coords=coords, forces=forces)
    if streamed:
        # host-resident source streamed chunkwise over ALL devices; this is
        # the multi-host composition run on one process
        from aggforce_tpu.io import TrajectoryStream, qp_linear_map_streamed
        from aggforce_tpu.parallel.mesh import make_mesh
        from aggforce_tpu.utils.synth import synthesize_trajectory

        mesh = make_mesh()
        log(f"streamed sweep over {mesh.devices.size} device(s)")
        # the streamed mode models a HOST-resident source (multi-host
        # composition), so synthesize the host twin directly — fetching the
        # device fixture back (np.asarray on 2 x 3.6 GB) funnels ~7 GB
        # through the ~100 MB/s tunnel and has killed the client outright
        t0 = time.perf_counter()
        coords_h, forces_h = synthesize_trajectory(
            base, groups, n_frames, seed=1, motion_scale=0.02
        )
        log(f"host fixture synthesis: {time.perf_counter() - t0:.3f}s")
        stream = TrajectoryStream.from_arrays(
            coords_h, forces_h, chunk_size=4096
        )

    def fit():
        t0 = time.perf_counter()
        det_coords = coords_h[:256] if streamed else coords[:256]
        constraints = guess_pairwise_constraints(det_coords)
        log(f"  constraint detection: {time.perf_counter() - t0:.3f}s "
            f"({len(constraints)} pairs)")
        t0 = time.perf_counter()
        if streamed:
            out = qp_linear_map_streamed(
                stream, cmap, constraints=constraints, mesh=mesh
            )
            log(f"  qp_linear_map_streamed: {time.perf_counter() - t0:.3f}s")
        else:
            out = qp_linear_map(traj, cmap, constraints=constraints)
            log(f"  qp_linear_map: {time.perf_counter() - t0:.3f}s")
        return out

    t0 = time.perf_counter()
    tmap = fit()
    log(f"first sweep fit (incl. compile): {time.perf_counter() - t0:.3f}s")
    t0 = time.perf_counter()
    tmap = fit()
    elapsed = time.perf_counter() - t0
    mc, mf = tmap.map_arrays(coords[:64], forces[:64])
    assert np.all(np.isfinite(np.asarray(mf)))
    value = n_frames / elapsed
    log(f"sweep fit: {elapsed:.3f}s -> {value:.1f} frames/s/chip")
    _emit(
        "sweep_linear_qp_fit_frames_per_sec_per_chip",
        value,
        extra={"streamed_mesh": streamed},
    )


def run_sweep_featurized() -> None:
    """Featurized (config-dependent) map at solvated-system scale.

    The reference's featurized path never ran beyond peptide scale; this
    measures the fused id+gb featurized fit at sweep geometry, where
    K_exp = G*(1+n_basis) makes the full (S, K_exp, K_exp) Gram stack
    exceed HBM — the site-blocked path
    (:func:`aggforce_tpu.qp.fusedfeat.fused_gb_linear_map_blocked`) bounds
    peak memory at ~3*site_block*K_exp^2 floats with no approximation.
    Defaults (1,500 atoms -> G=1,125 groups, K_exp=9,000, S~64 sites,
    20k frames) put the full stack at ~21 GB (> one v5e's 16 GB HBM);
    fits are FLOP-dominated (~S*K_exp^2*3T MACs), so expect tens of
    seconds per fit, not the linear map's sub-second.
    """
    import jax

    from aggforce_tpu import LinearMap
    from aggforce_tpu.qp.fusedfeat import (
        GBFeatSpec,
        fused_gb_linear_map_blocked,
    )
    from aggforce_tpu.trajectory import Trajectory
    from aggforce_tpu.utils.synth import synthesize_trajectory_device

    n_frames = int(os.environ.get("BENCH_FRAMES", "20000"))
    n_atoms = int(os.environ.get("BENCH_ATOMS", "1500"))
    n_basis = int(os.environ.get("BENCH_SWEEP_NBASIS", "7"))
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")
    rng = np.random.default_rng(0)
    base = rng.normal(scale=1.5, size=(n_atoms, 3))
    groups = [frozenset((i, i + 1)) for i in range(0, n_atoms // 2, 2)]
    t0 = time.perf_counter()
    coords, forces = synthesize_trajectory_device(
        base, groups, n_frames, seed=1, motion_scale=0.02
    )
    jax.block_until_ready((coords, forces))
    log(f"device fixture synthesis: {time.perf_counter() - t0:.3f}s")
    cmap = LinearMap(
        [[i] for i in range(0, n_atoms, max(1, n_atoms // 64))],
        n_fg_sites=n_atoms,
    )
    n_groups = len(groups) + (n_atoms - sum(len(g) for g in groups))
    k_exp = n_groups * (1 + n_basis)
    s_sites = cmap.n_cg_sites
    stack_gb = s_sites * k_exp**2 * 4 / 1e9
    # measured on v5e-16GB: site_block=6 fits (solver-stage batching
    # amortizes the latency-bound Cholesky/inverse panels: 39.7 s -> 34.3 s
    # per fit vs site_block=4); site_block=8 exhausts HBM on the solve's
    # factor+inverse transients
    budget_gb = float(os.environ.get("AGGFORCE_GRAM_HBM_GB", "6.0"))
    site_block = int(
        os.environ.get(
            "BENCH_SITE_BLOCK",
            str(max(1, int(budget_gb * 1e9 / (3 * k_exp**2 * 4)))),
        )
    )
    log(
        f"sweep-feat geometry: {n_frames}x{n_atoms}, G={n_groups}, "
        f"K_exp={k_exp}, S={s_sites}, full Gram stack {stack_gb:.1f} GB "
        f"-> site_block={site_block}"
    )
    traj = Trajectory(coords=coords, forces=forces)

    # BENCH_SWEEP_MESH=N shards the site-block axis over N devices (one
    # block program per device, no collectives — the dryrun-proven
    # `fused_gb_linear_map_blocked(mesh=...)` path). On a single-chip
    # bench host the mesh run is skipped and the N-device time is
    # PROJECTED instead: blocks are independent, so an N-device mesh runs
    # ceil(n_blocks/N) super-dispatches where one chip runs n_blocks.
    mesh_req = int(os.environ.get("BENCH_SWEEP_MESH", "8"))
    devs = jax.devices()
    mesh = None
    if mesh_req > 1 and len(devs) >= mesh_req:
        from jax.sharding import Mesh

        mesh = Mesh(np.array(devs[:mesh_req]), axis_names=("siteblocks",))
        log(f"site-block mesh over {mesh_req} devices")

    def fit():
        t0 = time.perf_counter()
        tmap = fused_gb_linear_map_blocked(
            traj, cmap, kbt=0.7,
            spec=GBFeatSpec(outer=8.0, inner=0.0, n_basis=n_basis, width=1.0),
            constraints=set(groups), l2_regularization=1e3,
            n_constraint_frames=20,
            constraint_rng=np.random.default_rng(3),
            chunk_size=256, site_block=site_block,
            mesh=mesh,
        )
        return tmap, time.perf_counter() - t0

    tmap, first = fit()
    log(f"first site-blocked featurized fit (incl. compile): {first:.3f}s")
    tmap, elapsed = fit()
    resid = tmap.force_map.tags["solver_resid"]
    mc, mf = tmap.map_arrays(coords[:8], forces[:8])
    assert np.all(np.isfinite(np.asarray(mf)))
    value = n_frames / elapsed
    n_blocks = -(-s_sites // site_block)
    extra = {
        "k_exp": k_exp,
        "site_block": site_block,
        "gram_stack_gb": round(stack_gb, 1),
        "fit_seconds": round(elapsed, 2),
        "mesh_devices": 1 if mesh is None else mesh_req,
    }
    if mesh is None and mesh_req > 1:
        # projection, not a measurement: per-block device time scaled to
        # ceil(blocks/N) mesh dispatches (block programs are independent;
        # the sharded executable is validated by dryrun_multichip)
        per_block = elapsed / n_blocks
        projected = per_block * (-(-n_blocks // mesh_req))
        extra["projected_fit_s_mesh"] = round(projected, 2)
        extra["projected_mesh_devices"] = mesh_req
        extra["projection_basis"] = (
            "independent site-block programs; mesh path dryrun-validated"
        )
        log(
            f"projected {mesh_req}-device mesh fit: {projected:.2f}s "
            f"({n_blocks} blocks -> {-(-n_blocks // mesh_req)} per device)"
        )
    log(
        f"sweep featurized fit: {elapsed:.3f}s -> {value:.1f} "
        f"frames/s/chip (resid {resid:.2e})"
    )
    _emit(
        "sweep_featurized_fit_frames_per_sec_per_chip",
        value,
        extra=extra,
    )


def _staged_device_traj(fix):
    """Stage the fixture into HBM via the resilient chunked staging path.

    float16 wire by default (BENCH_WIRE=float32 for lossless; the ~5e-4
    quantization is quantified in tests/test_staging.py). A deadline
    thread (BENCH_STAGING_TIMEOUT, default 1200 s) exits 5 with an
    attributed error JSON when the data channel crawls, not a hang.
    """
    from aggforce_tpu.io.staging import stage_trajectory

    wire = os.environ.get("BENCH_WIRE", "float16")
    cancel = _staging_deadline(wire)
    traj, report = stage_trajectory(
        fix["coords"], fix["forces"], wire_dtype=wire
    )
    cancel()
    fix["staging_report"] = report
    log(
        f"device staging (H2D): {report.seconds:.3f}s "
        f"({report.bytes / 1e6:.1f} MB as {report.wire_dtype}, "
        f"{report.mbps:.1f} MB/s, {report.n_chunks} chunks, {report.retries} retries"
        f"{', TUNNEL DEGRADED' if report.degraded else ''})"
    )
    return traj


def _join_warmup(fix) -> float:
    """Join a fixture's background warm-up; returns the blocking wait (s)."""
    handle = fix.get("warmup_handle")
    if handle is None:
        return 0.0
    wait = handle.wait()
    if not handle.done:  # only possible if a timeout were ever passed
        log(f"program warm-up: still running after {wait:.3f}s wait")
        return wait
    status = "failed: " + repr(handle.error) if handle.error else "ok"
    log(
        f"program warm-up: {handle.elapsed:.3f}s in background "
        f"({wait:.3f}s blocking wait after data staging; {status})"
    )
    return wait


def _prep_attribution(fix) -> dict:
    """Attribute program-preparation time for the emitted JSON.

    ``prep_rpc_s`` is the cumulative wall time inside the compile /
    persistent-cache RPCs (remote compiles on a miss, executable uploads
    to the compile service on a hit); ``warmup_synth_s``/``warmup_fit_s``
    split the background warm-up into operand construction vs the
    end-to-end program preparation of the fit executable.
    ``prep_degraded`` flags warm-up wall time far beyond the healthy-window
    envelope — the compile channel's analogue of staging's
    ``tunnel_degraded`` (the two channels degrade independently; measured
    15 s vs 135 s for identical warm-cache runs minutes apart).
    """
    out = {"prep_rpc_s": round(_RPC_S[0], 3)}
    handle = fix.get("warmup_handle")
    if handle is not None and handle.phases:
        for name, seconds in handle.phases.items():
            out[f"warmup_{name}_s"] = round(seconds, 3)
        fit_s = handle.phases.get("fit")
        if fit_s is not None:
            out["prep_degraded"] = bool(fit_s > 30.0)
    return out


def _emit(metric: str, value: float, extra=None) -> None:
    out = {
        "metric": metric,
        "value": round(value, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(value / 125.0, 3),
    }
    if extra:
        out.update(extra)
    print(json.dumps(out))


def _device_watchdog() -> None:
    """Fail loudly (one attributed JSON line) when the device never answers.

    Two gates on one probe thread, each with a ``BENCH_DEVICE_TIMEOUT`` s
    budget (default 900): (1) ``jax.devices()`` answers; (2) one trivial
    jitted program completes a round trip — the degraded tunnel can answer
    device listing instantly while every program RPC hangs, invisible to
    a devices()-only gate. Either failure emits an error-attributed JSON
    line and exits 3 instead of hanging with no artifact; probes run
    concurrently with main()'s own first device use.
    """
    import threading

    timeout_s = float(os.environ.get("BENCH_DEVICE_TIMEOUT", "900"))
    if timeout_s <= 0:
        return
    ok_dev, ok_prog = threading.Event(), threading.Event()

    def probe():
        import jax
        jax.devices()
        ok_dev.set()
        if float(jax.jit(lambda a: a + 1.0)(jax.numpy.float32(1.0))) == 2.0:
            ok_prog.set()

    threading.Thread(target=probe, daemon=True).start()

    def watch():
        if ok_dev.wait(timeout_s) and ok_prog.wait(timeout_s):
            return
        which = "jax.devices()" if not ok_dev.is_set() else "first program"
        _emit(
            "featurized_qp_fit_frames_per_sec_per_chip",
            0.0,
            extra={
                "error": "device_unreachable",
                "detail": f"{which} did not complete within {timeout_s:.0f}s"
                " — accelerator tunnel down/degraded; no measurement possible",
            },
        )
        sys.stdout.flush()
        os._exit(3)

    threading.Thread(target=watch, daemon=True).start()


def run_static() -> None:
    """Config #1: CLN025 static optimal linear map (constrained LS)."""
    n_frames = int(os.environ.get("BENCH_FRAMES", "10000"))
    from aggforce_tpu.qp import constraint_aware_uni_map, qp_linear_map

    def warm(cmap, groups):
        from aggforce_tpu.utils.warmup import warm_linear_fit

        return warm_linear_fit(n_frames, cmap, set(groups))

    fix, cmap = build_fixture(n_frames, warm=warm)
    constraints = set(fix["constraint_groups"])
    traj = _staged_device_traj(fix)
    _join_warmup(fix)

    # basic (uniform aggregation) map: host-side construction, trivial
    t0 = time.perf_counter()
    constraint_aware_uni_map(traj=traj, coord_map=cmap, constraints=constraints)
    log(f"constraint_aware_uni_map: {time.perf_counter() - t0:.3f}s")

    def fit():
        return qp_linear_map(traj, cmap, constraints=constraints)

    t0 = time.perf_counter()
    tmap = fit()
    log(f"first fit (incl. compile): {time.perf_counter() - t0:.3f}s")
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        tmap = fit()
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    log(f"steady-state fit: {elapsed:.3f}s (runs: {[f'{t:.3f}' for t in times]})")
    mc, mf = tmap.map_arrays(traj.coords[:64], traj.forces[:64])
    assert np.all(np.isfinite(np.asarray(mf)))
    _emit("static_linear_qp_fit_frames_per_sec_per_chip", n_frames / elapsed)


def run_gauss() -> None:
    """Config #2: Gaussian noised maps, fully device-resident pipeline."""
    n_frames = int(os.environ.get("BENCH_FRAMES", "10000"))
    import jax

    from aggforce_tpu.qp.jgauss import joptgauss_map, stagedjoptgauss_map

    def warm(cmap, groups):
        from aggforce_tpu.utils.warmup import warm_gauss_fit

        return warm_gauss_fit(n_frames, cmap, var=0.002, constraints=set(groups))

    fix, cmap = build_fixture(n_frames, warm=warm)
    constraints = set(fix["constraint_groups"])
    kbt = float(fix["kbt"])
    traj = _staged_device_traj(fix)
    _join_warmup(fix)

    def fit(seed):
        return joptgauss_map(
            traj, cmap, var=0.002, kbt=kbt, constraints=constraints, seed=seed
        )

    t0 = time.perf_counter()
    tmap = fit(7)
    log(f"first joptgauss fit (incl. compile): {time.perf_counter() - t0:.3f}s")
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        tmap = fit(100 + i)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    log(f"joptgauss fit: {elapsed:.3f}s (runs: {[f'{t:.3f}' for t in times]})")

    import jax.numpy as jnp

    # apply (re-noise + map) on the full device trajectory
    def _force(o):
        # block_until_ready alone can return before remote execution ends
        # (CLAUDE.md); force a value so apply timings are real
        jax.block_until_ready((o.coords, o.forces))
        float(jnp.sum(o.forces[:1]))

    t0 = time.perf_counter()
    out = tmap(traj)
    _force(out)
    t_apply0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = tmap(traj)
    _force(out)
    t_apply = time.perf_counter() - t0
    assert isinstance(out.forces, jax.Array), "apply left the device"
    log(f"joptgauss apply: {t_apply:.3f}s (first {t_apply0:.3f}s)")

    t0 = time.perf_counter()
    stagedjoptgauss_map(traj, cmap, var=0.002, kbt=kbt, constraints=constraints, seed=7)
    t_staged0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    stagedjoptgauss_map(traj, cmap, var=0.002, kbt=kbt, constraints=constraints, seed=8)
    t_staged = time.perf_counter() - t0
    log(f"stagedjoptgauss fit: {t_staged:.3f}s (first {t_staged0:.3f}s)")

    _emit(
        "gauss_noised_map_fit_frames_per_sec_per_chip",
        n_frames / elapsed,
        extra={
            "apply_frames_per_sec": round(n_frames / t_apply, 2),
            "staged_fit_frames_per_sec": round(n_frames / t_staged, 2),
        },
    )


def run_cv() -> None:
    """Config #4: featurized grid CV (5 folds x 6 l2) in batched dispatches."""
    n_frames = int(os.environ.get("BENCH_FRAMES", "10000"))
    from aggforce_tpu.qp.cv import fused_gb_cv
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec

    fix, cmap = build_fixture(n_frames)
    constraints = set(fix["constraint_groups"])
    kbt = float(fix["kbt"])
    spec = GBFeatSpec(outer=8.0, inner=0.0, n_basis=7, width=1.0)
    traj = _staged_device_traj(fix)
    l2_values = [1e0, 1e1, 1e2, 1e3, 1e4, 1e5]

    def cv(seed):
        return fused_gb_cv(
            traj.coords, traj.forces, cmap, constraints, kbt, spec,
            l2_values=l2_values, n_folds=5,
            rng=np.random.default_rng(seed),
        )

    t0 = time.perf_counter()
    table = cv(7)
    log(f"first CV (incl. compile): {time.perf_counter() - t0:.3f}s")
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        table = cv(100 + i)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    best = min(table.items(), key=lambda kv: kv[1][0])
    log(f"CV grid (5 folds x {len(l2_values)} l2): {elapsed:.3f}s "
        f"(runs: {[f'{t:.3f}' for t in times]}); best l2={best[0]:g} "
        f"score={best[1][0]:.4f}")
    _emit(
        "cv_featurized_grid_frames_per_sec_per_chip",
        n_frames / elapsed,
        extra={"grid_points": 5 * len(l2_values)},
    )


def run_featurized() -> None:
    """Config #3 (default): fused featurized fit + MFU accounting."""
    n_frames = int(os.environ.get("BENCH_FRAMES", "10000"))
    import jax

    from aggforce_tpu.qp.featlinearmap import id_feat
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    spec = GBFeatSpec(outer=8.0, inner=0.0, n_basis=7, width=1.0)

    def warm(cmap, groups):
        # overlap program preparation (trace + backend compile/cache-load,
        # ~10 s through the remote compile service) with data generation —
        # the production pattern for disk-loaded trajectories
        from aggforce_tpu.utils.warmup import warm_featurized_fit

        return warm_featurized_fit(
            n_frames, cmap, spec, set(groups),
            l2_regularization=1e3, chunk_size=2048,
        )

    fix, cmap = build_fixture(n_frames, warm=warm)
    constraints = set(fix["constraint_groups"])
    kbt = float(fix["kbt"])
    log(
        f"fixture: {fix['coords'].shape} frames x sites, "
        f"{cmap.n_cg_sites} cg sites, {len(constraints)} constraint groups"
    )
    traj = _staged_device_traj(fix)
    warmup_wait_s = _join_warmup(fix)

    def fit(seed: int):
        return fused_gb_linear_map(
            traj,
            cmap,
            kbt=kbt,
            spec=spec,
            constraints=constraints,
            l2_regularization=1e3,
            chunk_size=2048,
            constraint_rng=np.random.default_rng(seed),
        )

    t0 = time.perf_counter()
    tmap = fit(7)
    t_first = time.perf_counter() - t0
    t_e2e = time.perf_counter() - _T0 if _E2E_VALID else None
    log(f"first fit (incl. compile): {t_first:.3f}s")
    if t_e2e is not None:
        log(f"process end-to-end to first fitted map: {t_e2e:.3f}s")

    # 5 timed runs, min: per-fit wall clock includes one host round-trip,
    # whose latency through the remote-device tunnel varies run to run
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        tmap = fit(100 + i)  # fresh constraint-frame sample each run
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    log(f"steady-state fit: {elapsed:.3f}s (runs: {[f'{t:.3f}' for t in times]})")

    # pipelined (device-only) throughput: many fits queued, ONE host sync —
    # amortizes the per-call tunnel latency that dominates single-fit wall
    # clocks on remote-attached devices
    from aggforce_tpu.qp.fusedfeat import fused_gb_linear_map_batch

    # one full flush window: window-aligned so no padded solves, and the
    # per-window fixed cost (Gram pass + dispatch round-trip + per-site
    # factorization) amortizes over every fit reported. 64 is the measured
    # sweet spot (5.97 ms/fit vs 13.0 at 16; tools/probe_batch_window.py)
    # now that packaging shares one set of device constants per window.
    n_batch = int(os.environ.get("BENCH_BATCH", "64"))
    # BENCH_WINDOWS windows per timed call: the wrapper's one-window
    # software pipeline overlaps window w's fetch+packaging with window
    # w+1's device compute, so the per-fit cost of a many-seed run is the
    # window program amortized once — this is the production bootstrap
    # shape (window-aligned: no padded tail solves)
    n_windows = max(1, int(os.environ.get("BENCH_WINDOWS", "4")))
    n_seeds = n_windows * n_batch
    # untimed warm call: loading/compiling the batch executable happens
    # here, so the timed call below measures steady-state batch throughput
    fused_gb_linear_map_batch(
        traj, cmap, kbt=kbt, spec=spec, seeds=range(500, 500 + n_batch),
        constraints=constraints, l2_regularization=1e3, chunk_size=2048,
        flush_every=n_batch,
    )
    batch_times = []
    for rep in range(3):
        t0 = time.perf_counter()
        fused_gb_linear_map_batch(
            traj, cmap, kbt=kbt, spec=spec,
            seeds=range(1000 + rep * n_seeds, 1000 + (rep + 1) * n_seeds),
            constraints=constraints, l2_regularization=1e3, chunk_size=2048,
            flush_every=n_batch,
        )
        batch_times.append(time.perf_counter() - t0)
    t_batch = min(batch_times)
    pipelined = n_seeds * n_frames / t_batch
    t_per_fit_wall = t_batch / n_seeds
    log(f"pipelined batch of {n_seeds} fits ({n_windows}x{n_batch}-fit "
        f"windows): {t_batch:.3f}s ({t_per_fit_wall * 1e3:.1f} ms/fit, "
        f"{pipelined:.0f} frames/s)")

    # sanity: mapped forces finite, orthogonality approximately satisfied
    sub = slice(0, 256)
    mc, mf = tmap.map_arrays(traj.coords[sub], traj.forces[sub])
    assert np.all(np.isfinite(np.asarray(mf))), "non-finite mapped forces"
    log(f"mapped force residual (subset): {float(np.mean(np.asarray(mf)**2)):.4f}")
    log(f"solver constraint residual: {tmap.force_map.tags['solver_resid']:.2e}")

    # MFU accounting (useful work): the Gram stage is S sites x 3 components
    # x one (T, K_exp)^T (T, K_exp) MXU GEMM -> 2*T*K_exp^2 FLOPs each.
    ids = id_feat(fix["coords"][:1], cmap, constraints, return_ids=True)
    n_groups = int(ids.max()) + 1
    k_exp = n_groups * (1 + spec.n_basis)
    flops_useful = cmap.n_cg_sites * 3 * 2 * n_frames * k_exp * k_exp
    tflops = flops_useful / elapsed / 1e12
    from aggforce_tpu.utils.prof import device_peaks

    batch_tflops = flops_useful / t_per_fit_wall / 1e12
    peaks = device_peaks()
    if peaks is None:
        mfu = batch_mfu = None
        log(f"useful Gram FLOPs {flops_useful/1e9:.1f} GF -> {tflops:.1f} "
            f"TF/s (device model unknown: no MFU)")
    else:
        kind, peak_tf, _ = peaks
        mfu = tflops / peak_tf
        batch_mfu = batch_tflops / peak_tf
        log(f"useful Gram FLOPs {flops_useful/1e9:.1f} GF -> {tflops:.1f} "
            f"TF/s single-fit (MFU {100*mfu:.1f}%), {batch_tflops:.1f} TF/s "
            f"batched (MFU {100*batch_mfu:.1f}%) of {kind} bf16 peak")

    rep = fix.get("staging_report")
    staging_extra = {}
    if rep is not None:
        staging_extra = {
            "staging_s": round(rep.seconds, 3),
            "staging_mbps": round(rep.mbps, 2),
            "staging_wire": rep.wire_dtype,
            "staging_retries": rep.retries,
            "tunnel_degraded": bool(rep.degraded),
        }
        if t_e2e is not None:
            # the compute+prep story with tunnel-transfer time attributed
            # out: what a healthy-window (or local-HBM) run would see
            staging_extra["e2e_ex_staging_s"] = round(t_e2e - rep.seconds, 3)
    if "fixture_s" in fix:
        staging_extra["fixture_s"] = round(fix["fixture_s"], 3)
    if t_e2e is not None and rep is not None:
        # e2e with BOTH tunnel-bound phases attributed out: staging
        # (H2D transfer) and the exposed program-preparation wait
        # (compile/cache-load RPCs — paid once per deployment, and absent
        # entirely on locally-attached devices). This is the recurring
        # fit path: import + fixture load + dispatch + fit.
        staging_extra["e2e_ex_prep_s"] = round(
            t_e2e - rep.seconds - warmup_wait_s, 3
        )

    _emit(
        "featurized_qp_fit_frames_per_sec_per_chip",
        n_frames / elapsed,
        extra={
            "first_fit_s": round(t_first, 3),
            **(
                {"process_e2e_s": round(t_e2e, 3)} if t_e2e is not None else {}
            ),
            **staging_extra,
            "warmup_wait_s": round(warmup_wait_s, 3),
            **_prep_attribution(fix),
            "tflops": round(tflops, 2),
            **({"mfu": round(mfu, 4)} if mfu is not None else {}),
            **(
                {"pipelined_mfu": round(batch_mfu, 4)}
                if batch_mfu is not None
                else {}
            ),
            "solver_resid": float(tmap.force_map.tags["solver_resid"]),
            "pipelined_frames_per_sec": round(pipelined, 2),
        },
    )


def main() -> None:
    _enable_compile_cache()
    _meter_compile_rpcs()
    _trace_cache_accesses()
    _device_watchdog()
    mode = os.environ.get("BENCH_MODE", "").lower()
    runners = {
        "": run_featurized,
        "feat": run_featurized,
        "featurized": run_featurized,
        "static": run_static,
        "gauss": run_gauss,
        "cv": run_cv,
        "sweep": run_sweep,
    }
    if mode == "all":
        global _E2E_VALID
        _E2E_VALID = False
        for fn in (run_static, run_gauss, run_cv, run_sweep, run_featurized):
            fn()
        _cache_audit_gate()
        return
    runners[mode]()
    _cache_audit_gate()


if __name__ == "__main__":
    main()


def _staging_deadline(wire: str):
    """Deadline for the H2D staging phase (see ``_staged_device_traj``).

    Returns a zero-arg cancel callable. If staging is still running when
    ``BENCH_STAGING_TIMEOUT`` (default 1200 s; <=0 disables) expires, one
    error-attributed JSON line is emitted and the process exits 5 — a
    crawling tunnel data channel otherwise stalls the bench past any
    driver patience and leaves no artifact (observed <0.2 MB/s windows,
    2026-08-20; healthy is ~100 MB/s). Defined after ``main`` on purpose:
    appended code cannot shift the line numbers embedded in the committed
    pallas program cache keys (see CLAUDE.md).
    """
    import threading

    budget = float(os.environ.get("BENCH_STAGING_TIMEOUT", "1200"))
    done = threading.Event()
    if budget <= 0:
        return done.set

    def watch():
        if done.wait(budget):
            return
        _emit(
            "featurized_qp_fit_frames_per_sec_per_chip",
            0.0,
            extra={
                "error": "staging_timeout",
                "detail": (
                    f"H2D staging ({wire} wire) still running after "
                    f"{budget:.0f}s — tunnel data channel degraded below "
                    "usable; no measurement possible"
                ),
            },
        )
        sys.stdout.flush()
        os._exit(5)

    threading.Thread(target=watch, daemon=True).start()
    return done.set
