"""MFU / roofline probe for the fused featurized fit's hot stages.

Times the Pallas Gram kernel (and the XLA scan twin) in isolation on the
live device, accounts FLOPs and HBM bytes, and reports achieved TFLOP/s and
MFU against the chip's matmul peak.

Usage: python tools/mfu.py [frames] [t_block]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from aggforce_tpu import LinearMap  # noqa: E402
from aggforce_tpu.qp.fusedfeat import (  # noqa: E402
    GBFeatSpec,
    group_factorization,
)
from aggforce_tpu.ops import pallas_gram as pg  # noqa: E402
from aggforce_tpu.utils.pdblite import ca_map_from_pdb, n_atoms  # noqa: E402
from aggforce_tpu.utils.prof import device_peaks  # noqa: E402
from aggforce_tpu.utils.synth import synthesize_protein_fixture  # noqa: E402

# per-chip peaks looked up from the live device model; MFU is only printed
# when the model is known (a hardcoded peak on the wrong chip reports a
# silently wrong utilization)
_peaks = device_peaks()
if _peaks is None:
    DEVICE_KIND = jax.devices()[0].device_kind
    PEAK_BF16_TFLOPS = None
    PEAK_HBM_GBS = None
    print(f"device model {DEVICE_KIND!r} not in the peak table: raw TF/s and "
          "GB/s only, no MFU percentages")
else:
    DEVICE_KIND, PEAK_BF16_TFLOPS, PEAK_HBM_GBS = _peaks
    print(f"device: {DEVICE_KIND} (peaks {PEAK_BF16_TFLOPS:.0f} TF/s bf16, "
          f"{PEAK_HBM_GBS:.0f} GB/s HBM)")

PDB = "/root/reference/tests/data/cln025.pdb"
frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
t_block = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

fix = synthesize_protein_fixture(PDB, n_frames=frames, seed=2024)
cmap = LinearMap(ca_map_from_pdb(PDB), n_fg_sites=n_atoms(PDB))
constraints = set(fix["constraint_groups"])
spec = GBFeatSpec(outer=8.0, inner=0.0, n_basis=7, width=1.0)

geom = group_factorization(cmap, spec, constraints)
onehot, group_mean = geom["onehot"], geom["group_mean"]
counts, centers = geom["counts"], geom["centers"]
G = onehot.shape[1]

S = cmap.n_cg_sites
K = spec.n_basis
k_exp = G + G * K

t_pad = -(-frames // t_block) * t_block
coords = np.concatenate(
    [fix["coords"], np.zeros((t_pad - frames, cmap.n_fg_sites, 3), np.float32)]
).astype(np.float32)
forces = np.concatenate(
    [fix["forces"], np.zeros((t_pad - frames, cmap.n_fg_sites, 3), np.float32)]
).astype(np.float32)
mask = np.concatenate([np.ones(frames), np.zeros(t_pad - frames)]).astype(
    np.float32
)

gpos, cg, fg, centers_flat, kbt_counts_flat = jax.jit(pg.pack_operands, static_argnames=("n_basis",))(
    jnp.asarray(coords), jnp.asarray(forces), jnp.asarray(mask),
    jnp.asarray(cmap.standard_matrix, jnp.float32), jnp.asarray(group_mean),
    jnp.asarray(onehot), jnp.asarray(counts, jnp.float32),
    jnp.asarray(float(fix["kbt"]), jnp.float32), K, jnp.asarray(centers),
)
jax.block_until_ready((gpos, cg, fg))
g_pad = gpos.shape[-1]
k_pad = g_pad * (1 + K)
clip = spec.clip  # MUST match production: clip is a static jit arg baked
# into the Mosaic payload — a different value times a different executable

print(f"T={frames} (pad {t_pad}) S={S} G={G} (pad {g_pad}) "
      f"K_exp={k_exp} (pad {k_pad}) t_block={t_block}")


def timed(name, fn, n=20):
    """Amortized device time: n async dispatches, one sync + one fetch.

    Per-call sync through the axon tunnel costs 10-45 ms — far more than
    the kernel itself — so per-call wall clocks measure the tunnel, not the
    device. Queueing n calls and dividing amortizes that latency away.
    """
    out = fn()
    jax.block_until_ready(out)
    float(jnp.sum(out))  # compile/warm-up fence: block_until_ready alone
    # can return while the (possibly minutes-long) remote compile is still
    # in flight, which would bill it to the timing loop
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    float(jnp.sum(outs[-1]))  # force through the tunnel
    return (time.perf_counter() - t0) / n, out


def report(name, secs):
    # executed matmul FLOPs: per site, 3 components, 2*T*K_pad^2 each
    flops_exec = S * 3 * 2 * t_pad * k_pad * k_pad
    flops_useful = S * 3 * 2 * frames * k_exp * k_exp
    # HBM traffic: per site the kernel re-reads gpos+fg (3*T*G_pad f32 each)
    # and cg (3*T); one Gram write per site
    bytes_rw = 4 * (S * (2 * 3 * t_pad * g_pad + 3 * t_pad) + S * k_pad * k_pad)
    tf_exec = flops_exec / secs / 1e12
    tf_useful = flops_useful / secs / 1e12
    gbs = bytes_rw / secs / 1e9
    if PEAK_BF16_TFLOPS is None:
        print(f"{name:<24s} {secs*1e3:8.2f} ms  exec {tf_exec:6.1f} TF/s  "
              f"useful {tf_useful:6.1f} TF/s  HBM {gbs:6.1f} GB/s  "
              f"[unknown device model: no MFU]")
        return
    print(f"{name:<24s} {secs*1e3:8.2f} ms  exec {tf_exec:6.1f} TF/s "
          f"(MFU {100*tf_exec/PEAK_BF16_TFLOPS:4.1f}% of {DEVICE_KIND})  "
          f"useful {tf_useful:6.1f} TF/s "
          f"(MFU {100*tf_useful/PEAK_BF16_TFLOPS:4.1f}%)  HBM {gbs:6.1f} GB/s "
          f"({100*gbs/PEAK_HBM_GBS:4.1f}%)")


# stage EVERY operand once: a host->device conversion inside the timed
# lambda re-uploads per call, and through the tunnel a single upload can
# cost more than the kernel itself
mask_dev = jnp.asarray(mask)
jax.block_until_ready(mask_dev)

best, gram = timed("pallas", lambda: pg.pallas_site_grams(
    gpos, cg, fg, mask_dev, centers_flat, kbt_counts_flat,
    K, spec.width, clip, t_block=t_block))
report(f"pallas t_block={t_block}", best)
