"""Stage decomposition of the sweep-scale shared solve (site_block batch).

Times, at BENCH_SWEEP_FEAT geometry (K ~ 9000, Sb sites), each stage of
`batched_eqp_solve_shared`: equilibrate+Cholesky, blocked triangular
inverse, the L^-T L^-1 GEMM, and the Z/Schur/refinement tail — plus the
tiled Pallas Gram and constraint assembly, so the site-block program's
device floor is fully attributed.

Usage: python tools/profile_sweepsolve.py [sb] [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aggforce_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aggforce_tpu.ops.blocked_chol import (  # noqa: E402
    cholesky_blocked,
    spd_inv_from_chol,
    tri_inv_blocked,
)
from aggforce_tpu.ops.eqp import _shared_schur_stage  # noqa: E402

sb = int(sys.argv[1]) if len(sys.argv) > 1 else 6
n = int(sys.argv[2]) if len(sys.argv) > 2 else 9000
m = int(sys.argv[3]) if len(sys.argv) > 3 else 1320
nb = 512

rng = np.random.default_rng(0)
w = rng.normal(size=(sb, n, 24)).astype(np.float32)
P = jnp.asarray(w @ np.swapaxes(w, 1, 2) + 1e3 * np.eye(n, dtype=np.float32))
A = jnp.asarray(rng.normal(size=(1, sb, m, n)).astype(np.float32))
B = jnp.asarray(rng.normal(size=(1, sb, m, 1)).astype(np.float32))
jax.block_until_ready((P, A, B))
print(f"geometry: Sb={sb}, n={n}, m={m}, nb={nb}")


def timed(name, fn, nrep=3):
    out = fn()
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn()
        jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / nrep
    print(f"{name:<44s} {dt:8.3f} s")
    return out


# Memory hygiene: each (Sb, n, n) buffer is ~Sb*n^2*4 B (1.9 GB at the
# default geometry) and the big stages carry 2-3x transients, so buffers
# are .delete()d as soon as a later stage no longer needs them — the
# original keep-everything script exhausted 16 GB HBM at Sb=6.

# --- direct-Z route first (the production sweep path: f=1, f*m <= 2n) ---
from aggforce_tpu.ops.blocked_chol import cho_solve_blocked  # noqa: E402
from aggforce_tpu.ops.eqp import _site_factor_chol  # noqa: E402

sfc_jit = jax.jit(lambda p: _site_factor_chol(p, 1e-6, 3e-4))
cholf = timed("site factor only (equilibrate+chol)", lambda: sfc_jit(P))
solve_jit = jax.jit(lambda c, a: jax.vmap(
    lambda cc, aa: cho_solve_blocked(cc, aa, nb=nb)
)(c, jnp.swapaxes(a[0], 1, 2)))
Z = timed("Z cho_solve alone (nb=512)", lambda: solve_jit(cholf, A))
Z.delete()
dtail_jit = jax.jit(lambda c, a, b: _shared_schur_stage(
    c, a, b, 1e-6, 3e-4, 40, op_is_factor=True))
out = timed(
    "Z + Schur + refinement tail (solve Z)", lambda: dtail_jit(cholf, A, B)
)
print(f"  max constraint residual (solve Z): {float(jnp.max(out[1])):.3e}")
jax.tree.map(lambda x: x.delete(), out)
cholf.delete()

# --- inverse route (the batch-window path, for comparison) ---
chol_jit = jax.jit(lambda p: jax.vmap(lambda x: cholesky_blocked(x, nb=nb))(p))
chol = timed("blocked cholesky (nb=512)", lambda: chol_jit(P))
linv_jit = jax.jit(lambda c: jax.vmap(lambda x: tri_inv_blocked(x, nb=nb))(c))
linv = timed("blocked triangular inverse", lambda: linv_jit(chol))
chol.delete()
gemm_jit = jax.jit(lambda li: jnp.matmul(
    jnp.swapaxes(li, 1, 2), li, precision="highest"))
minv = timed("L^-T L^-1 GEMM", lambda: gemm_jit(linv))
linv.delete()
tail_jit = jax.jit(lambda mi, a, b: _shared_schur_stage(
    mi, a, b, 1e-6, 3e-4, 40))
out = timed(
    "Z + Schur + refinement tail (inverse Z)", lambda: tail_jit(minv, A, B)
)
print(f"  max constraint residual (inverse Z): {float(jnp.max(out[1])):.3e}")
