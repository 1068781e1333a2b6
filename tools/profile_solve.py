"""Fine-grained stage decomposition of batched_eqp_solve_shared.

Times (amortized, queue-N sync-once) the solver's internal stages as
separate jits at bench geometry so latency can be attributed: per-site
factorization, explicit inverse, Z GEMM, Schur assembly+factor+inverse,
and the refinement tail.

Usage: python tools/profile_solve.py [f] [s] [n] [m]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from aggforce_tpu.ops.blocked_chol import (  # noqa: E402
    cho_solve_blocked,
    cholesky_blocked,
    spd_inv_from_chol,
)
from aggforce_tpu.ops.eqp import (  # noqa: E402
    _inv_spd,
    _lazy_shift_factor,
    _schur_tail,
    batched_eqp_solve_shared,
)

f = int(sys.argv[1]) if len(sys.argv) > 1 else 16
s = int(sys.argv[2]) if len(sys.argv) > 2 else 10
n = int(sys.argv[3]) if len(sys.argv) > 3 else 624
m = int(sys.argv[4]) if len(sys.argv) > 4 else 200

rng = np.random.default_rng(0)
A_ = rng.normal(size=(s, n, n)).astype(np.float32)
P = jnp.asarray(A_ @ A_.transpose(0, 2, 1) / n + 1e-3 * np.eye(n, dtype=np.float32))
A = jnp.asarray(rng.normal(size=(f, s, m, n)).astype(np.float32))
B = jnp.asarray(rng.normal(size=(f, s, m, 1)).astype(np.float32))
jax.block_until_ready((P, A, B))


def timed(name, fn, nrep=20):
    out = fn()
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    outs = [fn() for _ in range(nrep)]
    jax.block_until_ready(outs)
    float(jnp.sum(jax.tree.leaves(outs[-1])[0]))
    dt = (time.perf_counter() - t0) / nrep
    print(f"{name:<40s} {dt * 1e3:8.2f} ms  ({dt / f * 1e3:6.3f} ms/fit)")
    return out


# jit functions must take the big operands as ARGUMENTS — a closure
# capture bakes them into the program as constants, and the remote
# compile RPC rejects multi-hundred-MB request bodies (HTTP 413)
jit_chol = jax.jit(lambda p: _lazy_shift_factor(p, [1e-6, 3e-4]))
chol = timed("chol_site (s blocked Cholesky)", lambda: jit_chol(P))
jit_inv = jax.jit(_inv_spd)
minv = timed("minv (s blocked explicit inverse)", lambda: jit_inv(chol))
minv_b = jnp.broadcast_to(minv[None], (f,) + minv.shape).reshape(f * s, n, n)
An = A.reshape(f * s, m, n)
Bn = B.reshape(f * s, m, 1)
jit_z = jax.jit(
    lambda mb, an: jnp.matmul(mb, jnp.swapaxes(an, 1, 2), precision="highest")
)
Z = timed("Z = Minv A^T (f*s GEMM)", lambda: jit_z(minv_b, An))
jit_tail = jax.jit(
    lambda z, an, bn: _schur_tail(z, an, bn, 1e-6, 3e-4, 40, 5e-7)
)
timed("schur tail (S, factor, sinv, refine)", lambda: jit_tail(Z, An, Bn))
timed("whole batched_eqp_solve_shared", lambda: batched_eqp_solve_shared(
    P, A, B, iters=40, return_resid=True))

# for contrast: the old sequential pieces
jit_old = jax.jit(
    lambda c: jax.vmap(cho_solve_blocked)(
        c, jnp.broadcast_to(jnp.eye(c.shape[-1], dtype=jnp.float32), c.shape)
    )
)
timed("[old] cho_solve vs identity (s)", lambda: jit_old(chol))
