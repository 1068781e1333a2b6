"""Probe: does a bf16-input dot speed up the tiled sweep Gram kernel?

The tiled kernel's `dot_general` takes f32 rows with default precision;
Mosaic's lowering decides the MXU pass count. This probe runs the
production kernel against a bf16-cast-rows twin at the sweep geometry
and reports (a) amortized kernel time and (b) max relative Gram error,
so the precision/throughput trade is measured, not guessed. The twin is
built by temporarily pointing the module-level `_gram_tiled_kernel` at a
patched body — the pallas_call site and launch params stay identical.

Usage: python tools/probe_gram_precision.py [frames] [n_basis] [groups]
ONE TPU process at a time (CLAUDE.md).
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from aggforce_tpu.ops import pallas_gram as pg  # noqa: E402

frames = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
n_basis = int(sys.argv[2]) if len(sys.argv) > 2 else 9
g_dim = int(sys.argv[3]) if len(sys.argv) > 3 else 900
sb = 6
t_block = 512
g_pad = -(-g_dim // 128) * 128
t_pad = -(-frames // t_block) * t_block

rng = np.random.default_rng(0)
gpos = jnp.asarray(rng.standard_normal((3, t_pad, g_pad)).astype(np.float32))
cg = jnp.asarray(rng.standard_normal((sb, 3, t_pad)).astype(np.float32))
fg = jnp.asarray(rng.standard_normal((3, t_pad, g_pad)).astype(np.float32))
mask = jnp.ones((t_pad,), jnp.float32)
centers = jnp.linspace(0.5, 8.0, n_basis).astype(np.float32)
kbt_counts = jnp.asarray(
    0.7 * rng.integers(1, 4, size=g_pad).astype(np.float32))


def bf16_kernel(pair_bi_ref, pair_bj_ref, centers_ref, gpos_ref, cg_ref,
                fg_ref, maskd_ref, counts_ref, out_ref, *, width, clip):
    """Twin of _gram_tiled_kernel with rows cast to bf16 before the dot."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    p = pl.program_id(1)
    step = pl.program_id(2)
    bi = pair_bi_ref[p]
    bj = pair_bj_ref[p]

    @pl.when(step == 0)
    def _():
        out_ref[0, 0] = jnp.zeros_like(out_ref[0, 0])

    inv_w = 1.0 / width
    disp0 = gpos_ref[0] - cg_ref[0, 0, :][:, None]
    disp1 = gpos_ref[1] - cg_ref[0, 1, :][:, None]
    disp2 = gpos_ref[2] - cg_ref[0, 2, :][:, None]
    d = jnp.sqrt(disp0 * disp0 + disp1 * disp1 + disp2 * disp2)
    inv_d = 1.0 / jnp.maximum(d, 1e-30)

    def block_parts(b, center):
        offset = (d - center) * inv_w
        raw = jnp.exp(-(offset * offset))
        gz = jnp.maximum(raw, clip) - clip
        live = (raw > clip).astype(raw.dtype)
        dph = (counts_ref[0, :] * live * raw * (-2.0 * inv_w) * offset
               * maskd_ref[:, 0:1])
        is_id = (b == 0).astype(raw.dtype)
        return is_id + (1.0 - is_id) * gz, (1.0 - is_id) * dph

    gz_i, dph_i = block_parts(bi, centers_ref[bi])
    gz_j, dph_j = block_parts(bj, centers_ref[bj])

    acc = jnp.zeros_like(out_ref[0, 0])
    for disp_a, fg_a in ((disp0, fg_ref[0]), (disp1, fg_ref[1]),
                         (disp2, fg_ref[2])):
        u_a = disp_a * inv_d
        row_i = (fg_a * gz_i + dph_i * u_a).astype(jnp.bfloat16)
        row_j = (fg_a * gz_j + dph_j * u_a).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            row_i, row_j,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0, 0] = out_ref[0, 0] + acc


def run(label, reps=3):
    f = partial(pg.pallas_site_grams_tiled, gpos, cg, fg, mask, centers,
                kbt_counts, n_basis=n_basis, width=1.0, clip=1e-3,
                t_block=t_block)
    out = jax.block_until_ready(f())  # compile + first run
    t0 = time.perf_counter()
    outs = [f() for _ in range(reps)]
    for o in outs:
        o.block_until_ready()
    _ = float(jnp.sum(outs[-1]))  # force a value (tunnel gotcha)
    dt = (time.perf_counter() - t0) / reps
    b_dim = 1 + n_basis
    n_pairs = b_dim * (b_dim + 1) // 2
    flops = sb * 3 * 2 * t_pad * g_pad * g_pad * n_pairs
    print(f"{label}: {dt:.3f} s/call amortized, {flops/dt/1e12:.1f} TF/s")
    return out, dt


print(f"geometry: Sb={sb}, T={t_pad}, G_pad={g_pad}, B={1+n_basis} "
      f"(K_pad={(1+n_basis)*g_pad})")
base, t_base = run("f32 rows (production)")

orig = pg._gram_tiled_kernel
pg._gram_tiled_kernel = bf16_kernel
pg.pallas_site_grams_tiled.clear_cache()
try:
    b16, t_b16 = run("bf16 rows")
finally:
    pg._gram_tiled_kernel = orig
    pg.pallas_site_grams_tiled.clear_cache()

scale = float(jnp.max(jnp.abs(base)))
err = float(jnp.max(jnp.abs(b16 - base))) / scale
print(f"speedup {t_base / t_b16:.2f}x, max rel Gram error {err:.2e} "
      f"(vs ~7e-3 statistical noise of a 20k-frame Gram estimate)")
