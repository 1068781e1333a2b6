"""Attribute fresh-process program-preparation time, executable by executable.

Hooks the JAX compile path (`compile_or_get_cached`) and the persistent
cache (`get_executable_and_time`) to log, for every program the featurized
fit path prepares: its name, whether it was a persistent-cache hit, and the
wall time of the preparation RPCs. Run against the live device to see where
the bench's `warmup_wait_s` goes.

Usage: python tools/profile_warmup.py [frames]
"""

import os
import sys
import time

sys.path.insert(0, ".")

from aggforce_tpu.utils.cache import enable_compile_cache  # noqa: E402

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
enable_compile_cache(os.path.abspath(cache_dir))

import jax  # noqa: E402
import jax._src.compilation_cache as cc  # noqa: E402
import jax._src.compiler as comp  # noqa: E402

events = []

_orig_get = cc.get_executable_and_time


def traced_get(cache_key, *a, **k):
    t0 = time.perf_counter()
    out = _orig_get(cache_key, *a, **k)
    events.append(("cache_get", cache_key[:12], time.perf_counter() - t0,
                   out[0] is not None))
    return out


cc.get_executable_and_time = traced_get

_orig_cgc = comp.compile_or_get_cached


def traced_cgc(backend, computation, *a, **k):
    try:
        name = computation.name
    except Exception:
        name = "?"
    t0 = time.perf_counter()
    out = _orig_cgc(backend, computation, *a, **k)
    events.append(("compile", name, time.perf_counter() - t0, None))
    return out


comp.compile_or_get_cached = traced_cgc

t_start = time.perf_counter()
print(f"devices: {jax.devices()}", file=sys.stderr)

from aggforce_tpu import LinearMap  # noqa: E402
from aggforce_tpu.qp.fusedfeat import GBFeatSpec  # noqa: E402
from aggforce_tpu.utils.pdblite import (  # noqa: E402
    ca_map_from_pdb,
    guess_h_bond_groups,
    n_atoms,
)
from aggforce_tpu.utils.warmup import warm_featurized_fit  # noqa: E402

PDB = "/root/reference/tests/data/cln025.pdb"
frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10000

cmap = LinearMap(ca_map_from_pdb(PDB), n_fg_sites=n_atoms(PDB))
groups = guess_h_bond_groups(PDB)
spec = GBFeatSpec(outer=8.0, inner=0.0, n_basis=7, width=1.0)

t0 = time.perf_counter()
handle = warm_featurized_fit(
    frames, cmap, spec, set(groups), l2_regularization=1e3, chunk_size=2048
)
handle.wait()
total = time.perf_counter() - t0
status = "ok" if handle.error is None else f"FAILED: {handle.error!r}"
print(f"\nwarm-up total: {total:.3f}s ({status})")
print(f"process total (incl. imports/backend init): "
      f"{time.perf_counter() - t_start:.3f}s\n")

compile_total = sum(e[2] for e in events if e[0] == "compile")
get_total = sum(e[2] for e in events if e[0] == "cache_get")
hits = sum(1 for e in events if e[0] == "cache_get" and e[3])
misses = sum(1 for e in events if e[0] == "cache_get" and not e[3])
print(f"{len([e for e in events if e[0]=='compile'])} programs prepared, "
      f"{compile_total:.3f}s inside compile_or_get_cached")
print(f"persistent cache: {hits} hits + {misses} misses, "
      f"{get_total:.3f}s inside get_executable_and_time\n")
print(f"{'kind':<10} {'name':<48} {'seconds':>8}  hit")
for kind, name, dt, hit in sorted(events, key=lambda e: -e[2])[:40]:
    print(f"{kind:<10} {name[:48]:<48} {dt:8.3f}  {hit}")
