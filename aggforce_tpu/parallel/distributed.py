"""Multi-host (DCN) initialization and sharding-policy helpers.

The reference is strictly single-process (SURVEY.md §2 parallelism
inventory); the TPU-native growth path is: frame axis data-parallel within a
pod slice (ICI collectives via shard_map/psum — see
:mod:`aggforce_tpu.parallel.mesh`), and multiple hosts joined with
``jax.distributed`` when a trajectory exceeds one host's slice. Because every
fit in this package reduces to [local Gram] -> [psum] -> [tiny replicated
solve], no other collective pattern is required — Grams ride ICI inside the
slice and only the O(K^2) psum result crosses DCN in the multi-host case.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or bootstrap) a multi-host JAX runtime.

    Thin, idempotent wrapper over ``jax.distributed.initialize``: arguments
    left as None are resolved from the cluster environment (TPU pod metadata
    or the standard JAX coordinator env vars). Safe to call on single-host
    runs — initialization errors from an absent cluster are swallowed and
    the process continues single-host.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:  # already initialized / no cluster
        if "already" not in str(e).lower() and num_processes not in (None, 1):
            raise


def global_frame_mesh(axis_name: str = "frames") -> Mesh:
    """1-D mesh over every addressable device across all processes.

    With multiple hosts, arrays placed with a ``frames``-sharded
    NamedSharding put each host's local frames on its own devices; the psum
    in the fit kernels then spans ICI within each slice and DCN across
    hosts.
    """
    return Mesh(np.array(jax.devices()), axis_names=(axis_name,))


def process_frame_slice(n_frames: int) -> slice:
    """The contiguous frame range this process should load.

    Splits ``n_frames`` as evenly as possible over processes (earlier
    processes take the remainder), so per-host data loading stays local.
    """
    n_proc = jax.process_count()
    pid = jax.process_index()
    base, rem = divmod(n_frames, n_proc)
    start = pid * base + min(pid, rem)
    stop = start + base + (1 if pid < rem else 0)
    return slice(start, stop)
