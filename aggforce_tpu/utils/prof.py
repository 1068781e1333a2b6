"""Lightweight tracing/profiling utilities.

The reference has no profiling hooks at all (SURVEY.md §5). This module
provides the TPU-native observability story:

  * :class:`PhaseTimer` — nested wall-clock phase timing with a report
    (device work is fenced by forcing a freshly dispatched value, which
    is reliable even where ``block_until_ready`` is not — see
    :func:`_device_fence`);
  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable device trace;
  * :func:`log_compile_time` — decorator separating first-call (compile)
    cost from steady-state cost of jitted callables.
"""

import contextlib
import time
from functools import wraps
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax


def _device_fence() -> None:
    """Wait until all previously dispatched device work has EXECUTED.

    ``jax.effects_barrier`` only fences effectful computations, and
    ``block_until_ready`` on remote-attached devices can return before
    remote execution finishes (CLAUDE.md gotchas). TPU streams execute
    in dispatch order, so forcing the VALUE of a freshly dispatched
    trivial op is a true fence for everything queued before it.
    """
    import jax.numpy as jnp

    try:
        float(jnp.zeros(()) + 1.0)
    except Exception:
        pass


class PhaseTimer:
    """Accumulates named wall-clock phases; supports nesting and reuse."""

    def __init__(self, sync: bool = True) -> None:
        """``sync=True`` fences the device at phase exit (timings are real)."""
        self.sync = sync
        self.records: List[Tuple[str, float]] = []
        self._totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        """Time a named phase (context manager)."""
        start = time.perf_counter()
        try:
            yield self
        finally:
            if self.sync:
                _device_fence()
            elapsed = time.perf_counter() - start
            self.records.append((name, elapsed))
            self._totals[name] = self._totals.get(name, 0.0) + elapsed

    def total(self, name: str) -> float:
        """Accumulated seconds for a phase name."""
        return self._totals.get(name, 0.0)

    def report(self) -> str:
        """Human-readable per-phase totals, longest first."""
        lines = ["phase timings:"]
        for name, total in sorted(
            self._totals.items(), key=lambda kv: -kv[1]
        ):
            n = sum(1 for r, _ in self.records if r == name)
            lines.append(f"  {name:<32s} {total:9.4f}s  (x{n})")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """Capture a jax.profiler device trace (TensorBoard format).

    With ``logdir=None`` the trace is written to a temp directory and its
    path yielded; pass an explicit directory to keep traces across runs.
    """
    import tempfile

    target = logdir or tempfile.mkdtemp(prefix="aggforce_trace_")
    jax.profiler.start_trace(target)
    try:
        yield target
    finally:
        jax.profiler.stop_trace()


def log_compile_time(fn: Callable, sink: Optional[Callable[[str], Any]] = None):
    """Wrap a jitted callable, reporting first-call vs steady-state time."""
    state = {"calls": 0}
    emit = sink or (lambda msg: print(msg))

    @wraps(fn)
    def wrapped(*args, **kwargs):
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        _device_fence()  # block_until_ready alone can lie on remote devices
        elapsed = time.perf_counter() - start
        state["calls"] += 1
        kind = "first call (incl. compile)" if state["calls"] == 1 else "call"
        emit(f"[{getattr(fn, '__name__', 'fn')}] {kind}: {elapsed:.4f}s")
        return out

    return wrapped
