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


# Published per-chip peaks: {device_kind substring: (dense bf16 matmul
# TFLOP/s, HBM GB/s)}. Matched case-insensitively against
# jax.Device.device_kind; first hit wins (order matters: "v5 lite"/"v5e"
# before "v5"). MFU numbers are only meaningful against the right peak, so
# unknown chips get None rather than a silently wrong denominator.
_TPU_PEAKS = [
    ("v5 lite", (197.0, 819.0)),
    ("v5litepod", (197.0, 819.0)),
    ("v5e", (197.0, 819.0)),
    ("v6 lite", (918.0, 1640.0)),
    ("v6e", (918.0, 1640.0)),
    ("v5p", (459.0, 2765.0)),
    ("v5", (459.0, 2765.0)),  # bare "v5" after the lite variants
    ("v4", (275.0, 1228.0)),
    ("v3", (123.0, 900.0)),
    ("v2", (45.0, 700.0)),
]


def device_peaks(device=None) -> Optional[Tuple[str, float, float]]:
    """(device_kind, peak bf16 TFLOP/s, peak HBM GB/s) for the given (or
    default) device; None when the chip model is not in the table — MFU
    against a guessed peak is misinformation, so callers must skip the MFU
    line rather than print a wrong one."""
    if device is None:
        try:
            device = jax.devices()[0]
        except RuntimeError:
            return None
    kind = getattr(device, "device_kind", "") or ""
    if device.platform != "tpu":
        return None
    low = kind.lower()
    for needle, (tf, gb) in _TPU_PEAKS:
        if needle in low:
            return kind, tf, gb
    return None


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
