"""Phase timing and device tracing hooks.

The reference has no profiling beyond the QuTiP ``progress_bar``
plumbing (reference ``pulser-simulation/pulser_simulation/
simulation.py:697-703``); on TPU the interesting structure is
host-side phases (sampling, plan building) vs device phases
(compile, execute), so this module provides:

- :func:`phase` — a context manager accumulating wall-clock per named
  phase into a global registry (:func:`phase_report`), and doubling as
  a ``jax.profiler.TraceAnnotation`` so the phases show up on the
  device timeline when a trace is active;
- :func:`trace` — a context manager around ``jax.profiler.trace``
  writing a TensorBoard/XProf trace directory.

Overhead when unused is two ``perf_counter`` calls per phase.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Any, Iterator

__all__ = [
    "phase",
    "phase_report",
    "reset_phases",
    "trace",
]

_lock = threading.Lock()
_totals: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Times a named phase and annotates the device trace with it."""
    try:
        import jax.profiler

        annotation: Any = jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover - jax always importable here
        annotation = contextlib.nullcontext()
    start = time.perf_counter()
    with annotation:
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            with _lock:
                _totals[name] += elapsed
                _counts[name] += 1


def phase_report(reset: bool = False) -> dict[str, dict[str, float]]:
    """Accumulated wall-clock per phase: {name: {total_s, calls}}."""
    with _lock:
        report = {
            name: {
                "total_s": _totals[name],
                "calls": float(_counts[name]),
            }
            for name in _totals
        }
        if reset:
            _totals.clear()
            _counts.clear()
    return report


def reset_phases() -> None:
    """Clears the accumulated phase timings."""
    phase_report(reset=True)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Captures a device trace (TensorBoard/XProf) into ``log_dir``."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
