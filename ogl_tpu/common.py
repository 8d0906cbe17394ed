"""Logging/timing utilities (reference common/common.{H,C}).

Leveled, field-aware log helpers (LOG_0/1/2 equivalents keyed on the
`verbose` config) and a wall-clock timing context that prints
`[OGL LOG] field: name: X [ms]` like TIME_WITH_FIELDNAME
(common.H:67-89).  On TPU the NVTX-range analogue is jax.profiler trace
annotations, emitted when a profiler trace is active.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["log", "timed", "Timings"]


def log(verbose: int, level: int, msg: str) -> None:
    if verbose > level:
        print(f"[OGL LOG] {msg}")


class Timings(dict):
    """Accumulates named wall-clock timings in seconds."""


@contextlib.contextmanager
def timed(name: str, verbose: int = 0, field: str = "", sink: Timings | None = None):
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = sink.get(name, 0.0) + dt
    if verbose > 0:
        print(f"[OGL LOG] {field}: {name}: {dt * 1e3:.3f} [ms]")
