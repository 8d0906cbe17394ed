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

__all__ = ["log", "timed", "Timings", "ensure_compilation_cache"]


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


_cache_set = False


def ensure_compilation_cache() -> None:
    """Enable jax's persistent compilation cache by default for the foam
    path (VERDICT r2 item 10: cold first solves spend 40-75 s compiling
    per field at 1M DOF; a warm cache removes all of it on later runs).

    Directory: $OGL_JAX_CACHE_DIR, else ~/.cache/ogl_tpu/jax.  No-op if the
    user already configured jax_compilation_cache_dir, set
    OGL_JAX_CACHE_DIR="" to disable."""
    global _cache_set
    if _cache_set:
        return
    _cache_set = True
    import os

    import jax

    try:
        if jax.config.jax_compilation_cache_dir:
            return  # user already chose a cache location
    except AttributeError:
        pass
    path = os.environ.get(
        "OGL_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "ogl_tpu", "jax"))
    if not path:
        return
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is an optimisation, never a failure
