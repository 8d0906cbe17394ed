"""Solver-log parsing — the reference's test harness validates runs by
parsing solverPerformance lines out of OpenFOAM logs (test/
postProcessLogs.py with Owls/OBR, integration-tests.yml "Validate" steps).
This is the equivalent for logs produced by this framework (or by OpenFOAM
itself — the line format is OpenFOAM's own).
"""

from __future__ import annotations

import dataclasses
import re

__all__ = ["SolveRecord", "parse_log", "validate_log"]

_LINE = re.compile(
    r"^(?P<solver>[\w.]+):\s+Solving for (?P<field>[\w.]+), "
    r"Initial residual = (?P<init>[^,]+), "
    r"Final residual = (?P<final>[^,]+), "
    r"No Iterations (?P<iters>\d+)")


@dataclasses.dataclass(frozen=True)
class SolveRecord:
    solver: str
    field: str
    initial_residual: float | tuple
    final_residual: float | tuple
    n_iterations: int


def _num(s: str):
    s = s.strip()
    if s.startswith("("):  # vector residual (coupled solves)
        return tuple(float(v) for v in s.strip("()").split())
    return float(s)


def parse_log(text: str) -> list[SolveRecord]:
    """Every solverPerformance line in the log, in order."""
    out = []
    for line in text.splitlines():
        m = _LINE.match(line.strip())
        if m:
            out.append(SolveRecord(
                solver=m.group("solver"),
                field=m.group("field"),
                initial_residual=_num(m.group("init")),
                final_residual=_num(m.group("final")),
                n_iterations=int(m.group("iters")),
            ))
    return out


def validate_log(text: str, field: str, tolerance: float | None = None,
                 max_iterations: int | None = None) -> list[SolveRecord]:
    """Physics-tolerance-style acceptance (the reference's validation.json
    schema checks: case completed, bounds respected): every solve of
    `field` must have reduced the residual, met `tolerance` (when given),
    and stayed within `max_iterations` (when given).  Returns the records;
    raises AssertionError with the offending record otherwise."""
    recs = [r for r in parse_log(text) if r.field == field]
    if not recs:
        raise AssertionError(f"no solves of field {field!r} in log")
    for r in recs:
        fin = (max(r.final_residual) if isinstance(r.final_residual, tuple)
               else r.final_residual)
        ini = (max(r.initial_residual) if isinstance(r.initial_residual, tuple)
               else r.initial_residual)
        if r.n_iterations > 0 and fin > ini:
            raise AssertionError(f"residual grew: {r}")
        if tolerance is not None and fin > tolerance:
            raise AssertionError(f"final residual above {tolerance}: {r}")
        if max_iterations is not None and r.n_iterations > max_iterations:
            raise AssertionError(f"iteration budget exceeded: {r}")
    return recs
