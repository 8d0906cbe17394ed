"""Named solver classes — the reference's registered solver surface
(Solver/CG/GKOCG.C:14-18, Solver/BiCGStab/GKOBiCGStab.C, Solver/GMRES/
GKOGMRES.C, Solver/IR/GKOIR.H, Solver/Multigrid/GKOMultigrid.H): one thin
class per algorithm so `GKOCG(field, controls).solve(matrix, b)` reads like
the OpenFOAM runtime-selection API.

GKOCG registers for symmetric matrices only; GKOBiCGStab and GKOGMRES for
both (reference sym/asym constructor tables) — enforced here by a check on
LduMatrix.symmetric.
"""

from __future__ import annotations

from ogl_tpu.core.ldu import LduMatrix
from ogl_tpu.foam.solver import FoamSolver

__all__ = ["GKOCG", "GKOBiCGStab", "GKOGMRES", "GKOIR", "GKOMultigrid", "GKOACG"]


class _NamedSolver(FoamSolver):
    SOLVER: str = ""
    SYMMETRIC_ONLY = False

    def __init__(self, field_name: str, controls: dict | None = None):
        controls = dict(controls or {})
        controls["solver"] = self.SOLVER
        super().__init__(field_name, controls)

    def solve(self, m: LduMatrix, b, psi=None, time_value=None):
        if self.SYMMETRIC_ONLY and not m.symmetric:
            raise ValueError(
                f"{self.SOLVER} is registered for symmetric matrices only "
                "(reference registers it in the sym table alone, GKOCG.C:16)"
            )
        return super().solve(m, b, psi=psi, time_value=time_value)


class GKOCG(_NamedSolver):
    """Conjugate gradients (symmetric only, reference Solver/CG/)."""

    SOLVER = "GKOCG"
    SYMMETRIC_ONLY = True


class GKOBiCGStab(_NamedSolver):
    """BiCGStab (sym + asym, reference Solver/BiCGStab/)."""

    SOLVER = "GKOBiCGStab"


class GKOGMRES(_NamedSolver):
    """Restarted GMRES (sym + asym, reference Solver/GMRES/)."""

    SOLVER = "GKOGMRES"


class GKOIR(_NamedSolver):
    """Preconditioned Richardson / iterative refinement (reference
    Solver/IR/GKOIR.H — listed in the README; excluded from the reference
    build but in-scope here per SURVEY.md Appendix B)."""

    SOLVER = "GKOIR"


class GKOMultigrid(_NamedSolver):
    """AMG as a solver (reference Solver/Multigrid/GKOMultigrid.H —
    non-building dead code in the reference; implemented here as Richardson
    wrapped around one PGM-AMG cycle per iteration)."""

    SOLVER = "GKOMultigrid"


from ogl_tpu.foam.coupled import CoupledFoamSolver as _CoupledFoamSolver


class GKOACG(_CoupledFoamSolver):
    """Coupled-matrix CG (reference LduMatrix/GKOACG/GKOACG.H): one scalar
    operator, an nc-component vector field solved as a multivector with
    optional block-Jacobi.

    The reference ships this non-compiled with an aborting coupled ctor
    (HostMatrix.C:153-156, CMakeLists.txt:174); here it WORKS — multi-RHS
    CG with per-component OpenFOAM stopping (solve/acg.py).  Note the
    reference's dead create_BJ hardcodes maxBlockSize 8 (GKOACG.H:62-66);
    here it is configurable with the usual default."""

    def __init__(self, field_name: str, controls: dict | None = None):
        super().__init__(field_name, dict(controls or {}))
