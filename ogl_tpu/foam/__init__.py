from ogl_tpu.foam import dictionary as dictionary
from ogl_tpu.foam.solver import (
    FoamSolver as FoamSolver,
    SolverPerformance as SolverPerformance,
    solve as solve,
)
