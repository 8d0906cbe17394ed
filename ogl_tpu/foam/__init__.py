from ogl_tpu.foam import case as case
from ogl_tpu.foam import logs as logs
from ogl_tpu.foam import dictionary as dictionary
from ogl_tpu.foam.solver import (
    FoamSolver as FoamSolver,
    SolverPerformance as SolverPerformance,
    solve as solve,
)
from ogl_tpu.foam.f64 import (
    F64DefectSolver as F64DefectSolver,
)
from ogl_tpu.foam.dist_solver import (
    DistFoamSolver as DistFoamSolver,
    solve_distributed as solve_distributed,
)
from ogl_tpu.foam.coupled import (
    CoupledFoamSolver as CoupledFoamSolver,
    CoupledSolverPerformance as CoupledSolverPerformance,
    solve_coupled as solve_coupled,
)
from ogl_tpu.foam.api import (
    GKOCG as GKOCG,
    GKOBiCGStab as GKOBiCGStab,
    GKOGMRES as GKOGMRES,
    GKOIR as GKOIR,
    GKOMultigrid as GKOMultigrid,
    GKOACG as GKOACG,
)
