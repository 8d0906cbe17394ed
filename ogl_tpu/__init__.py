"""ogl_tpu — a TPU-native sparse linear-solver framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of hpsim/OGL
(the OpenFOAM–Ginkgo layer): runtime-selectable Krylov solvers
(CG, BiCGStab, GMRES, IR, Multigrid) with OpenFOAM-compatible stopping
semantics, preconditioners (block-Jacobi, ISAI, ILU/IC, AMG, Schwarz),
LDU→device-format matrix conversion with persistent device caching, and
mesh-decomposition data parallelism realised as shard_map + ppermute/psum
over a jax.sharding.Mesh instead of MPI.

Reference parity map (citations are file:line into /root/reference):
  - LDU→CSR conversion         -> ogl_tpu.core.ldu      (HostMatrix/HostMatrix.C)
  - DevicePersistent caching   -> ogl_tpu.registry      (DevicePersistent/Base/Base.H)
  - Krylov solvers             -> ogl_tpu.solve         (Solver/*, via Ginkgo)
  - Stopping criterion         -> ogl_tpu.solve.stopping (StoppingCriterion/)
  - Preconditioners            -> ogl_tpu.precond       (Preconditioner/Preconditioner.H)
  - Distributed matrix/halo    -> ogl_tpu.dist          (CsrMatrixWrapper.H, Partition.H)
  - fvSolution config + API    -> ogl_tpu.foam          (Solver/CG/GKOCG.C etc.)
"""

from ogl_tpu import config as config
from ogl_tpu import registry as registry
from ogl_tpu.core import formats as formats
from ogl_tpu.core import ldu as ldu

__version__ = "0.1.0"
