"""Distributed foam solver — the reference's multi-rank path
(lduLduBase::solve_multi_gpu_impl, lduLduBase.H:189-308) as a per-field
persistent object over a jax.sharding.Mesh.

Construction mirrors the reference: per-rank LduMatrix systems with
processor interfaces (what decomposePar + the per-rank HostMatrix would
hold) become a DistMatrix once; steady-state solves only swap coefficient
stacks (update_values) and re-split b.  The mesh takes the place of the MPI
communicator; the solve itself is dist.dist_solve (shard_map + ppermute
halo rounds + psum reductions).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ogl_tpu import registry
from ogl_tpu.config import SolverConfig, parse_controls
from ogl_tpu.core import ldu as ldu_mod
from ogl_tpu.dist import dist_solve
from ogl_tpu.dist.from_ranks import dist_from_ldu_ranks, update_values
from ogl_tpu.dist.partition import gather_global, split_vector
from ogl_tpu.foam.solver import SolverPerformance
from ogl_tpu.solve import stopping

__all__ = ["DistFoamSolver", "solve_distributed"]


from ogl_tpu.dist.solve import schwarz_block_jacobi_builder, schwarz_jacobi_builder


class DistFoamSolver:
    """Per-field distributed solver over a mesh.

    ranks: list of per-rank LduMatrix (with ProcInterfaces), one per mesh
    device — or a single global LduMatrix, which is decomposed with
    ldu.decompose (contiguous blocks, decomposePar-simple)."""

    def __init__(self, field_name: str, controls: dict | SolverConfig,
                 mesh: Mesh | None = None):
        self.field = field_name
        self.cfg = controls if isinstance(controls, SolverConfig) else parse_controls(controls)
        if mesh is None:
            devs = jax.devices()
            mesh = Mesh(np.array(devs), ("x",))
        self.mesh = mesh
        self.n_parts = int(np.prod(mesh.devices.shape))
        self.dm = None
        self.props = registry.global_registry.properties(field_name)
        self.dtype = jnp.dtype(self.cfg.dtype)

    def _ranks_of(self, m):
        if isinstance(m, ldu_mod.LduMatrix):
            return ldu_mod.decompose(m, self.n_parts)
        return list(m)

    def solve(self, m, b, psi=None):
        ranks = self._ranks_of(m)
        if self.dm is None:
            self.dm = dist_from_ldu_ranks(ranks, dtype=np.dtype(self.dtype))
        elif self.cfg.update_sys_matrix:
            self.dm = update_values(self.dm, ranks, dtype=np.dtype(self.dtype))
        dm = self.dm

        bs = jnp.asarray(split_vector(dm, np.asarray(b)), self.dtype)
        if psi is not None and self.cfg.update_init_guess:
            x0 = jnp.asarray(split_vector(dm, np.asarray(psi)), self.dtype)
        else:
            x0 = jnp.zeros_like(bs)

        stopping_cfg = self.cfg.stopping.adapted(
            self.props.prev_solve_iters, self.props.prev_rel_res_cost, self.cfg.export
        )
        sp = stopping.StoppingParams.of(stopping_cfg)

        pc = None
        if self.cfg.precond.name == "BJ":
            pc = schwarz_block_jacobi_builder(self.cfg.precond.max_block_size)
        elif self.cfg.precond.name != "none":
            raise NotImplementedError(
                f"distributed preconditioner {self.cfg.precond.name!r} not yet "
                "supported; use none or BJ (additive-Schwarz block Jacobi)"
            )

        x_stack, res = dist_solve(
            dm, bs, x0, sp, self.mesh,
            solver=self.cfg.solver if self.cfg.solver in
            ("GKOCG", "GKOBiCGStab", "GKOGMRES", "GKOIR") else "GKOCG",
            precond_builder=pc,
            krylov_dim=self.cfg.krylov_dim,
        )
        iters = int(np.asarray(jax.device_get(res.iters)).ravel()[0])
        self.props.prev_solve_iters = iters
        x = gather_global(dm, x_stack)
        perf = SolverPerformance(
            solver_name=f"{self.cfg.solver}_dist{self.n_parts}",
            field_name=self.field,
            initial_residual=float(np.asarray(jax.device_get(res.init_res_norm)).ravel()[0]),
            final_residual=float(np.asarray(jax.device_get(res.final_res_norm)).ravel()[0]),
            n_iterations=iters,
            converged=bool(np.asarray(jax.device_get(res.converged)).ravel()[0]),
        )
        return x, perf


def solve_distributed(field_name: str, m, b, controls, mesh=None, psi=None):
    """Registry-cached distributed solve (cf. foam.solve)."""
    solver = registry.global_registry.get_or_init(
        f"{field_name}_dist_solver",
        lambda: DistFoamSolver(field_name, controls, mesh),
    )
    return solver.solve(m, b, psi=psi)
