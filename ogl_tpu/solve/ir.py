"""IR — preconditioned Richardson iteration (iterative refinement).

Replaces `gko::solver::Ir` as configured by GKOIR (reference
Solver/IR/GKOIR.H — excluded from the reference build but listed in its
README, treated as in-scope per SURVEY.md Appendix B).

Two inner shapes, matching the reference factory:
  * no `inner_solve`: x ← x + relaxation · M⁻¹ r with M the configured
    preconditioner (gko::solver::Ir's default identity/preconditioner
    inner — create_scalar_jacobi, GKOIR.H:82-103);
  * `inner_solve` given: the reference's create_default (GKOIR.H:58-78)
    — an inner CG with its OWN OpenFOAM stopping criterion solves
    A·dx = r each outer step.  The outer residual is always computed
    against the full-precision matrix, which makes this the natural
    mixed-precision hook: an inner CG streaming a bfloat16-packed
    operator still converges the OUTER iteration to f32 accuracy
    (defect correction), at roughly half the inner HBM traffic.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from ogl_tpu.config import StoppingConfig
from ogl_tpu.solve import stopping
from ogl_tpu.solve.cg import SolveResult
from ogl_tpu.solve.krylov import Ops

__all__ = ["ir"]


class _Carry(NamedTuple):
    x: Any
    r: Any
    stop: stopping.StopState


def ir(ops: Ops, b, x0, cfg: StoppingConfig, relaxation: float = 1.0,
       history_len: int = 0,
       inner_solve: Callable[[Any], Any] | None = None) -> SolveResult:
    dtype = b.dtype
    x0 = jnp.asarray(x0, dtype)
    init = _Carry(x=x0, r=b - ops.matvec(x0), stop=stopping.init_state(dtype, history_len))
    hard_cap = cfg.max_iter + cfg.frequency
    relax = jnp.asarray(relaxation, dtype)

    def cond(c: _Carry):
        return jnp.logical_and(~c.stop.converged, c.stop.iter < hard_cap)

    def body(c: _Carry):
        st = stopping.check(ops, cfg, c.stop, c.r, c.x, b)
        # branchless: see solve/cg.py — a zero step on the converged
        # iteration freezes x and r; the while cond exits next.
        step = jnp.where(st.converged, jnp.asarray(0.0, dtype), relax)
        corr = inner_solve(c.r) if inner_solve is not None else ops.precond(c.r)
        dx = step * corr.astype(dtype)
        return _Carry(
            x=c.x + dx, r=c.r - ops.matvec(dx),
            stop=st.replace(iter=st.iter + jnp.where(st.converged, 0, 1)))

    out = jax.lax.while_loop(cond, body, init)
    return SolveResult(
        x=out.x,
        iters=out.stop.iter,
        init_res_norm=out.stop.init_res_norm,
        final_res_norm=out.stop.res_norm,
        converged=stopping.satisfied(cfg, out.stop),
        history=out.stop.history,
    )
