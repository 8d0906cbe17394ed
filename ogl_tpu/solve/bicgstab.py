"""Preconditioned BiCGStab as a `lax.while_loop`.

Replaces `gko::solver::Bicgstab` as driven by GKOBiCGStab
(reference Solver/BiCGStab/GKOBiCGStab.H).  Two SpMVs per iteration —
which is why the reference doubles maxIter for this solver
(StoppingCriterion.H:188; mirrored in config.parse_controls).
Breakdown guards (ω, β denominators ≈ 0) zero the step instead of
poisoning the recurrence with NaN.

Reduction grouping (distributed latency): the five per-iteration inner
products fall into three dependency groups, each fused into ONE psum of a
stacked vector — [‖r‖₁, <r̂,r>] (both on the carried r), then [<r̂,v>]
(after the first SpMV), then [<t,s>, <t,t>] (after the second).  Three
collective barriers per iteration instead of five; the shard-local
partial sums are arithmetically identical to separate reductions, so the
iterates (and iteration counts) are unchanged.  The norm factor is
hoisted pre-loop (stopping.initial_norm_factor) so the criterion rides
the fused ‖r‖₁ via check_from_norm.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ogl_tpu.config import StoppingConfig
from ogl_tpu.solve import stopping
from ogl_tpu.solve.cg import SolveResult
from ogl_tpu.solve.krylov import Ops

__all__ = ["bicgstab"]


class _Carry(NamedTuple):
    x: Any
    r: Any
    p: Any
    v: Any
    rho_old: Any
    alpha: Any
    omega: Any
    stop: stopping.StopState


def _safe_div(num, den):
    tiny = jnp.asarray(stopping.small_of(num.dtype) ** 2, num.dtype)
    return jnp.where(jnp.abs(den) > tiny, num / jnp.where(den == 0, 1, den), 0.0)


def bicgstab(ops: Ops, b, x0, cfg: StoppingConfig, history_len: int = 0) -> SolveResult:
    dtype = b.dtype
    x0 = jnp.asarray(x0, dtype)
    r0 = b - ops.matvec(x0)
    r_hat = r0  # shadow residual, fixed

    nf = stopping.initial_norm_factor(ops, r0, x0, b)
    one = jnp.asarray(1.0, dtype)
    init = _Carry(
        x=x0, r=r0, p=jnp.zeros_like(b), v=jnp.zeros_like(b),
        rho_old=one, alpha=one, omega=one,
        stop=stopping.init_state(dtype, history_len).replace(norm_factor=nf),
    )
    hard_cap = cfg.max_iter + cfg.frequency

    def cond(c: _Carry):
        return jnp.logical_and(~c.stop.converged, c.stop.iter < hard_cap)

    def body(c: _Carry):
        # fused group 1: ‖r‖₁ (criterion) and rho = <r̂,r> — one psum
        part = ops.allreduce(jnp.stack(
            [jnp.sum(jnp.abs(c.r)), jnp.sum(r_hat * c.r)]))
        absr, rho = part[0], part[1]
        st = stopping.check_from_norm(cfg, c.stop, absr)
        # branchless: see solve/cg.py — masking alpha and omega to 0 on the
        # converged iteration freezes x and r; the while cond exits next.
        conv = st.converged
        zero = jnp.asarray(0.0, dtype)
        beta = _safe_div(rho, c.rho_old) * _safe_div(c.alpha, c.omega)
        p = c.r + beta * (c.p - c.omega * c.v)
        y = ops.precond(p)
        v = ops.matvec(y)
        alpha = jnp.where(conv, zero, _safe_div(rho, ops.dot(r_hat, v)))
        s = c.r - alpha * v
        z = ops.precond(s)
        t = ops.matvec(z)
        # fused group 3: <t,s> and <t,t> — one psum
        tpart = ops.allreduce(jnp.stack([jnp.sum(t * s), jnp.sum(t * t)]))
        omega = jnp.where(conv, zero, _safe_div(tpart[0], tpart[1]))
        return _Carry(
            x=c.x + alpha * y + omega * z,
            r=s - omega * t,
            p=p, v=v, rho_old=rho, alpha=alpha, omega=omega,
            stop=st.replace(iter=st.iter + jnp.where(conv, 0, 1)),
        )

    out = jax.lax.while_loop(cond, body, init)
    return SolveResult(
        x=out.x,
        iters=out.stop.iter,
        init_res_norm=out.stop.init_res_norm,
        final_res_norm=out.stop.res_norm,
        converged=stopping.satisfied(cfg, out.stop),
        history=out.stop.history,
    )
