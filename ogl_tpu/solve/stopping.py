"""OpenFOAM-compatible stopping criterion as loop-carried device state.

Reproduces the reference's `OpenFOAMDistStoppingCriterion`
(StoppingCriterion/StoppingCriterion.C) fully on device — the reference
checks on host every iteration (device→host norm copy); here the check is
part of the `lax.while_loop` carry so a solve is ONE device program.

Semantics mirrored exactly:
  * norm factor (StoppingCriterion.C:32-69): with x̄ = mean(x0) broadcast
    as a constant vector and Axref = A x̄,
        nf = ‖ |r − (b − Axref)| + |b − Axref| ‖₁ + SMALL
    evaluated once at iteration 0 (an extra SpMV, §3.3 of SURVEY.md).
  * gating (StoppingCriterion.C:77-87): no check while 0 < iter < minIter,
    and only every `frequency`-th iteration.
  * stop when iter ≥ maxIter, res < tolerance, or
    relTol > 0 and res < relTol · initial-res (StoppingCriterion.C:123-135).
  * adaptMinIter policy lives host-side between solves (config.StoppingConfig
    .adapted, reference StoppingCriterion.H:199-209).

OpenFOAM's SMALL is precision-dependent (1e-15 double / 1e-6 single); we
follow that per compute dtype.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ogl_tpu.config import StoppingConfig
from ogl_tpu.solve.krylov import Ops

__all__ = ["StopState", "init_state", "check", "check_from_norm",
           "initial_norm_factor", "satisfied", "small_of"]


def small_of(dtype) -> float:
    return 1e-15 if np.dtype(dtype).itemsize >= 8 else 1e-6


def _params_pytree(cls):
    data = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data, [])


@_params_pytree
@dataclasses.dataclass(frozen=True)
class StoppingParams:
    """The runtime stopping controls as a pytree of scalars, so adaptMinIter
    (which changes minIter/frequency between solves) does NOT force a
    recompile — the compiled solver takes these as traced arguments."""

    tolerance: Any
    rel_tol: Any
    min_iter: Any
    max_iter: Any
    frequency: Any

    @staticmethod
    def of(cfg: StoppingConfig) -> "StoppingParams":
        return StoppingParams(
            tolerance=cfg.tolerance,
            rel_tol=cfg.rel_tol,
            min_iter=cfg.min_iter,
            max_iter=cfg.max_iter,
            frequency=cfg.frequency,
        )


def _pytree(cls):
    data = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data, [])


@_pytree
@dataclasses.dataclass(frozen=True)
class StopState:
    iter: Any  # i32 — number of completed solver updates
    converged: Any  # bool
    norm_factor: Any
    init_res_norm: Any  # normalised initial residual
    res_norm: Any  # normalised residual at last check
    # per-iteration residual history (reference `export` support,
    # StoppingCriterion.C:115-117); None unless requested — the None/array
    # choice is static per compiled program
    history: Any = None

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def init_state(dtype, history_len: int = 0) -> StopState:
    one = jnp.asarray(1.0, dtype)
    return StopState(
        iter=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(False),
        norm_factor=one,
        init_res_norm=jnp.asarray(0.0, dtype),
        res_norm=jnp.asarray(0.0, dtype),
        history=jnp.zeros((history_len,), dtype) if history_len > 0 else None,
    )


def _norm_factor(ops: Ops, r, x, b):
    xavg = ops.mean(x)
    axref = ops.matvec(jnp.full_like(x, xavg))
    b_sub = b - axref
    nf = ops.norm1(jnp.abs(r - b_sub) + jnp.abs(b_sub))
    return nf + small_of(r.dtype)


def initial_norm_factor(ops: Ops, r0, x0, b):
    """The OpenFOAM norm factor on the INITIAL state, for solvers that
    hoist it out of the iteration loop (check() computes the same value
    lazily at the first check, whose r/x are the initial ones) so the
    in-loop criterion can ride a fused reduction via check_from_norm
    (StoppingCriterion.C:32-69)."""
    return _norm_factor(ops, r0, x0, b)


def would_check(cfg: StoppingConfig, it):
    """The gating predicate of check() (StoppingCriterion.C:77-87), exposed
    so solvers with expensive residual materialisation (GMRES) can skip
    building r on non-check iterations."""
    skip_min = jnp.logical_and(it > 0, it < cfg.min_iter)
    skip_freq = (it % cfg.frequency) != 0
    return ~(skip_min | skip_freq)


def check(ops: Ops, cfg: StoppingConfig, state: StopState, r, x, b) -> StopState:
    """One criterion evaluation (call once per solver iteration, before the
    update — Ginkgo checks the running recurrence residual)."""
    it = state.iter

    def do_check(state):
        # iteration 0: compute norm factor + initial residual
        def with_nf(state):
            nf = _norm_factor(ops, r, x, b)
            rn0 = ops.norm1(r) / nf
            return state.replace(norm_factor=nf, init_res_norm=rn0, res_norm=rn0)

        def without_nf(state):
            rn = ops.norm1(r) / state.norm_factor
            return state.replace(res_norm=rn)

        state = jax.lax.cond(it == 0, with_nf, without_nf, state)
        rn = state.res_norm
        if state.history is not None:
            idx = jnp.minimum(it, state.history.shape[0] - 1)
            state = state.replace(history=state.history.at[idx].set(rn))
        hit_abs = rn < cfg.tolerance
        hit_rel = jnp.logical_and(cfg.rel_tol > 0, rn < cfg.rel_tol * state.init_res_norm)
        hit_max = it >= cfg.max_iter
        return state.replace(converged=hit_abs | hit_rel | hit_max)

    skip_min = jnp.logical_and(it > 0, it < cfg.min_iter)
    skip_freq = (it % cfg.frequency) != 0
    return jax.lax.cond(skip_min | skip_freq, lambda s: s, do_check, state)


def check_from_norm(cfg: StoppingConfig, state: StopState, absr) -> StopState:
    """Criterion evaluation for solvers whose ‖r‖₁ is a free by-product of
    the iteration (the merged-kernel paths): same gating, tolerance, and
    history semantics as check(), from the raw 1-norm directly."""
    it = state.iter
    dtype = state.res_norm.dtype

    def do_check(st):
        rn = (absr / st.norm_factor).astype(dtype)
        st = jax.lax.cond(
            it == 0,
            lambda s: s.replace(init_res_norm=rn, res_norm=rn),
            lambda s: s.replace(res_norm=rn),
            st,
        )
        if st.history is not None:
            idx = jnp.minimum(it, st.history.shape[0] - 1)
            st = st.replace(history=st.history.at[idx].set(st.res_norm))
        rn = st.res_norm
        hit = (rn < cfg.tolerance) | (
            jnp.logical_and(cfg.rel_tol > 0, rn < cfg.rel_tol * st.init_res_norm)
        ) | (it >= cfg.max_iter)
        return st.replace(converged=hit)

    return jax.lax.cond(would_check(cfg, it), do_check, lambda s: s, state)


def satisfied(cfg: StoppingConfig, state: StopState):
    """TRUE convergence (tolerance criteria met) for solverPerformance.

    StopState.converged is the LOOP-EXIT flag — it is also raised on
    maxIter exhaustion so the while_loop terminates.  OpenFOAM's
    solverPerformance reports converged=false when a solve merely ran out
    of iterations (lduMatrixSolver checkConvergence semantics); this
    derives that truth from the last checked residual."""
    rn = state.res_norm
    return (rn < cfg.tolerance) | jnp.logical_and(
        cfg.rel_tol > 0, rn < cfg.rel_tol * state.init_res_norm)


def final_residual(ops: Ops, state: StopState, x, b):
    """True residual at exit, normalised — what solverPerformance reports as
    finalResidual."""
    r = b - ops.matvec(x)
    return ops.norm1(r) / state.norm_factor
