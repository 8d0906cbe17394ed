"""Merged-kernel PCG for DIA matrices — two Pallas kernels per iteration.

Semantics are identical to solve/cg.py (same recurrences, same OpenFOAM
stopping criterion and gating, iteration counts match exactly); only the
scheduling differs: each iteration is K1 (p-update + SpMV + δ-dot) and K2
(x/r/z updates + ρ and ‖r‖₁ reductions), so the residual norm the criterion
needs is a free by-product instead of an extra pass.  The preconditioner is
diagonal (none → identity, BJ with maxBlockSize=1 → scalar Jacobi); richer
preconditioners use the general solver path.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ogl_tpu.kernels.fused import CgKernels
from ogl_tpu.solve import stopping
from ogl_tpu.solve.cg import SolveResult

__all__ = ["cg_fused"]


class _Carry(NamedTuple):
    xf: Any
    rf: Any
    zf: Any
    pf: Any
    rho: Any  # <r, z> of the carried r
    rho_old: Any
    absr: Any  # ||r||_1 of the carried r
    stop: stopping.StopState


def cg_fused(kern: CgKernels, data3, b, x0, cfg, invd=None, history_len: int = 0,
             precond_framed=None, identity_min_bytes: int = 90 * 10**6) -> SolveResult:
    """b, x0: flat (n,) arrays.  data3: kern.pack_values(mat) (traced, so
    coefficient updates reuse the compiled program).  invd: optional
    diagonal-preconditioner inverse (flat (n,)); None = identity.
    precond_framed: optional rich preconditioner applied on the FRAMED
    residual (rf -> zf, e.g. an AMG V-cycle whose fine level shares this
    kern's frame geometry) — the whole PCG then stays in the framed layout
    with no per-iteration frame/unframe traffic."""
    dtype = kern.dtype
    n = kern.n
    # identity preconditioning (the unpreconditioned reference default):
    # z ≡ r, so the z stream disappears — K1 reads r directly and K2
    # drops the z write + invd read (8 -> 6 vector streams).  Measured on
    # v5e (pinned-iteration sweeps): 1013 -> 672 µs/iter at 8.4M DOF,
    # 330 -> 194 at 4M, 121 -> 102 at 2M — but a REGRESSION (33 -> 54)
    # at 1M, where the whole working set fits VMEM and XLA keeps the
    # solve VMEM-resident across iterations; the changed liveness (r
    # consumed by both K1 and K2) evidently breaks that placement.  So
    # the z-free variant is gated on the working set exceeding VMEM.
    ws_bytes = kern.workset_bytes()
    identity = (invd is None and precond_framed is None
                and ws_bytes > identity_min_bytes)
    bf = kern.frame(b)
    xf = kern.frame(x0)
    invdf = kern.frame(invd if invd is not None else jnp.ones((n,), dtype))

    rf = bf - kern.apply(data3, xf)
    if identity:
        zf = jnp.zeros((8, 128), dtype)  # placeholder carry leaf
        rho0 = jnp.sum(rf * rf)
    else:
        zf = precond_framed(rf) if precond_framed is not None else invdf * rf
        rho0 = jnp.sum(rf * zf)
    absr0 = jnp.sum(jnp.abs(rf))

    # norm factor (StoppingCriterion.C:32-69) on the initial state
    xavg = jnp.sum(xf) / n
    axref = kern.apply(data3, kern.frame(jnp.full((n,), 1.0, dtype) * xavg))
    b_sub = bf - axref
    nf = jnp.sum(jnp.abs(rf - b_sub) + jnp.abs(b_sub)) + stopping.small_of(dtype)

    st0 = stopping.init_state(dtype, history_len).replace(norm_factor=nf)
    hard_cap = cfg.max_iter + cfg.frequency

    def check(st, absr):
        return stopping.check_from_norm(cfg, st, absr)

    init = _Carry(
        xf=xf, rf=rf, zf=zf, pf=jnp.zeros_like(bf),
        rho=rho0, rho_old=jnp.asarray(1.0, dtype), absr=absr0,
        stop=st0,
    )

    def cond(c: _Carry):
        return jnp.logical_and(~c.stop.converged, c.stop.iter < hard_cap)

    def body(c: _Carry):
        st = check(c.stop, c.absr)
        # BRANCHLESS update: a lax.cond here makes XLA copy the multi-
        # vector carry (~25 MB at 1M) through both branches every
        # iteration — measured 152.8 -> ~65 µs/iter at 1M without it.
        # On the one iteration where converged flips, alpha:=0 freezes
        # x and r (z/ρ/|r| recompute to their carried values); p drifts
        # but is dead — the while cond exits right after.
        conv = st.converged
        beta = jnp.where(st.iter == 0, jnp.asarray(0.0, dtype), c.rho / c.rho_old)
        pf, qf, delta = kern.k1(data3, c.rf if identity else c.zf, c.pf, beta)
        alpha = jnp.where(conv, jnp.asarray(0.0, dtype), c.rho / delta)
        if identity:
            xf, rf, rho_new, absr = kern.k2i(alpha, c.xf, c.rf, pf, qf)
            zf = c.zf
        elif precond_framed is not None:
            # K2 variant without the z/ρ outputs (z comes from the
            # preconditioner cycle; the diagonal z would be dead writes)
            xf, rf, absr = kern.k2n(alpha, c.xf, c.rf, pf, qf)
            zf = precond_framed(rf)
            rho_new = jnp.sum(rf * zf)
        else:
            xf, rf, zf, rho_new, absr = kern.k2(alpha, c.xf, c.rf, pf, qf, invdf)
        return _Carry(
            xf=xf, rf=rf, zf=zf, pf=pf,
            rho=rho_new.astype(dtype), rho_old=c.rho, absr=absr.astype(dtype),
            stop=st.replace(iter=st.iter + jnp.where(conv, 0, 1)),
        )

    out = jax.lax.while_loop(cond, body, init)
    return SolveResult(
        x=kern.unframe(out.xf),
        iters=out.stop.iter,
        init_res_norm=out.stop.init_res_norm,
        final_res_norm=out.stop.res_norm,
        converged=stopping.satisfied(cfg, out.stop),
        history=out.stop.history,
    )
