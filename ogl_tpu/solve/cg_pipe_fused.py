"""Merged-kernel pipelined (Chronopoulos–Gear) PCG for DIA matrices.

Combines the two TPU-first CG variants: the single-reduction rearrangement
of solve/cg_pipe.py (all three per-iteration inner products — γ = <r,u>,
δ = <w,u>, and the criterion's ‖r‖₁ — available simultaneously, ONE fused
reduction point per iteration) with the merged Pallas kernels of
solve/cg_fused.py.  Two kernels per iteration:

  KA  u = M⁻¹r ; w = A u ; (γ, δ, ‖r‖₁) partials     (windowed stencil pass)
  KB  p' = u + β·p ; s' = w + β·s ; x' = x + α·p' ; r' = r − α·s'

Identity preconditioning streams the SAME bytes per iteration as the
classical merged form (u ≡ r: KA = 1 window + coefficients + w write, KB =
5 reads + 4 writes ≈ 19 words/DOF), so the latency win is free of a
bandwidth penalty; Jacobi adds one invd stream to each kernel (~10%).

The distributed variant (solve/cg_fused_dist.make_dist_cg_pipe_fused_fn)
reduces the per-iteration collective count to ONE psum of a (3,) vector —
vs two for the merged classical iteration — plus the surface-sized halo
ppermute, which XLA can overlap with KA (they have no data dependency).
Scalar recurrences and stopping semantics are exactly solve/cg_pipe.py's
(iteration counts match classical CG to rounding order; no reference
analogue — the reference has no single-reduction solver).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ogl_tpu.kernels.fused import CgKernels
from ogl_tpu.solve import stopping
from ogl_tpu.solve.cg import SolveResult

__all__ = ["cg_pipelined_fused"]


class _Carry(NamedTuple):
    xf: Any
    rf: Any
    pf: Any
    sf: Any  # s = A p, by recurrence
    gamma_old: Any
    alpha_old: Any
    stop: stopping.StopState


def cg_pipelined_fused(kern: CgKernels, data3, b, x0, cfg, invd=None,
                       history_len: int = 0) -> SolveResult:
    dtype = kern.dtype
    n = kern.n
    bf = kern.frame(b)
    xf = kern.frame(x0)
    invdf = kern.frame(invd) if invd is not None else None

    rf = bf - kern.apply(data3, xf)

    # norm factor on the initial state (StoppingCriterion.C:32-69), hoisted
    # pre-loop exactly as in solve/cg_pipe.py
    xavg = jnp.sum(xf) / n
    axref = kern.apply(data3, kern.frame(jnp.full((n,), 1.0, dtype) * xavg))
    b_sub = bf - axref
    nf = jnp.sum(jnp.abs(rf - b_sub) + jnp.abs(b_sub)) + stopping.small_of(dtype)
    st0 = stopping.init_state(dtype, history_len).replace(norm_factor=nf)

    one = jnp.asarray(1.0, dtype)
    init = _Carry(xf=xf, rf=rf, pf=jnp.zeros_like(bf), sf=jnp.zeros_like(bf),
                  gamma_old=one, alpha_old=one, stop=st0)
    hard_cap = cfg.max_iter + cfg.frequency

    def cond(c: _Carry):
        return jnp.logical_and(~c.stop.converged, c.stop.iter < hard_cap)

    def body(c: _Carry):
        wf, gamma, delta, absr = kern.ka(data3, c.rf, invdf)
        gamma = gamma.astype(dtype)
        delta = delta.astype(dtype)
        st = stopping.check_from_norm(cfg, c.stop, absr.astype(dtype))
        first = st.iter == 0
        zero = jnp.asarray(0.0, dtype)
        beta = jnp.where(first, zero, gamma / c.gamma_old)
        denom = jnp.where(first, delta, delta - beta * gamma / c.alpha_old)
        # branchless convergence freeze (see solve/cg_pipe.py)
        alpha = jnp.where(st.converged, zero, gamma / denom)
        pf, sf, xf, rf = kern.kb_pipe(wf, c.pf, c.sf, c.xf, c.rf,
                                      alpha, beta, invdf)
        return _Carry(
            xf=xf, rf=rf, pf=pf, sf=sf,
            gamma_old=jnp.where(st.converged, c.gamma_old, gamma),
            alpha_old=jnp.where(st.converged, c.alpha_old, alpha),
            stop=st.replace(iter=st.iter + jnp.where(st.converged, 0, 1)),
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
