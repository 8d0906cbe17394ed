"""Merged-kernel distributed PCG: the two-Pallas-kernel CG iteration
(solve/cg_fused.py) running per shard inside shard_map, with the halo
exchange folded INTO the iteration (reference: Ginkgo's distributed
Matrix::apply does local SpMV + sparse_communicator sends inside
solver->apply, CsrMatrixWrapper.H:138-210).

Per iteration, per shard:
  hz   = ppermute-exchange of z's interface values        (surface-sized)
  hp'  = hz + β·hp'_prev        (the halo of p' by the CG recurrence —
                                 avoids recomputing p' before K1)
  K1   p' = z + β·p ; q = A_local p' ; δ₁ = Σ p'·q         (fused Pallas)
  q   += A_halo hp' ; δ₂ = Σ halo-contrib ⊙ p'             (surface-sized)
  α    = ρ / psum(δ₁ + δ₂)
  K2   x,r,z updates ; ρ' and ‖r‖₁ partials                (fused Pallas)
  ρ', ‖r‖₁ ← psum                                          (replicated)

The stopping criterion state is replicated (all reductions psum'd), so the
while_loop takes the same path on every shard (SPMD-safe).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ogl_tpu.core.formats import Dia
from ogl_tpu.dist.partition import DiaStack, DistMatrix, HaloPlan
from ogl_tpu.kernels.fused import CgKernels
from ogl_tpu.kernels.pallas_spmv import LANES
from ogl_tpu.solve import stopping
from ogl_tpu.solve.cg import SolveResult

__all__ = ["dist_cg_fused", "make_dist_cg_pipe_fused_fn"]


class _Carry(NamedTuple):
    xf: Any
    rf: Any
    zf: Any
    pf: Any
    hp: Any  # halo buffer of p' (maintained by the CG recurrence)
    rho: Any
    rho_old: Any
    absr: Any
    stop: stopping.StopState


class _PipeCarry(NamedTuple):
    xf: Any
    rf: Any
    pf: Any
    sf: Any  # s = A p, by recurrence (solve/cg_pipe.py)
    gamma_old: Any
    alpha_old: Any
    stop: stopping.StopState


def _exchange_framed(xf, plan: HaloPlan, axis: str, frame_off: int):
    """Halo exchange reading interface values straight out of the framed
    vector (flat frame index of local row r is frame_off + r).  Takes the
    affine slice/matmul route when the plan carries run descriptors
    (dist.affine — XLA's index gathers are element-serial on TPU), else
    the generic gather/scatter route."""
    my = jax.lax.axis_index(axis)
    if plan.send_affine is not None:
        from ogl_tpu.dist.affine import affine_exchange

        return affine_exchange(
            xf, plan.send_affine, plan.recv_affine, plan.offsets,
            plan.halo_size, plan.n_parts, axis, my,
            row_off=frame_off // LANES)
    flat = xf.reshape(-1)
    h = jnp.zeros((plan.halo_size + 1,), flat.dtype)
    p = plan.n_parts
    for off, sidx, rpos in zip(plan.offsets, plan.send_idx, plan.recv_pos):
        payload = jnp.take(flat, frame_off + sidx[my], axis=0)
        perm = [(i, (i + off) % p) for i in range(p)]
        recvd = jax.lax.ppermute(payload, axis, perm)
        h = h.at[rpos[my]].set(recvd)
    return h[: plan.halo_size]


def _halo_corr(qf, poutf, h, halo, frame_off: int, affine=None,
               vals_slot_order=None, affine_axis: str = "x"):
    """Add the non-local contribution to the framed q and return the δ
    correction Σ contrib ⊙ p' (all surface-sized work; pads are 0-valued).
    With an ApplyAffine descriptor (+ values pre-permuted to slot order,
    done once per solve) the scatter/gathers become slices/matmuls."""
    if affine is not None:
        from ogl_tpu.dist.affine import affine_apply

        my = jax.lax.axis_index(affine_axis)
        return affine_apply(qf, poutf, h, vals_slot_order, affine.rows, my,
                            row_off=frame_off // LANES)
    rows, cols, vals = halo
    contrib = vals.astype(qf.dtype) * jnp.take(h, cols, axis=0)
    flat_idx = frame_off + rows
    qf = qf.reshape(-1).at[flat_idx].add(contrib).reshape(qf.shape)
    d2 = jnp.sum(contrib * jnp.take(poutf.reshape(-1), flat_idx, axis=0))
    return qf, d2


def dist_cg_fused(
    dm: DistMatrix,
    b_stack,
    x0_stack,
    cfg,
    mesh: Mesh,
    axis: str = "x",
    invd_stack=None,
    tile: int = 512,
    interpret: bool = False,
) -> SolveResult:
    """Distributed merged-kernel PCG over `mesh` (one-shot wrapper around
    make_dist_cg_fused_fn; persistent callers should cache the built fn)."""
    fn = make_dist_cg_fused_fn(dm, mesh, axis=axis,
                               use_invd=invd_stack is not None,
                               tile=tile, interpret=interpret)
    return fn(dm.local, dm.halo, b_stack, x0_stack, invd_stack, cfg)


def make_dist_cg_fused_fn(
    dm: DistMatrix,
    mesh: Mesh,
    axis: str = "x",
    use_invd: bool = False,
    tile: int = 512,
    interpret: bool = False,
    identity_min_bytes: int = 90 * 10**6,
):
    """Build ONCE the jitted distributed merged-kernel PCG program.
    Requires a DiaStack (fast stencil path) or GdiaStack (lane-gather
    path) local operator; diagonal (Schwarz-Jacobi) or identity
    preconditioning.  The returned
    fn(local, halo, b_stack, x0_stack, invd_stack, stopping_params)
    treats all values and stopping controls as traced arguments so
    steady-state solves reuse the compiled program.  Semantics match
    solve/cg.py + the OpenFOAM criterion."""
    n_local = dm.n_local
    spill_tabs = None  # XellStack only: stacked per-shard spill tables
    if isinstance(dm.local, DiaStack):
        kern = CgKernels(n_local, dm.local.offsets, tile, interpret)

        def _pack(local):
            return kern.pack_values(Dia(
                data=local.data[0], offsets=dm.local.offsets,
                shape=(n_local, n_local)))
    elif type(dm.local).__name__ == "XellStack":
        from ogl_tpu.dist.partition import (shard_local_matrix,
                                            xell_stack_spill_tables)
        from ogl_tpu.kernels.xell import XellCgKernels

        st = dm.local
        kern = XellCgKernels(n_local, st.n_tiles, st.n_slots, st.c_chunks,
                             st.c_left, interpret)
        # per-shard spill tables need the CONCRETE spill structure; in a
        # multi-process build the staged stack is globally sharded (other
        # processes' shards not addressable) — fall back to k1's XLA
        # scatter-add spill there (surface-sized per shard, exact)
        if getattr(st.spill_rows, "is_fully_addressable", True):
            tabs = xell_stack_spill_tables(st)
            if tabs is not None:
                spill_tabs = (jnp.asarray(tabs[0]), jnp.asarray(tabs[1]))

        def _pack(local):
            return kern.pack_values(shard_local_matrix(local, n_local))
    else:
        from ogl_tpu.dist.partition import GdiaStack
        from ogl_tpu.kernels.fused import GdiaCgKernels
        from ogl_tpu.kernels.gdia import Gdia as _Gdia

        if not isinstance(dm.local, GdiaStack):
            raise TypeError("dist_cg_fused needs a DiaStack, GdiaStack, or "
                            "XellStack local operator")
        kern = GdiaCgKernels(n_local, dm.local.plane_offsets, tile,
                             interpret)

        def _pack(local):
            return kern.pack_values(_Gdia(
                vals=local.vals[0], lidx=local.lidx[0],
                plane_offsets=dm.local.plane_offsets,
                shape=(n_local, n_local)))
    # z-free identity variant only when the per-shard working set exceeds
    # VMEM (see solve/cg_fused.py for the measured crossover)
    identity = (not use_invd
                and kern.workset_bytes() > identity_min_bytes)
    frame_off = kern.frame_offset
    global_n = dm.global_n
    dtype = kern.dtype
    plan = dm.plan
    local_sizes = dm.local_sizes
    n_parts = dm.n_parts

    def psum(v):
        return jax.lax.psum(v, axis)

    aff = dm.apply_affine if plan.send_affine is not None else None
    e_true = dm.halo_sizes[0] if dm.halo_sizes else 0

    def shard_body(local, halo_s, b, x0, invd, sp, *sp_tabs):
        data3 = _pack(local)
        if sp_tabs:
            # per-shard spill tables (XellStack): indices static-shaped,
            # values gathered from this shard's flat value vector (−1 =
            # unused slot → value 0, numerically inert)
            g = sp_tabs[1][0]
            sval = jnp.where(
                g >= 0,
                jnp.take(local.vals[0], jnp.clip(g, 0),
                         mode="clip").astype(jnp.float32),
                0.0)
            _ts = (sp_tabs[0][0], sval)

            def _k1(d3, zf_, pf_, beta_):
                return kern.k1(d3, zf_, pf_, beta_, spill_ts=_ts)
        else:
            _k1 = kern.k1
        halo = (halo_s.rows[0], halo_s.cols[0], halo_s.vals[0])
        bf = kern.frame(b[0].astype(dtype))
        xf = kern.frame(x0[0].astype(dtype))
        invdf = kern.frame(invd[0].astype(dtype)) if use_invd \
            else kern.frame(jnp.ones((n_local,), dtype))
        # slot-ordered halo values, permuted ONCE per solve (outside the
        # iteration loop) so the affine apply touches no per-iter gather
        vals_so = None
        if aff is not None and plan.offsets:
            vals_so = jnp.take(halo[2][:e_true],
                               aff.entry_perm[jax.lax.axis_index(axis)],
                               axis=0)

        def corr(qf, poutf, h):
            return _halo_corr(qf, poutf, h, halo, frame_off, affine=aff,
                              vals_slot_order=vals_so, affine_axis=axis)

        def dist_apply(vf):
            _, qf, _ = _k1(data3, vf, vf, 0.0)
            if plan.offsets:
                h = _exchange_framed(vf, plan, axis, frame_off)
                qf, _ = corr(qf, vf, h)
            return qf

        rf = bf - dist_apply(xf)
        # identity preconditioning (z ≡ r): the z stream disappears — K1
        # reads r, K2 drops the z write + invd read.  Gated on the shard
        # working set exceeding VMEM, exactly as in solve/cg_fused.py
        # (below that the VMEM-resident z-carried loop is faster).
        if identity:
            zf = jnp.zeros((8, LANES), dtype)  # placeholder carry leaf
            rho0 = psum(jnp.sum(rf * rf))
        else:
            zf = invdf * rf
            rho0 = psum(jnp.sum(rf * zf))
        absr0 = psum(jnp.sum(jnp.abs(rf)))

        # OpenFOAM norm factor on the initial state (StoppingCriterion.C:32-69)
        xavg = psum(jnp.sum(xf)) / global_n
        # reference vector is 1 on the shard's TRUE rows, 0 on pad rows
        # (pad columns of the local operator are structurally zero today,
        # but identity-padded operators would silently shift the norm)
        true_n = jnp.asarray(local_sizes)[jax.lax.axis_index(axis)]
        ones_local = jnp.where(jnp.arange(n_local) < true_n, 1.0, 0.0).astype(dtype)
        axref = dist_apply(kern.frame(ones_local * xavg))
        b_sub = bf - axref
        nf = psum(jnp.sum(jnp.abs(rf - b_sub) + jnp.abs(b_sub))) + stopping.small_of(dtype)

        st0 = stopping.init_state(dtype, 0).replace(norm_factor=nf)

        def check(st, absr):
            # `sp` is the stopping-params pytree threaded through shard_map
            # (keeps adaptMinIter changes traced, no retrace)
            return stopping.check_from_norm(sp, st, absr)

        init = _Carry(
            xf=xf, rf=rf, zf=zf, pf=jnp.zeros_like(bf),
            hp=jnp.zeros((plan.halo_size,), dtype),
            rho=rho0.astype(dtype), rho_old=jnp.asarray(1.0, dtype),
            absr=absr0.astype(dtype), stop=st0,
        )

        hard_cap = sp.max_iter + sp.frequency  # traced: adaptMinIter-safe

        def cond(c: _Carry):
            return jnp.logical_and(~c.stop.converged, c.stop.iter < hard_cap)

        def body(c: _Carry):
            st = check(c.stop, c.absr)
            # branchless: see solve/cg_fused.py — a lax.cond here copies
            # the multi-vector carry through both branches every iteration;
            # alpha:=0 on the converged iteration freezes x and r, and
            # `converged` is replicated so every rank still reaches the
            # psums in step.
            conv = st.converged
            beta = jnp.where(st.iter == 0, jnp.asarray(0.0, dtype),
                             c.rho / c.rho_old)
            zlike = c.rf if identity else c.zf
            if plan.offsets:
                hz = _exchange_framed(zlike, plan, axis, frame_off)
                hp = hz + beta * c.hp
            else:
                hp = c.hp
            pf, qf, d1 = _k1(data3, zlike, c.pf, beta)
            if plan.offsets:
                qf, d2 = corr(qf, pf, hp)
                delta = psum(d1 + d2)
            else:
                delta = psum(d1)
            alpha = jnp.where(conv, jnp.asarray(0.0, dtype),
                              c.rho / delta.astype(dtype))
            if identity:
                xf, rf, rho_new, absr = kern.k2i(alpha, c.xf, c.rf, pf, qf)
                zf = c.zf
            else:
                xf, rf, zf, rho_new, absr = kern.k2(
                    alpha, c.xf, c.rf, pf, qf, invdf)
            # one psum for the K2 reduction group: rho' and ||r'||_1 are
            # both shard-local partials of the same carried r', so they
            # ride a single (2,) collective (same grouping as the
            # classical paths' fused reductions; 3 -> 2 barriers/iter)
            rho_absr = psum(jnp.stack([rho_new, absr]))
            return _Carry(
                xf=xf, rf=rf, zf=zf, pf=pf, hp=hp,
                rho=rho_absr[0].astype(dtype), rho_old=c.rho,
                absr=rho_absr[1].astype(dtype),
                stop=st.replace(iter=st.iter + jnp.where(conv, 0, 1)),
            )

        out = jax.lax.while_loop(cond, body, init)
        return (
            kern.unframe(out.xf)[None],
            out.stop.iter,
            out.stop.init_res_norm,
            out.stop.res_norm,
            stopping.satisfied(sp, out.stop),
        )

    spec = P(axis)
    n_tabs = 2 if spill_tabs is not None else 0
    mapped = jax.jit(jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, P()) + (spec,) * n_tabs,
        out_specs=(spec, P(), P(), P(), P()),
        check_vma=False,
    ))

    def run(local, halo, b_stack, x0_stack, invd_stack, sp):
        invd_arg = invd_stack if invd_stack is not None else jnp.ones(
            (n_parts, n_local), dtype)
        extra = spill_tabs if spill_tabs is not None else ()
        x, iters, init_rn, final_rn, conv = mapped(
            local, halo, b_stack, x0_stack, invd_arg, sp, *extra)
        return SolveResult(x=x, iters=iters, init_res_norm=init_rn,
                           final_res_norm=final_rn, converged=conv)

    return run


def make_dist_cg_pipe_fused_fn(
    dm: DistMatrix,
    mesh: Mesh,
    axis: str = "x",
    use_invd: bool = False,
    tile: int = 512,
    interpret: bool = False,
):
    """Distributed merged-kernel PIPELINED (Chronopoulos–Gear) PCG: ONE
    psum of a (3,) vector per iteration (solve/cg_pipe_fused.py docstring)
    — vs two for make_dist_cg_fused_fn — plus the surface-sized halo
    ppermute of r's interface values, which has no data dependency on the
    KA stencil pass and can be overlapped by the scheduler.

    Jacobi (Schwarz-diagonal) preconditioning exchanges invd's interface
    values ONCE at setup; per-iteration halo-u is then the exchanged r
    scaled by the resident invd_halo.  Semantics = solve/cg_pipe.py
    (iteration counts match classical CG to rounding order)."""
    if not isinstance(dm.local, DiaStack):
        raise TypeError("dist_cg_pipe_fused needs a DiaStack local operator")
    n_local = dm.n_local
    kern = CgKernels(n_local, dm.local.offsets, tile, interpret)
    frame_off = kern.tile * LANES
    global_n = dm.global_n
    dtype = kern.dtype
    plan = dm.plan
    local_sizes = dm.local_sizes
    n_parts = dm.n_parts

    def psum(v):
        return jax.lax.psum(v, axis)

    aff = dm.apply_affine if plan.send_affine is not None else None
    e_true = dm.halo_sizes[0] if dm.halo_sizes else 0

    def shard_body(local, halo_s, b, x0, invd, sp):
        data3 = kern.pack_values(
            Dia(data=local.data[0], offsets=dm.local.offsets,
                shape=(n_local, n_local)))
        halo = (halo_s.rows[0], halo_s.cols[0], halo_s.vals[0])
        hrows = halo[0]
        bf = kern.frame(b[0].astype(dtype))
        xf = kern.frame(x0[0].astype(dtype))
        invdf = kern.frame(invd[0].astype(dtype)) if use_invd else None
        vals_so = None
        if aff is not None and plan.offsets:
            vals_so = jnp.take(halo[2][:e_true],
                               aff.entry_perm[jax.lax.axis_index(axis)],
                               axis=0)

        def corr(qf, poutf, h):
            return _halo_corr(qf, poutf, h, halo, frame_off, affine=aff,
                              vals_slot_order=vals_so, affine_axis=axis)

        # invd at the halo columns (remote rows), exchanged once
        if use_invd and plan.offsets:
            invd_halo = _exchange_framed(invdf, plan, axis, frame_off)
        else:
            invd_halo = None
        # invd at this shard's halo-corrected rows (static gather; only
        # the generic route needs it — the affine route slices u framed)
        if use_invd and aff is None:
            invd_at_rows = jnp.take(invdf.reshape(-1), frame_off + hrows,
                                    axis=0)
        else:
            invd_at_rows = None

        def dist_apply(vf):
            _, qf, _ = kern.k1(data3, vf, vf, 0.0)
            if plan.offsets:
                h = _exchange_framed(vf, plan, axis, frame_off)
                qf, _ = corr(qf, vf, h)
            return qf

        rf = bf - dist_apply(xf)

        xavg = psum(jnp.sum(xf)) / global_n
        true_n = jnp.asarray(local_sizes)[jax.lax.axis_index(axis)]
        ones_local = jnp.where(jnp.arange(n_local) < true_n, 1.0, 0.0).astype(dtype)
        axref = dist_apply(kern.frame(ones_local * xavg))
        b_sub = bf - axref
        nf = psum(jnp.sum(jnp.abs(rf - b_sub) + jnp.abs(b_sub))) + stopping.small_of(dtype)
        st0 = stopping.init_state(dtype, 0).replace(norm_factor=nf)

        one = jnp.asarray(1.0, dtype)
        init = _PipeCarry(
            xf=xf, rf=rf, pf=jnp.zeros_like(bf), sf=jnp.zeros_like(bf),
            gamma_old=one, alpha_old=one, stop=st0)
        hard_cap = sp.max_iter + sp.frequency

        def cond(c: _PipeCarry):
            return jnp.logical_and(~c.stop.converged, c.stop.iter < hard_cap)

        def body(c: _PipeCarry):
            # KA and the halo exchange are independent (both read only
            # c.rf): the ppermute can overlap the stencil pass
            wf, gamma, delta, absr = kern.ka(data3, c.rf, invdf)
            if plan.offsets:
                hr = _exchange_framed(c.rf, plan, axis, frame_off)
                hu = hr * invd_halo if use_invd else hr
                if aff is not None:
                    # delta correction needs sum(contrib * u[rows]) with
                    # u = invd*r; the framed product only materializes at
                    # the sliced surface rows after fusion
                    uf = invdf * c.rf if use_invd else c.rf
                    wf, d2 = corr(wf, uf, hu)
                    delta = delta + d2
                else:
                    rows, cols, vals = halo
                    contrib = vals.astype(wf.dtype) * jnp.take(hu, cols,
                                                               axis=0)
                    flat = frame_off + rows
                    wf = wf.reshape(-1).at[flat].add(contrib).reshape(wf.shape)
                    u_at = jnp.take(c.rf.reshape(-1), flat, axis=0)
                    if use_invd:
                        u_at = u_at * invd_at_rows
                    delta = delta + jnp.sum(contrib * u_at)
            # THE single fused reduction of the pipelined iteration
            part = psum(jnp.stack([gamma.astype(dtype), delta.astype(dtype),
                                   absr.astype(dtype)]))
            gamma_g, delta_g, absr_g = part[0], part[1], part[2]
            st = stopping.check_from_norm(sp, c.stop, absr_g)
            first = st.iter == 0
            zero = jnp.asarray(0.0, dtype)
            beta = jnp.where(first, zero, gamma_g / c.gamma_old)
            denom = jnp.where(first, delta_g,
                              delta_g - beta * gamma_g / c.alpha_old)
            alpha = jnp.where(st.converged, zero, gamma_g / denom)
            pf, sf, xf, rf = kern.kb_pipe(wf, c.pf, c.sf, c.xf, c.rf,
                                          alpha, beta, invdf)
            return _PipeCarry(
                xf=xf, rf=rf, pf=pf, sf=sf,
                gamma_old=jnp.where(st.converged, c.gamma_old, gamma_g),
                alpha_old=jnp.where(st.converged, c.alpha_old, alpha),
                stop=st.replace(iter=st.iter + jnp.where(st.converged, 0, 1)),
            )

        out = jax.lax.while_loop(cond, body, init)
        return (
            kern.unframe(out.xf)[None],
            out.stop.iter,
            out.stop.init_res_norm,
            out.stop.res_norm,
            stopping.satisfied(sp, out.stop),
        )

    spec = P(axis)
    mapped = jax.jit(jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, P()),
        out_specs=(spec, P(), P(), P(), P()),
        check_vma=False,
    ))

    def run(local, halo, b_stack, x0_stack, invd_stack, sp):
        invd_arg = invd_stack if invd_stack is not None else jnp.ones(
            (n_parts, n_local), dtype)
        x, iters, init_rn, final_rn, conv = mapped(
            local, halo, b_stack, x0_stack, invd_arg, sp)
        return SolveResult(x=x, iters=iters, init_res_norm=init_rn,
                           final_res_norm=final_rn, converged=conv)

    return run
