"""Merged-CG Pallas kernels for the DIA (stencil) path.

Classical PCG costs ~11+ HBM vector passes per iteration when every
axpy/dot is its own kernel.  The merged formulation (standard in GPU CG
literature, mapped here onto the TPU pipeline) needs exactly two kernels:

  K1  p' = z + β·p ;  q = A p' ;  δ = Σ p'·q
  K2  x' = x + α·p' ;  r' = r − α·q ;  z' = M⁻¹r' (diagonal M) ;
      ρ' = Σ r'·z' ;  s = Σ|r'|         (residual 1-norm comes out FREE)

Layout: every vector lives in a halo-framed (Rp + 2T, 128) array whose top
and bottom T rows are zero — one full tile of halo on each side.  K1's
shifted stencil reads then stay inside the frame with STATIC offsets, and
both kernels re-write the zero halo tiles themselves, so frames never need
re-padding between iterations.  Scalar reductions emit per-tile (8, 128)
lane partials summed outside the pallas_call (TPU block divisibility; SMEM
outputs fault on this toolchain).  f32 with f32 accumulate.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ogl_tpu.core.formats import Dia
from ogl_tpu.kernels.pallas_spmv import LANES

__all__ = ["CgKernels", "GdiaCgKernels", "make_cg_kernels"]


def _k1_kernel(z_hbm, p_hbm, beta_ref, data_ref, pout_ref, q_ref, delta_ref,
               zs, ps, zsem, psem, *, offsets, T, K, grid):
    """Tile t covers frame rows [t·T, (t+1)·T); tiles 0 and grid-1 are the
    zero halo.  The z/p window spans frame rows [t·T−K, (t+1)·T+K)."""
    t = pl.program_id(0)
    two = jnp.asarray(2, jnp.int32)
    # int32 explicitly: under jax_enable_x64 program_id/rem can carry i64,
    # which Mosaic rejects as a memref slice index
    t = jnp.asarray(t, jnp.int32)
    slot = jax.lax.rem(t, two)
    interior = jnp.logical_and(t > 0, t < grid - 1)

    def dma(tile_idx, s):
        s = jnp.asarray(s, jnp.int32)  # literal slots are i64 under x64
        # clamp BOTH ends: only the (compute-skipped) halo tiles ever hit the
        # clamps; an unclamped last-tile window would overrun the frame by K
        # int32 explicitly: under jax_enable_x64 the clip promotes to
        # i64, which Mosaic's memref_slice rejects on hardware
        start = jnp.clip(tile_idx * T - K, 0,
                         grid * T - (T + 2 * K)).astype(jnp.int32)
        cz = pltpu.make_async_copy(
            z_hbm.at[pl.ds(start, T + 2 * K), :], zs.at[s], zsem.at[s])
        cp = pltpu.make_async_copy(
            p_hbm.at[pl.ds(start, T + 2 * K), :], ps.at[s], psem.at[s])
        return cz, cp

    @pl.when(t == 0)
    def _():
        for c in dma(0, 0):
            c.start()

    @pl.when(t + 1 < grid)
    def _():
        nxt = jax.lax.rem(t + 1, two)
        for c in dma(t + 1, nxt):
            c.start()

    for c in dma(t, slot):
        c.wait()

    @pl.when(jnp.logical_not(interior))
    def _():
        pout_ref[:] = jnp.zeros((T, LANES), pout_ref.dtype)
        q_ref[:] = jnp.zeros((T, LANES), q_ref.dtype)
        delta_ref[:] = jnp.zeros((8, LANES), jnp.float32)

    @pl.when(interior)
    def _():
        beta = beta_ref[0, 0]
        pw = zs[slot] + beta * ps[slot]  # (T+2K, LANES)
        center = pw[K : K + T, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
        acc = jnp.zeros((T, LANES), jnp.float32)
        for k, off in enumerate(offsets):
            qr, rm = divmod(off, LANES)
            base = K + qr
            a = pw[base : base + T, :]
            if rm == 0:
                sh = a
            else:
                b = pw[base + 1 : base + 1 + T, :]
                ar = pltpu.roll(a, jnp.asarray(LANES - rm, jnp.int32), 1)
                br = pltpu.roll(b, jnp.asarray(LANES - rm, jnp.int32), 1)
                sh = jnp.where(lane < LANES - rm, ar, br)
            acc = acc + data_ref[k].astype(jnp.float32) * sh.astype(jnp.float32)
        pout_ref[:] = center.astype(pout_ref.dtype)
        q_ref[:] = acc.astype(q_ref.dtype)
        # per-tile partial of p'.q, lane-reduced; row 0 of an (8, LANES)
        # block (TPU block shapes must be (8,128)-divisible), summed outside
        delta_ref[:] = jnp.pad(
            jnp.sum(acc * center.astype(jnp.float32), axis=0, keepdims=True),
            ((0, 7), (0, 0)),
        )


def _k1_gdia_kernel(z_hbm, p_hbm, beta_ref, vals_ref, lidx_ref, pout_ref,
                    q_ref, delta_ref, zs, ps, zsem, psem,
                    *, plane_offsets, T, K, grid):
    """K1 for Gdia matrices: the A-apply uses per-plane lane gathers
    instead of static lane rolls (see kernels/gdia.py)."""
    t = pl.program_id(0)
    two = jnp.asarray(2, jnp.int32)
    # int32 explicitly: under jax_enable_x64 program_id/rem can carry i64,
    # which Mosaic rejects as a memref slice index
    t = jnp.asarray(t, jnp.int32)
    slot = jax.lax.rem(t, two)
    interior = jnp.logical_and(t > 0, t < grid - 1)

    def dma(tile_idx, s):
        s = jnp.asarray(s, jnp.int32)  # literal slots are i64 under x64
        # int32 explicitly: under jax_enable_x64 the clip promotes to
        # i64, which Mosaic's memref_slice rejects on hardware
        start = jnp.clip(tile_idx * T - K, 0,
                         grid * T - (T + 2 * K)).astype(jnp.int32)
        cz = pltpu.make_async_copy(
            z_hbm.at[pl.ds(start, T + 2 * K), :], zs.at[s], zsem.at[s])
        cp = pltpu.make_async_copy(
            p_hbm.at[pl.ds(start, T + 2 * K), :], ps.at[s], psem.at[s])
        return cz, cp

    @pl.when(t == 0)
    def _():
        for c in dma(0, 0):
            c.start()

    @pl.when(t + 1 < grid)
    def _():
        nxt = jax.lax.rem(t + 1, two)
        for c in dma(t + 1, nxt):
            c.start()

    for c in dma(t, slot):
        c.wait()

    @pl.when(jnp.logical_not(interior))
    def _():
        pout_ref[:] = jnp.zeros((T, LANES), pout_ref.dtype)
        q_ref[:] = jnp.zeros((T, LANES), q_ref.dtype)
        delta_ref[:] = jnp.zeros((8, LANES), jnp.float32)

    @pl.when(interior)
    def _():
        beta = beta_ref[0, 0]
        pw = zs[slot] + beta * ps[slot]
        center = pw[K : K + T, :]
        acc = jnp.zeros((T, LANES), jnp.float32)
        for p, qv in enumerate(plane_offsets):
            base = K + qv
            shifted = pw[base : base + T, :]
            g = jnp.take_along_axis(shifted, lidx_ref[p].astype(jnp.int32), axis=1)
            acc = acc + vals_ref[p].astype(jnp.float32) * g.astype(jnp.float32)
        pout_ref[:] = center.astype(pout_ref.dtype)
        q_ref[:] = acc.astype(q_ref.dtype)
        delta_ref[:] = jnp.pad(
            jnp.sum(acc * center.astype(jnp.float32), axis=0, keepdims=True),
            ((0, 7), (0, 0)),
        )


def _stencil_acc(pw, data_ref, offsets, T, K):
    """Shared A-apply over a (T+2K, LANES) window: static sublane slices +
    lane rolls per diagonal (see module docstring)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
    acc = jnp.zeros((T, LANES), jnp.float32)
    for k, off in enumerate(offsets):
        qr, rm = divmod(off, LANES)
        base = K + qr
        a = pw[base : base + T, :]
        if rm == 0:
            sh = a
        else:
            b = pw[base + 1 : base + 1 + T, :]
            ar = pltpu.roll(a, jnp.asarray(LANES - rm, jnp.int32), 1)
            br = pltpu.roll(b, jnp.asarray(LANES - rm, jnp.int32), 1)
            sh = jnp.where(lane < LANES - rm, ar, br)
        acc = acc + data_ref[k].astype(jnp.float32) * sh.astype(jnp.float32)
    return acc


def _sweep_kernel(x_hbm, coef_ref, data_ref, b_ref, invd_ref, out_ref,
                  xs, sem, *, offsets, T, K, grid):
    """Fused Jacobi sweep: out = x + relax·D⁻¹·(b − A x), one A pass.
    The AMG smoother's hot op — unfused it costs an SpMV plus several
    full-vector elementwise passes (pad/reshape/update)."""
    t = pl.program_id(0)
    two = jnp.asarray(2, jnp.int32)
    # int32 explicitly: under jax_enable_x64 program_id/rem can carry i64,
    # which Mosaic rejects as a memref slice index
    t = jnp.asarray(t, jnp.int32)
    slot = jax.lax.rem(t, two)
    interior = jnp.logical_and(t > 0, t < grid - 1)

    def dma(tile_idx, s):
        s = jnp.asarray(s, jnp.int32)  # literal slots are i64 under x64
        # int32 explicitly: under jax_enable_x64 the clip promotes to
        # i64, which Mosaic's memref_slice rejects on hardware
        start = jnp.clip(tile_idx * T - K, 0,
                         grid * T - (T + 2 * K)).astype(jnp.int32)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, T + 2 * K), :], xs.at[s], sem.at[s])

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < grid)
    def _():
        dma(t + 1, jax.lax.rem(t + 1, two)).start()

    dma(t, slot).wait()

    @pl.when(jnp.logical_not(interior))
    def _():
        out_ref[:] = jnp.zeros((T, LANES), out_ref.dtype)

    @pl.when(interior)
    def _():
        relax = coef_ref[0, 0]
        xw = xs[slot]
        center = xw[K : K + T, :].astype(jnp.float32)
        acc = _stencil_acc(xw, data_ref, offsets, T, K)
        upd = center + relax * invd_ref[:].astype(jnp.float32) * (
            b_ref[:].astype(jnp.float32) - acc)
        out_ref[:] = upd.astype(out_ref.dtype)


def _resid_kernel(x_hbm, data_ref, b_ref, out_ref, xs, sem,
                  *, offsets, T, K, grid):
    """Fused residual: out = b − A x, one A pass."""
    t = pl.program_id(0)
    two = jnp.asarray(2, jnp.int32)
    # int32 explicitly: under jax_enable_x64 program_id/rem can carry i64,
    # which Mosaic rejects as a memref slice index
    t = jnp.asarray(t, jnp.int32)
    slot = jax.lax.rem(t, two)
    interior = jnp.logical_and(t > 0, t < grid - 1)

    def dma(tile_idx, s):
        s = jnp.asarray(s, jnp.int32)  # literal slots are i64 under x64
        # int32 explicitly: under jax_enable_x64 the clip promotes to
        # i64, which Mosaic's memref_slice rejects on hardware
        start = jnp.clip(tile_idx * T - K, 0,
                         grid * T - (T + 2 * K)).astype(jnp.int32)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, T + 2 * K), :], xs.at[s], sem.at[s])

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < grid)
    def _():
        dma(t + 1, jax.lax.rem(t + 1, two)).start()

    dma(t, slot).wait()

    @pl.when(jnp.logical_not(interior))
    def _():
        out_ref[:] = jnp.zeros((T, LANES), out_ref.dtype)

    @pl.when(interior)
    def _():
        xw = xs[slot]
        acc = _stencil_acc(xw, data_ref, offsets, T, K)
        out_ref[:] = (b_ref[:].astype(jnp.float32) - acc).astype(out_ref.dtype)


def _k1b_kernel(a_hbm, b_hbm, c_hbm, coef_ref, rhat_ref, data_ref,
                cout_ref, q_ref, dots_ref, asv, bsv, csv, sems,
                *, offsets, T, K, grid):
    """Generalised merged step for BiCGStab:
        w  = a + ca·b + cb·c          (on the halo window)
        q  = A w
        dots = (Σ r̂⊙q, Σ q⊙w, Σ q⊙q)
    outputs: center(w), q, per-tile dot partials (8, LANES each, stacked).
    """
    t = pl.program_id(0)
    two = jnp.asarray(2, jnp.int32)
    # int32 explicitly: under jax_enable_x64 program_id/rem can carry i64,
    # which Mosaic rejects as a memref slice index
    t = jnp.asarray(t, jnp.int32)
    slot = jax.lax.rem(t, two)
    interior = jnp.logical_and(t > 0, t < grid - 1)

    def dma(tile_idx, s):
        s = jnp.asarray(s, jnp.int32)  # literal slots are i64 under x64
        # int32 explicitly: under jax_enable_x64 the clip promotes to
        # i64, which Mosaic's memref_slice rejects on hardware
        start = jnp.clip(tile_idx * T - K, 0,
                         grid * T - (T + 2 * K)).astype(jnp.int32)
        return (
            pltpu.make_async_copy(a_hbm.at[pl.ds(start, T + 2 * K), :], asv.at[s], sems.at[s, 0]),
            pltpu.make_async_copy(b_hbm.at[pl.ds(start, T + 2 * K), :], bsv.at[s], sems.at[s, 1]),
            pltpu.make_async_copy(c_hbm.at[pl.ds(start, T + 2 * K), :], csv.at[s], sems.at[s, 2]),
        )

    @pl.when(t == 0)
    def _():
        for c in dma(0, 0):
            c.start()

    @pl.when(t + 1 < grid)
    def _():
        nxt = jax.lax.rem(t + 1, two)
        for c in dma(t + 1, nxt):
            c.start()

    for c in dma(t, slot):
        c.wait()

    @pl.when(jnp.logical_not(interior))
    def _():
        cout_ref[:] = jnp.zeros((T, LANES), cout_ref.dtype)
        q_ref[:] = jnp.zeros((T, LANES), q_ref.dtype)
        dots_ref[:] = jnp.zeros((24, LANES), jnp.float32)

    @pl.when(interior)
    def _():
        ca = coef_ref[0, 0]
        cb = coef_ref[0, 1]
        pw = asv[slot] + ca * bsv[slot] + cb * csv[slot]
        center = pw[K : K + T, :].astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
        acc = jnp.zeros((T, LANES), jnp.float32)
        for k, off in enumerate(offsets):
            qr, rm = divmod(off, LANES)
            base = K + qr
            a = pw[base : base + T, :]
            if rm == 0:
                sh = a
            else:
                b = pw[base + 1 : base + 1 + T, :]
                ar = pltpu.roll(a, jnp.asarray(LANES - rm, jnp.int32), 1)
                br = pltpu.roll(b, jnp.asarray(LANES - rm, jnp.int32), 1)
                sh = jnp.where(lane < LANES - rm, ar, br)
            acc = acc + data_ref[k].astype(jnp.float32) * sh.astype(jnp.float32)
        cout_ref[:] = center.astype(cout_ref.dtype)
        q_ref[:] = acc.astype(q_ref.dtype)
        rhat = rhat_ref[:].astype(jnp.float32)
        d1 = jnp.sum(rhat * acc, axis=0, keepdims=True)
        d2 = jnp.sum(acc * center, axis=0, keepdims=True)
        d3 = jnp.sum(acc * acc, axis=0, keepdims=True)
        dots_ref[:] = jnp.concatenate(
            [jnp.pad(d, ((0, 7), (0, 0))) for d in (d1, d2, d3)], axis=0
        )


def _kb_update_kernel(coef_ref, x_ref, p_ref, s_ref, t_ref, rhat_ref,
                      xout_ref, rout_ref, dots_ref):
    """BiCGStab tail: x' = x + α·p' + ω·s ; r' = s − ω·t ;
    dots = (Σ r̂⊙r', Σ|r'|)."""
    i = pl.program_id(0)
    alpha = coef_ref[0, 0]
    omega = coef_ref[0, 1]
    xo = x_ref[:] + alpha * p_ref[:] + omega * s_ref[:]
    ro = s_ref[:] - omega * t_ref[:]
    xout_ref[:] = xo
    rout_ref[:] = ro
    r32 = ro.astype(jnp.float32)
    d1 = jnp.sum(rhat_ref[:].astype(jnp.float32) * r32, axis=0, keepdims=True)
    d2 = jnp.sum(jnp.abs(r32), axis=0, keepdims=True)
    dots_ref[:] = jnp.concatenate(
        [jnp.pad(d, ((0, 7), (0, 0))) for d in (d1, d2)], axis=0
    )


def _k2n_kernel(alpha_ref, x_ref, r_ref, p_ref, q_ref,
                xout_ref, rout_ref, absr_ref):
    """K2 without the z/ρ outputs — for rich (framed) preconditioners whose
    z is produced by a separate cycle; avoids a dead full-vector z write
    and ρ reduction per iteration."""
    alpha = alpha_ref[0, 0]
    xout_ref[:] = x_ref[:] + alpha * p_ref[:]
    ro = r_ref[:] - alpha * q_ref[:]
    rout_ref[:] = ro
    absr_ref[:] = jnp.pad(
        jnp.sum(jnp.abs(ro.astype(jnp.float32)), axis=0, keepdims=True),
        ((0, 7), (0, 0)))


def _k2_kernel(alpha_ref, x_ref, r_ref, p_ref, q_ref, invd_ref,
               xout_ref, rout_ref, zout_ref, rho_ref, absr_ref):
    """Pure streaming over the whole frame (halo rows are zero in, zero out)."""
    t = pl.program_id(0)
    alpha = alpha_ref[0, 0]
    xo = x_ref[:] + alpha * p_ref[:]
    ro = r_ref[:] - alpha * q_ref[:]
    zo = invd_ref[:] * ro
    xout_ref[:] = xo
    rout_ref[:] = ro
    zout_ref[:] = zo
    rho_ref[:] = jnp.pad(
        jnp.sum(ro.astype(jnp.float32) * zo.astype(jnp.float32), axis=0,
                keepdims=True), ((0, 7), (0, 0)))
    absr_ref[:] = jnp.pad(
        jnp.sum(jnp.abs(ro.astype(jnp.float32)), axis=0, keepdims=True),
        ((0, 7), (0, 0)))


def _ka_kernel(r_hbm, data_ref, wout_ref, dots_ref, rs, rsem,
               *, offsets, T, K, grid, invd_hbm=None, isv=None, isem=None):
    """Chronopoulos–Gear (pipelined-CG) A-step: u = M⁻¹r (diagonal M in-
    window; identity when invd is absent), w = A u, and ALL per-iteration
    dot partials in one pass: (γ = Σ r·u, δ = Σ w·u, Σ|r|).  The single
    fused reduction point of solve/cg_pipe.py riding the merged kernels."""
    t = pl.program_id(0)
    two = jnp.asarray(2, jnp.int32)
    # int32 explicitly: under jax_enable_x64 program_id/rem can carry i64,
    # which Mosaic rejects as a memref slice index
    t = jnp.asarray(t, jnp.int32)
    slot = jax.lax.rem(t, two)
    interior = jnp.logical_and(t > 0, t < grid - 1)
    jacobi = invd_hbm is not None

    def dma(tile_idx, s):
        s = jnp.asarray(s, jnp.int32)  # literal slots are i64 under x64
        # int32 explicitly: under jax_enable_x64 the clip promotes to
        # i64, which Mosaic's memref_slice rejects on hardware
        start = jnp.clip(tile_idx * T - K, 0,
                         grid * T - (T + 2 * K)).astype(jnp.int32)
        cs = [pltpu.make_async_copy(
            r_hbm.at[pl.ds(start, T + 2 * K), :], rs.at[s], rsem.at[s])]
        if jacobi:
            cs.append(pltpu.make_async_copy(
                invd_hbm.at[pl.ds(start, T + 2 * K), :], isv.at[s], isem.at[s]))
        return cs

    @pl.when(t == 0)
    def _():
        for c in dma(0, 0):
            c.start()

    @pl.when(t + 1 < grid)
    def _():
        nxt = jax.lax.rem(t + 1, two)
        for c in dma(t + 1, nxt):
            c.start()

    for c in dma(t, slot):
        c.wait()

    @pl.when(jnp.logical_not(interior))
    def _():
        wout_ref[:] = jnp.zeros((T, LANES), wout_ref.dtype)
        dots_ref[:] = jnp.zeros((24, LANES), jnp.float32)

    @pl.when(interior)
    def _():
        rw = rs[slot]
        uw = isv[slot] * rw if jacobi else rw
        center_r = rw[K : K + T, :].astype(jnp.float32)
        center_u = uw[K : K + T, :].astype(jnp.float32)
        acc = _stencil_acc(uw, data_ref, offsets, T, K)
        wout_ref[:] = acc.astype(wout_ref.dtype)
        d1 = jnp.sum(center_r * center_u, axis=0, keepdims=True)
        d2 = jnp.sum(acc * center_u, axis=0, keepdims=True)
        d3 = jnp.sum(jnp.abs(center_r), axis=0, keepdims=True)
        dots_ref[:] = jnp.concatenate(
            [jnp.pad(d, ((0, 7), (0, 0))) for d in (d1, d2, d3)], axis=0)


def _kb_pipe_kernel(coef_ref, w_ref, p_ref, s_ref, x_ref, r_ref,
                    pout_ref, sout_ref, xout_ref, rout_ref, invd_ref=None):
    """Pipelined-CG update step (no reductions): p' = u + β·p, s' = w + β·s,
    x' = x + α·p', r' = r − α·s' (u = invd·r or r)."""
    alpha = coef_ref[0, 0]
    beta = coef_ref[0, 1]
    u = invd_ref[:] * r_ref[:] if invd_ref is not None else r_ref[:]
    po = u + beta * p_ref[:]
    so = w_ref[:] + beta * s_ref[:]
    pout_ref[:] = po
    sout_ref[:] = so
    xout_ref[:] = x_ref[:] + alpha * po
    rout_ref[:] = r_ref[:] - alpha * so


def _k2i_kernel(alpha_ref, x_ref, r_ref, p_ref, q_ref,
                xout_ref, rout_ref, rho_ref, absr_ref):
    """K2 for IDENTITY preconditioning (z ≡ r): drops the z write and the
    invd read — 6 vector streams instead of 8.  ρ' = <r', r'>."""
    alpha = alpha_ref[0, 0]
    xout_ref[:] = x_ref[:] + alpha * p_ref[:]
    ro = r_ref[:] - alpha * q_ref[:]
    rout_ref[:] = ro
    r32 = ro.astype(jnp.float32)
    rho_ref[:] = jnp.pad(
        jnp.sum(r32 * r32, axis=0, keepdims=True), ((0, 7), (0, 0)))
    absr_ref[:] = jnp.pad(
        jnp.sum(jnp.abs(r32), axis=0, keepdims=True), ((0, 7), (0, 0)))


class CgKernels:
    """Merged-CG steps over a halo-framed (Rp + 2T, 128) vector layout.

    This object is a PURE PLAN: it holds only static layout metadata (and
    hashes/compares by it), so it is safe as a jit static argument across
    coefficient updates — the packed coefficient blocks (`pack_values`) are
    traced arguments to k1."""

    def __init__(self, n: int, offsets: tuple, tile: int = 512,
                 interpret: bool = False):
        self.n = n
        self.offsets = tuple(offsets)
        maxoff = max((abs(o) for o in self.offsets), default=0)
        k = maxoff // LANES + 1
        self.K = -(-k // 8) * 8
        r = math.ceil(n / LANES)
        # wide stencils (large 3-D z-strides): the x window is (T + 2K)
        # rows, so a tile below the halo is invalid and one comparable to
        # it spends most of its DMA traffic on window overlap — raise the
        # requested tile until the interior is >= 2x the halo (the row-
        # count cap below still bounds it for small problems)
        tile = max(tile, 2 * self.K)
        self.tile = min(tile, max(self.K, 8 * math.ceil(r / 8)))
        # guarantee >= 2 interior tiles when the row count allows: a pipeline
        # with exactly one interior tile (grid=3) never completes on v5e hw
        # (k1 wedges in the DMA waits); halving the tile sidesteps it
        if math.ceil(r / self.tile) == 1:
            half = 8 * math.ceil(r / 2 / 8)
            if half >= self.K and half < r:
                self.tile = half
        if self.tile < self.K:
            raise ValueError(f"tile {self.tile} must be >= halo rows {self.K}")
        self.rp = math.ceil(r / self.tile) * self.tile
        self.frame_rows = self.rp + 2 * self.tile
        self.grid = self.frame_rows // self.tile
        self.interpret = interpret
        self.dtype = jnp.float32

    def _key(self):
        return (self.n, self.offsets, self.tile, self.interpret)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, CgKernels) and self._key() == other._key()

    def workset_bytes(self) -> int:
        """Approximate per-iteration working set (operator + the ~6 CG
        vectors) — used by cg_fused to decide whether the solve can stay
        VMEM-resident across iterations (see the identity-variant gate)."""
        return (len(self.offsets) + 6) * self.rp * LANES * 4

    @property
    def frame_offset(self) -> int:
        """Flat frame index of local row 0 (the leading zero pad frame()
        prepends) — the dist layer reads interface rows at
        frame_offset + r."""
        return self.tile * LANES

    def _compiler_params(self, windows: int, blocks: int):
        """Mosaic scoped-VMEM budget for the fused kernels.  The default
        16 MB cap rejects tiles wide enough to amortise a large halo (the
        z-plane stride of a 3-D operator needs K ~ stride/128 halo rows,
        and the window is (T + 2K) — at T = 2K half the DMA traffic is
        overlap).  `windows` counts manually double-buffered halo-window
        streams (scratch_shapes), `blocks` counts BlockSpec-pipelined
        (T, 128) streams (the coefficient block counts as nd of them)."""
        T, K = self.tile, self.K
        need = (2 * windows * (T + 2 * K) + 2 * blocks * T) * LANES * 4
        return pltpu.CompilerParams(
            vmem_limit_bytes=max(16 * 2**20, min(int(need * 1.25) + 2 * 2**20,
                                                 120 * 2**20)))

    def pack_values(self, mat: Dia, dtype=None):
        """Dia values -> the (nd, Rp, 128) coefficient blocks (traced).
        dtype overrides the storage precision (e.g. bfloat16 for
        preconditioner operators: compute stays f32 in-kernel, A-read
        bytes halve)."""
        assert tuple(mat.offsets) == self.offsets
        pad = self.rp * LANES - self.n
        return jnp.pad(
            mat.data.astype(dtype or self.dtype), ((0, 0), (0, pad))
        ).reshape(len(self.offsets), self.rp, LANES)

    # ---- layout helpers -------------------------------------------------
    def frame(self, x):
        """(n,) -> halo-framed (Rp+2T, 128)."""
        x2 = jnp.pad(jnp.asarray(x, self.dtype), (0, self.rp * LANES - self.n))
        return jnp.pad(x2.reshape(self.rp, LANES), ((self.tile, self.tile), (0, 0)))

    def unframe(self, xf):
        return xf[self.tile : self.tile + self.rp].reshape(-1)[: self.n]

    # ---- K1 -------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def k1(self, data3, zf, pf, beta):
        T, K = self.tile, self.K
        nd = data3.shape[0]
        pout, q, delta = pl.pallas_call(
            functools.partial(_k1_kernel, offsets=self.offsets, T=T, K=K,
                              grid=self.grid),
            grid=(self.grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                # data block for frame tile t is logical block t-1 (halo
                # tiles read block 0, compute skipped)
                pl.BlockSpec((nd, T, LANES),
                             lambda t: (0, jnp.maximum(t - 1, 0), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((T, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.grid * 8, LANES), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, T + 2 * K, LANES), self.dtype),
                pltpu.VMEM((2, T + 2 * K, LANES), self.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=self.interpret,
            compiler_params=self._compiler_params(windows=2, blocks=nd + 3),
        )(zf, pf, jnp.asarray(beta, self.dtype).reshape(1, 1), data3)
        return pout, q, jnp.sum(delta)

    # ---- K2 -------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def k2(self, alpha, xf, rf, pf, qf, invdf):
        T = self.tile

        def blk():
            return pl.BlockSpec((T, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)

        xo, ro, zo, rho, absr = pl.pallas_call(
            _k2_kernel,
            grid=(self.grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      blk(), blk(), blk(), blk(), blk()],
            out_specs=(blk(), blk(), blk(),
                       pl.BlockSpec((8, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
                       pl.BlockSpec((8, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)),
            out_shape=(
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.grid * 8, LANES), jnp.float32),
                jax.ShapeDtypeStruct((self.grid * 8, LANES), jnp.float32),
            ),
            interpret=self.interpret,
            compiler_params=self._compiler_params(windows=0, blocks=11),
        )(jnp.asarray(alpha, self.dtype).reshape(1, 1), xf, rf, pf, qf, invdf)
        return xo, ro, zo, jnp.sum(rho), jnp.sum(absr)

    # ---- pipelined-CG (Chronopoulos–Gear) steps --------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def ka(self, data3, rf, invdf=None):
        """u = M⁻¹r, w = A u, dots (γ=<r,u>, δ=<w,u>, ‖r‖₁) in one pass.
        invdf=None → identity (u ≡ r, no extra stream)."""
        T, K = self.tile, self.K
        nd = data3.shape[0]
        jac = invdf is not None
        scratch = [pltpu.VMEM((2, T + 2 * K, LANES), self.dtype),
                   pltpu.SemaphoreType.DMA((2,))]
        in_specs = [pl.BlockSpec(memory_space=pltpu.HBM),
                    pl.BlockSpec((nd, T, LANES),
                                 lambda t: (0, jnp.maximum(t - 1, 0), 0),
                                 memory_space=pltpu.VMEM)]
        args = [rf, data3]
        if jac:
            scratch += [pltpu.VMEM((2, T + 2 * K, LANES), self.dtype),
                        pltpu.SemaphoreType.DMA((2,))]
            in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
            args.append(invdf)

        def kernel(*refs):
            if jac:
                r_hbm, d_ref, i_hbm, wout, dots, rs, rsem, isv, isem = refs
                _ka_kernel(r_hbm, d_ref, wout, dots, rs, rsem,
                           offsets=self.offsets, T=T, K=K, grid=self.grid,
                           invd_hbm=i_hbm, isv=isv, isem=isem)
            else:
                r_hbm, d_ref, wout, dots, rs, rsem = refs
                _ka_kernel(r_hbm, d_ref, wout, dots, rs, rsem,
                           offsets=self.offsets, T=T, K=K, grid=self.grid)

        wf, dots = pl.pallas_call(
            kernel,
            grid=(self.grid,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((T, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((24, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.grid * 24, LANES), jnp.float32),
            ),
            scratch_shapes=scratch,
            interpret=self.interpret,
            compiler_params=self._compiler_params(
                windows=2 if jac else 1, blocks=nd + 4),
        )(*args)
        d = dots.reshape(self.grid, 3, 8, LANES)
        return wf, jnp.sum(d[:, 0]), jnp.sum(d[:, 1]), jnp.sum(d[:, 2])

    @functools.partial(jax.jit, static_argnums=0)
    def kb_pipe(self, wf, pf, sf, xf, rf, alpha, beta, invdf=None):
        """p' = u + β·p, s' = w + β·s, x' = x + α·p', r' = r − α·s'
        (u = invd·r, or r when invdf is None) — pure streaming, no dots."""
        T = self.tile
        jac = invdf is not None
        coef = jnp.stack([jnp.asarray(alpha, self.dtype),
                          jnp.asarray(beta, self.dtype)]).reshape(1, 2)

        def blk():
            return pl.BlockSpec((T, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)

        def kernel(*refs):
            if jac:
                c, w, p, s, x, r, iv, po, so, xo, ro = refs
                _kb_pipe_kernel(c, w, p, s, x, r, po, so, xo, ro, invd_ref=iv)
            else:
                c, w, p, s, x, r, po, so, xo, ro = refs
                _kb_pipe_kernel(c, w, p, s, x, r, po, so, xo, ro)

        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    blk(), blk(), blk(), blk(), blk()]
        args = [coef, wf, pf, sf, xf, rf]
        if jac:
            in_specs.append(blk())
            args.append(invdf)
        shp = jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype)
        po, so, xo, ro = pl.pallas_call(
            kernel,
            grid=(self.grid,),
            in_specs=in_specs,
            out_specs=(blk(), blk(), blk(), blk()),
            out_shape=(shp, shp, shp, shp),
            interpret=self.interpret,
            compiler_params=self._compiler_params(windows=0, blocks=11),
        )(*args)
        return po, so, xo, ro

    # ---- K2 for identity preconditioning (z ≡ r) ------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def k2i(self, alpha, xf, rf, pf, qf):
        T = self.tile

        def blk():
            return pl.BlockSpec((T, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)

        def pblk():
            return pl.BlockSpec((8, LANES), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)

        xo, ro, rho, absr = pl.pallas_call(
            _k2i_kernel,
            grid=(self.grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      blk(), blk(), blk(), blk()],
            out_specs=(blk(), blk(), pblk(), pblk()),
            out_shape=(
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.grid * 8, LANES), jnp.float32),
                jax.ShapeDtypeStruct((self.grid * 8, LANES), jnp.float32),
            ),
            interpret=self.interpret,
            compiler_params=self._compiler_params(windows=0, blocks=8),
        )(jnp.asarray(alpha, self.dtype).reshape(1, 1), xf, rf, pf, qf)
        return xo, ro, jnp.sum(rho), jnp.sum(absr)

    # ---- K2 without z/rho (rich preconditioner variant) -----------------
    @functools.partial(jax.jit, static_argnums=0)
    def k2n(self, alpha, xf, rf, pf, qf):
        T = self.tile

        def blk():
            return pl.BlockSpec((T, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)

        xo, ro, absr = pl.pallas_call(
            _k2n_kernel,
            grid=(self.grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      blk(), blk(), blk(), blk()],
            out_specs=(blk(), blk(),
                       pl.BlockSpec((8, LANES), lambda t: (t, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.grid * 8, LANES), jnp.float32),
            ),
            interpret=self.interpret,
            compiler_params=self._compiler_params(windows=0, blocks=8),
        )(jnp.asarray(alpha, self.dtype).reshape(1, 1), xf, rf, pf, qf)
        return xo, ro, jnp.sum(absr)

    def apply(self, data3, xf):
        """Plain y = A x on a framed vector (K1 with z=x, beta=0)."""
        _, q, _ = self.k1(data3, xf, xf, 0.0)
        return q

    # ---- AMG smoother kernels -------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def ksweep(self, data3, xf, bf, invdf, relax):
        """x' = x + relax·D⁻¹·(b − A x) on framed vectors, one fused pass."""
        T, K = self.tile, self.K
        nd = data3.shape[0]

        def blk():
            return pl.BlockSpec((T, LANES), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            functools.partial(_sweep_kernel, offsets=self.offsets, T=T, K=K,
                              grid=self.grid),
            grid=(self.grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((nd, T, LANES),
                             lambda t: (0, jnp.maximum(t - 1, 0), 0),
                             memory_space=pltpu.VMEM),
                blk(), blk(),
            ],
            out_specs=blk(),
            out_shape=jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, T + 2 * K, LANES), self.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=self.interpret,
            compiler_params=self._compiler_params(windows=1, blocks=nd + 3),
        )(xf, jnp.asarray(relax, self.dtype).reshape(1, 1), data3, bf, invdf)
        return out

    @functools.partial(jax.jit, static_argnums=0)
    def kresid(self, data3, xf, bf):
        """r = b − A x on framed vectors, one fused pass."""
        T, K = self.tile, self.K
        nd = data3.shape[0]

        def blk():
            return pl.BlockSpec((T, LANES), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            functools.partial(_resid_kernel, offsets=self.offsets, T=T, K=K,
                              grid=self.grid),
            grid=(self.grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((nd, T, LANES),
                             lambda t: (0, jnp.maximum(t - 1, 0), 0),
                             memory_space=pltpu.VMEM),
                blk(),
            ],
            out_specs=blk(),
            out_shape=jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, T + 2 * K, LANES), self.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=self.interpret,
            compiler_params=self._compiler_params(windows=1, blocks=nd + 2),
        )(xf, data3, bf)
        return out

    # ---- BiCGStab building blocks ---------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def k1b(self, data3, af, bf, cf, rhatf, ca, cb):
        """w = a + ca·b + cb·c ; q = A w ; dots (r̂·q, q·w, q·q)."""
        T, K = self.tile, self.K
        nd = data3.shape[0]
        coef = jnp.stack([jnp.asarray(ca, self.dtype),
                          jnp.asarray(cb, self.dtype)]).reshape(1, 2)
        w, q, dots = pl.pallas_call(
            functools.partial(_k1b_kernel, offsets=self.offsets, T=T, K=K,
                              grid=self.grid),
            grid=(self.grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((T, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nd, T, LANES),
                             lambda t: (0, jnp.maximum(t - 1, 0), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((T, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((24, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.grid * 24, LANES), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, T + 2 * K, LANES), self.dtype),
                pltpu.VMEM((2, T + 2 * K, LANES), self.dtype),
                pltpu.VMEM((2, T + 2 * K, LANES), self.dtype),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            interpret=self.interpret,
            compiler_params=self._compiler_params(windows=3, blocks=nd + 6),
        )(af, bf, cf, coef, rhatf, data3)
        d = dots.reshape(self.grid, 3, 8, LANES)
        return w, q, jnp.sum(d[:, 0]), jnp.sum(d[:, 1]), jnp.sum(d[:, 2])

    @functools.partial(jax.jit, static_argnums=0)
    def kb_update(self, xf, pf, sf, tf, rhatf, alpha, omega):
        """x' = x + α·p' + ω·s ; r' = s − ω·t ; dots (r̂·r', |r'|₁)."""
        T = self.tile
        coef = jnp.stack([jnp.asarray(alpha, self.dtype),
                          jnp.asarray(omega, self.dtype)]).reshape(1, 2)

        def blk():
            return pl.BlockSpec((T, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)

        xo, ro, dots = pl.pallas_call(
            _kb_update_kernel,
            grid=(self.grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      blk(), blk(), blk(), blk(), blk()],
            out_specs=(blk(), blk(),
                       pl.BlockSpec((16, LANES), lambda t: (t, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.grid * 16, LANES), jnp.float32),
            ),
            interpret=self.interpret,
            compiler_params=self._compiler_params(windows=0, blocks=10),
        )(coef, xf, pf, sf, tf, rhatf)
        d = dots.reshape(self.grid, 2, 8, LANES)
        return xo, ro, jnp.sum(d[:, 0]), jnp.sum(d[:, 1])


class GdiaCgKernels(CgKernels):
    """Merged-CG plan for Gdia matrices (lane-gather A-apply).  Packed
    coefficients are a (vals, lidx) pair."""

    def __init__(self, n: int, plane_offsets: tuple, tile: int = 512,
                 interpret: bool = False):
        # parent computes the halo row count from flat offsets; plane
        # offsets are block-row offsets (rows = q), i.e. flat q*LANES
        super().__init__(n, tuple(int(q) * LANES for q in plane_offsets),
                         tile, interpret)
        self.plane_offsets = tuple(int(q) for q in plane_offsets)

    def _key(self):
        return (self.n, self.plane_offsets, self.tile, self.interpret, "gdia")

    def pack_values(self, mat):
        assert tuple(mat.plane_offsets) == self.plane_offsets
        r = mat.vals.shape[1]
        pad = self.rp - r
        vals = jnp.pad(mat.vals.astype(self.dtype), ((0, 0), (0, pad), (0, 0)))
        lidx = jnp.pad(mat.lidx, ((0, 0), (0, pad), (0, 0)))
        return vals, lidx

    @functools.partial(jax.jit, static_argnums=0)
    def k1(self, data3, zf, pf, beta):
        vals, lidx = data3
        T, K = self.tile, self.K
        np_ = vals.shape[0]
        pout, q, delta = pl.pallas_call(
            functools.partial(_k1_gdia_kernel, plane_offsets=self.plane_offsets,
                              T=T, K=K, grid=self.grid),
            grid=(self.grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((np_, T, LANES),
                             lambda t: (0, jnp.maximum(t - 1, 0), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((np_, T, LANES),
                             lambda t: (0, jnp.maximum(t - 1, 0), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((T, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.frame_rows, LANES), self.dtype),
                jax.ShapeDtypeStruct((self.grid * 8, LANES), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, T + 2 * K, LANES), self.dtype),
                pltpu.VMEM((2, T + 2 * K, LANES), self.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=self.interpret,
            compiler_params=self._compiler_params(windows=2, blocks=2 * np_ + 3),
        )(zf, pf, jnp.asarray(beta, self.dtype).reshape(1, 1), vals, lidx)
        return pout, q, jnp.sum(delta)


def make_cg_kernels(mat, tile: int = 512, interpret: bool = False):
    """Returns (plan, packed coefficient blocks) for a Dia, Gdia, or Xell
    matrix."""
    if isinstance(mat, Dia):
        kern = CgKernels(mat.shape[0], mat.offsets, tile, interpret)
    elif type(mat).__name__ == "Xell":
        from ogl_tpu.kernels.xell import XellCgKernels

        kern = XellCgKernels.for_matrix(mat, interpret)
    else:
        kern = GdiaCgKernels(mat.shape[0], mat.plane_offsets, tile, interpret)
    return kern, kern.pack_values(mat)
