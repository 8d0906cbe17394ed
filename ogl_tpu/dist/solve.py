"""Distributed solve: shard_map'd Krylov loops over a device mesh.

The reference's distributed solve (`solve_multi_gpu_impl`,
lduLduBase.H:189-308) maps as:
  Ginkgo dist Matrix::apply (local + non-local SpMV w/ sparse_communicator)
      -> `dist_matvec`: local ELL SpMV + ppermute halo rounds + halo SpMV
  dist Vector compute_norm1/compute_mean (device reduce + MPI allreduce)
      -> jnp reductions + lax.psum over the mesh axis
  MPI_Comm + executor pairing -> jax Mesh + shard_map

The SAME solver bodies (ogl_tpu.solve.*) run inside shard_map — only the
Ops bundle changes.  Every shard executes an identical program (SPMD); the
stopping criterion state is replicated because every reduction is psum'd.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ogl_tpu.dist.partition import DistMatrix, HaloPlan
from ogl_tpu.solve import bicgstab, cg, gmres, ir
from ogl_tpu.solve.krylov import Ops

__all__ = ["halo_exchange", "dist_matvec", "dist_ops", "dist_solve",
           "schwarz_jacobi_builder", "schwarz_block_jacobi_builder"]


def schwarz_jacobi_builder(local_cols, local_vals):
    """Per-shard scalar Jacobi (additive Schwarz, the parallel default of
    the reference's wrap_schwarz, Preconditioner.H:47-81)."""
    n_local = local_cols.shape[0]
    row_ids = jnp.arange(n_local)[:, None]
    diag = jnp.sum(jnp.where(local_cols == row_ids, local_vals, 0.0), axis=1)
    inv = jnp.where(jnp.abs(diag) > 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)
    return lambda r: inv * r


def schwarz_block_jacobi_builder(block_size: int):
    """Per-shard BLOCK Jacobi under additive Schwarz: contiguous blocks of
    `block_size` rows of the shard-local matrix, inverted with a batched
    dense solve inside the shard (regenerated per solve like the reference
    with caching=0)."""
    bs = int(block_size)
    if bs <= 1:
        return schwarz_jacobi_builder

    def builder(local_cols, local_vals):
        n_local, width = local_cols.shape
        nb = -(-n_local // bs)
        rows = jnp.repeat(jnp.arange(n_local), width).reshape(n_local, width)
        b_of_row = rows // bs
        b_of_col = local_cols // bs
        in_block = b_of_row == b_of_col
        # scatter entries into (nb, bs, bs); out-of-block contribute 0 to a
        # parked block index nb
        bidx = jnp.where(in_block, b_of_row, nb)
        blocks = jnp.zeros((nb + 1, bs, bs), local_vals.dtype)
        blocks = blocks.at[bidx, rows % bs, local_cols % bs].add(
            jnp.where(in_block, local_vals, 0.0)
        )[:nb]
        # identity-pad empty diagonal positions (padded rows beyond n_local)
        eye = jnp.eye(bs, dtype=local_vals.dtype)
        diag_abs = jnp.abs(jnp.einsum("bii->bi", blocks))
        fix = (diag_abs == 0).astype(local_vals.dtype)
        blocks = blocks + jnp.einsum("bi,ij->bij", fix, eye)
        inv = jnp.linalg.inv(blocks)

        def apply(r):
            rp = jnp.pad(r, (0, nb * bs - n_local)).reshape(nb, bs)
            y = jnp.einsum("bij,bj->bi", inv.astype(r.dtype), rp)
            return y.reshape(-1)[:n_local]

        return apply

    return builder

_SOLVERS = {"GKOCG": cg, "GKOBiCGStab": bicgstab, "GKOGMRES": gmres, "GKOIR": ir}


def halo_exchange(x, plan: HaloPlan, axis: str):
    """Fill this shard's halo buffer from neighbour shards: one ppermute per
    static ring-offset class (the compiled form of the reference's
    sparse_communicator neighbour sends)."""
    p = plan.n_parts
    h = jnp.zeros((plan.halo_size + 1,), x.dtype)  # +1 = parking slot for pads
    for off, sidx, rpos in zip(plan.offsets, plan.send_idx, plan.recv_pos):
        my = jax.lax.axis_index(axis)
        payload = jnp.take(x, sidx[my], axis=0)
        perm = [(i, (i + off) % p) for i in range(p)]
        recvd = jax.lax.ppermute(payload, axis, perm)
        h = h.at[rpos[my]].set(recvd)
    return h[: plan.halo_size]


def _local_spmv(cols, vals, x):
    return jnp.sum(vals * jnp.take(x, cols, axis=0), axis=1)


def dist_matvec(dm: DistMatrix, axis: str):
    """Per-shard closure y = (A x) on local shards, with halo exchange."""

    def mv(x, local_cols, local_vals, halo_cols, halo_vals):
        y = _local_spmv(local_cols, local_vals, x)
        if dm.plan.offsets:
            h = halo_exchange(x, dm.plan, axis)
            y = y + _local_spmv(halo_cols, halo_vals, h)
        return y

    return mv


def dist_ops(local_cols, local_vals, halo_cols, halo_vals, plan: HaloPlan,
             global_n: int, axis: str, precond=None) -> Ops:
    """Ops bundle for use INSIDE shard_map: reductions psum over `axis`."""

    def mv(x):
        y = _local_spmv(local_cols, local_vals, x)
        if plan.offsets:
            h = halo_exchange(x, plan, axis)
            y = y + _local_spmv(halo_cols, halo_vals, h)
        return y

    return Ops(
        matvec=mv,
        precond=precond if precond is not None else (lambda r: r),
        sum=lambda v: jax.lax.psum(jnp.sum(v), axis),
        global_size=global_n,
        allreduce=lambda v: jax.lax.psum(v, axis),
    )


def dist_solve(
    dm: DistMatrix,
    b_stack,
    x0_stack,
    stopping_params,
    mesh: Mesh,
    axis: str = "x",
    solver: str = "GKOCG",
    precond_builder=None,
    krylov_dim: int = 100,
):
    """Run a Krylov solve over the mesh.  b/x0 are (P, n_local) stacks
    (padded rows zero).  `precond_builder`, if given, maps per-shard static
    data to an apply closure inside the shard (additive-Schwarz semantics:
    each shard preconditions with its local block only —
    reference Preconditioner.H:47-81 wrap_schwarz).

    Returns (x_stack, SolveResult-of-replicated-scalars).
    """
    solve_fn = _SOLVERS[solver]
    kw = {"krylov_dim": krylov_dim} if solver == "GKOGMRES" else {}

    def shard_body(local_cols, local_vals, halo_cols, halo_vals, b, x0, sp):
        local_cols, local_vals = local_cols[0], local_vals[0]
        halo_cols, halo_vals = halo_cols[0], halo_vals[0]
        b, x0 = b[0], x0[0]
        pc = precond_builder(local_cols, local_vals) if precond_builder else None
        ops = dist_ops(
            local_cols, local_vals, halo_cols, halo_vals, dm.plan,
            dm.global_n, axis, precond=pc,
        )
        res = solve_fn(ops, b, x0, sp, **kw)
        return (
            res.x[None],
            res.iters,
            res.init_res_norm,
            res.final_res_norm,
            res.converged,
        )

    spec_stack = P(axis)
    out = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(spec_stack, spec_stack, spec_stack, spec_stack, spec_stack,
                  spec_stack, P()),
        out_specs=(spec_stack, P(), P(), P(), P()),
        check_vma=False,
    )(dm.local_cols, dm.local_vals, dm.halo_cols, dm.halo_vals,
      b_stack, x0_stack, stopping_params)
    x, iters, init_rn, final_rn, conv = out
    from ogl_tpu.solve.cg import SolveResult

    return x, SolveResult(x=x, iters=iters, init_res_norm=init_rn,
                          final_res_norm=final_rn, converged=conv)
