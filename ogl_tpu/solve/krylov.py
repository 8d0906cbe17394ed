"""Shared Krylov-solver plumbing.

Solvers are pure functions over vectors parameterised by an `Ops` bundle so
the same `lax.while_loop` body runs single-device (reductions = jnp.sum)
and inside shard_map (reductions = psum over the mesh axis, matvec = local
SpMV + halo exchange).  This replaces the reference's
executor/distributed-vector abstraction (Ginkgo dist_vec compute_norm1 /
compute_mean with MPI allreduce, StoppingCriterion.C:11-69).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp

__all__ = ["Ops", "single_device_ops"]


@dataclasses.dataclass(frozen=True)
class Ops:
    """Device-op bundle a solver runs against.

    matvec:  x -> A @ x (including halo exchange when distributed)
    precond: r -> M^{-1} r  (identity when unpreconditioned)
    sum:     elementwise-array -> global scalar sum (psum-wrapped when sharded)
    global_size: global number of DOF (for mean())
    """

    matvec: Callable[[Any], Any]
    precond: Callable[[Any], Any]
    sum: Callable[[Any], Any]
    global_size: int
    # elementwise all-reduce for vectors of partial sums (e.g. the batched
    # Gram-Schmidt dot products V @ w in GMRES): identity single-device,
    # lax.psum over the mesh axis when sharded
    allreduce: Callable[[Any], Any] = lambda v: v

    def dot(self, a, b):
        return self.sum(a * b)

    def norm1(self, a):
        return self.sum(jnp.abs(a))

    def norm2(self, a):
        return jnp.sqrt(self.sum(a * a))

    def mean(self, a):
        return self.sum(a) / self.global_size


def single_device_ops(matvec, n, precond=None) -> Ops:
    return Ops(
        matvec=matvec,
        precond=precond if precond is not None else (lambda r: r),
        sum=jnp.sum,
        global_size=n,
    )
