"""Problem generators shared by tests and benchmarks.

The reference validates on OpenFOAM tutorial cases (cavity pressure Poisson,
channel); without OpenFOAM in the loop the equivalent systems are structured
finite-volume Poisson matrices expressed in LDU form, which exercise the
exact conversion + solve path (SURVEY.md §4 "solver-level tests on SPD
Poisson matrices").
"""

from __future__ import annotations

import numpy as np

from ogl_tpu.core import ldu

__all__ = ["poisson_ldu", "poisson_dense", "grid_shape"]


def grid_shape(dims):
    return (dims, 1, 1) if isinstance(dims, int) else tuple(dims) + (1,) * (3 - len(dims))


def poisson_ldu(dims, dirichlet_boundary: bool = True) -> ldu.LduMatrix:
    """FV Poisson (pressure-equation-like) system on a structured grid in
    OpenFOAM LDU form: faces sorted by (owner, neighbour) ascending owners,
    diag = number of neighbours (+ boundary contribution), upper = -1.

    dims: int or tuple up to 3-D.  With dirichlet_boundary=True boundary
    cells get an extra diagonal unit (pinning the nullspace, like a fixed-
    value patch); otherwise the matrix is singular (pure Neumann) like a
    real incompressible pressure equation.
    """
    nx, ny, nz = grid_shape(dims)
    n = nx * ny * nz

    def cid(i, j, k):
        return (k * ny + j) * nx + i

    pairs = []
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                c = cid(i, j, k)
                if i + 1 < nx:
                    pairs.append((c, cid(i + 1, j, k)))
                if j + 1 < ny:
                    pairs.append((c, cid(i, j + 1, k)))
                if k + 1 < nz:
                    pairs.append((c, cid(i, j, k + 1)))
    pairs.sort()
    lower_addr = np.array([p[0] for p in pairs], np.int64)
    upper_addr = np.array([p[1] for p in pairs], np.int64)
    diag = np.zeros(n)
    np.add.at(diag, lower_addr, 1.0)
    np.add.at(diag, upper_addr, 1.0)
    if dirichlet_boundary:
        # boundary faces contribute to the diagonal only
        for k in range(nz):
            for j in range(ny):
                for i in range(nx):
                    nb = (i == 0) + (i == nx - 1 and nx > 1)
                    nb += (j == 0) + (j == ny - 1 and ny > 1)
                    nb += (k == 0) + (k == nz - 1 and nz > 1)
                    diag[cid(i, j, k)] += nb
    return ldu.LduMatrix(
        n=n,
        lower_addr=lower_addr,
        upper_addr=upper_addr,
        diag=diag,
        upper=np.full(len(pairs), -1.0),
    )


def poisson_dense(dims, dirichlet_boundary: bool = True) -> np.ndarray:
    m = poisson_ldu(dims, dirichlet_boundary)
    a = np.zeros((m.n, m.n))
    np.fill_diagonal(a, m.diag)
    for f in range(m.n_faces):
        a[m.lower_addr[f], m.upper_addr[f]] = m.upper[f]
        a[m.upper_addr[f], m.lower_addr[f]] = m.upper[f]
    return a
