"""MatrixMarket import/export (reference `gko::write` / `export_mtx`,
common/common.C:17-73, CsrMatrixWrapper.H:271-290).

Writes `%%MatrixMarket matrix coordinate real general` files compatible with
scipy.io/Ginkgo; reads coordinate (general + symmetric) and array formats.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ogl_tpu.core import formats

__all__ = ["write_coo", "write_dense", "read"]


def write_coo(path: str, m: formats.Coo) -> None:
    rows = np.asarray(jax.device_get(m.rows)) + 1
    cols = np.asarray(jax.device_get(m.cols)) + 1
    vals = np.asarray(jax.device_get(m.vals))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{m.shape[0]} {m.shape[1]} {len(vals)}\n")
        for r, c, v in zip(rows, cols, vals):
            f.write(f"{r} {c} {v:.17g}\n")


def write_dense(path: str, x) -> None:
    """Write a vector/dense array (Nx1) in array format."""
    a = np.asarray(jax.device_get(x)).reshape(-1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix array real general\n")
        f.write(f"{len(a)} 1\n")
        for v in a:
            f.write(f"{v:.17g}\n")


def read(path: str, dtype=np.float64):
    """Read a MatrixMarket file.  Returns a Coo for coordinate files or a
    numpy array for array files."""
    with open(path) as f:
        header = f.readline().strip().lower().split()
        if not header or header[0] != "%%matrixmarket":
            raise ValueError(f"{path}: not a MatrixMarket file")
        fmt, field, symm = header[2], header[3], header[4]
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        dims = [int(t) for t in line.split()]
        body = np.loadtxt(f, ndmin=2, dtype=np.float64)
    if fmt == "array":
        nr, nc = dims
        return body.reshape(nc, nr).T.astype(dtype) if nc > 1 else body.reshape(nr, nc).astype(dtype)
    nr, nc, nnz = dims
    if nnz == 0:
        body = np.zeros((0, 3))
    rows = body[:, 0].astype(np.int64) - 1
    cols = body[:, 1].astype(np.int64) - 1
    vals = body[:, 2].astype(dtype) if field != "pattern" else np.ones(nnz, dtype)
    if symm in ("symmetric", "skew-symmetric"):
        off = rows != cols
        sgn = -1.0 if symm == "skew-symmetric" else 1.0
        rows = np.concatenate([rows, cols[off]])
        cols2 = np.concatenate([cols, body[off, 0].astype(np.int64) - 1])
        vals = np.concatenate([vals, sgn * vals[off]])
        cols = cols2
    order = np.lexsort((cols, rows))
    return formats.Coo(
        rows=jnp.asarray(rows[order], jnp.int32),
        cols=jnp.asarray(cols[order], jnp.int32),
        vals=jnp.asarray(vals[order]),
        shape=(nr, nc),
    )
