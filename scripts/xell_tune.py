#!/usr/bin/env python
"""Xell kernel tuning harness: build (and cache) the 1M kNN-6 FV graph the
bench uses, pack Xell, verify vs scipy, and slope-time the SpMV on the
real chip.  Used to iterate on `kernels/xell.py` without paying the full
bench; the bench's unstructured lane prints the official number.

Usage: python scripts/xell_tune.py [n_log2 (default 20)]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def knn_graph(n: int, cache: str):
    if os.path.exists(cache):
        z = np.load(cache)
        return z["rows"], z["cols"], z["vals"]
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    pts = rng.random((n, 3))
    _, idx = cKDTree(pts).query(pts, k=7, workers=-1)
    src = np.repeat(np.arange(n), 6)
    dst = idx[:, 1:].ravel()
    r_ = np.concatenate([src, dst])
    c_ = np.concatenate([dst, src])
    m_ = coo_matrix((np.ones(len(r_)), (r_, c_)), shape=(n, n)).tocsr()
    perm = reverse_cuthill_mckee(m_, symmetric_mode=True)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    mc = m_.tocoo()
    rows, cols = inv[mc.row], inv[mc.col]
    order = np.lexsort((cols, rows))
    rows = rows[order].astype(np.int32)
    cols = cols[order].astype(np.int32)
    vals = np.random.default_rng(1).normal(size=len(rows)).astype(np.float32)
    np.savez(cache, rows=rows, cols=cols, vals=vals)
    return rows, cols, vals


def main():
    nl = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << nl
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(repo, ".bench_cache_fvgraph_1m.npz" if nl == 20
                         else f".bench_cache_fvgraph_{nl}.npz")
    t0 = time.perf_counter()
    rows, cols, vals = knn_graph(n, cache)
    print(f"graph: n={n:,} nnz={len(rows):,} ({time.perf_counter()-t0:.1f}s)")

    from ogl_tpu.core.formats import Coo
    from ogl_tpu.kernels import roofline, spmv
    from ogl_tpu.kernels.xell import xell_from_coo

    import scipy.sparse as sp_

    x = np.random.default_rng(2).normal(size=n).astype(np.float32)
    yref = sp_.csr_matrix((vals, (rows, cols)), shape=(n, n)) @ x.astype(
        np.float64)
    coo = Coo(rows=rows.astype(np.int32), cols=cols.astype(np.int32),
              vals=vals, shape=(n, n))

    import dataclasses

    def bench_mat(mat, tag, check=True):
        if check:
            y = np.asarray(jax.device_get(spmv.matvec(mat)(jnp.asarray(x))))
            rel = float(np.abs(y - yref).max() / np.abs(yref).max())
            assert rel < 1e-5, rel
        else:
            rel = float("nan")
        from ogl_tpu.kernels.xell import xell_matvec, xell_spill_tables

        main_ = int(np.prod(mat.vals.shape))
        bytes_moved = main_ * 7 + n * 4 * 2
        leaves, tdef = jax.tree_util.tree_flatten(mat)
        tabs = xell_spill_tables(mat) if mat.spill.nnz else None

        def step(v, *ls):
            mm = jax.tree_util.tree_unflatten(tdef, ls)
            return xell_matvec(mm, tables=tabs)(v)

        r = roofline.measure_chained(step, jnp.asarray(x),
                                     bytes_moved=bytes_moved,
                                     operands=tuple(leaves))
        bound = bytes_moved / 819e9
        print(f"{tag}: K={mat.n_slots} spill={mat.spill.nnz} "
              f"fill={len(rows)/mat.stored:.0%}: "
              f"{r.seconds*1e6:.1f} µs/apply ({r.gbps:.0f} GB/s eff, "
              f"{r.seconds/bound:.2f}x this layout's streaming bound) "
              f"rel={rel:.1e}")

    # default packing (spill handled by XLA segment_sum)
    mat = xell_from_coo(coo)
    bench_mat(mat, "default")
    # spill cost isolated: same packing, spill dropped (timing only)
    from ogl_tpu.core.formats import Coo as _Coo
    empty = _Coo(rows=jnp.zeros((0,), jnp.int32),
                 cols=jnp.zeros((0,), jnp.int32),
                 vals=jnp.zeros((0,), np.float32), shape=(n, n))
    bench_mat(dataclasses.replace(mat, spill=empty), "no-spill-term",
              check=False)
    # spill-free packing: keep adding slots until everything lands
    try:
        mat0 = xell_from_coo(coo, k_max=32, spill_frac=0.0)
        bench_mat(mat0, "zero-spill-pack")
    except ValueError as e:
        print(f"zero-spill pack failed: {e}")


if __name__ == "__main__":
    main()
