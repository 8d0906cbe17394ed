#!/usr/bin/env python
"""Hardware A/B of the merged-kernel CG on the 1M unstructured Xell
operator vs the unfused loop (the bench's end-to-end lane): iteration
parity + µs/iter.  Run after kernels/xell.py changes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xell_tune import knn_graph  # noqa: E402 (sibling script)


def slope_timed(call, force, lo=1, hi=7, reps=2):
    def run(k):
        out = None
        t0 = time.perf_counter()
        for _ in range(k):
            out = call()
        force(out)
        return time.perf_counter() - t0

    run(1)
    tlo = min(run(lo) for _ in range(reps))
    thi = min(run(hi) for _ in range(reps))
    return max((thi - tlo) / (hi - lo), 1e-9)


def main():
    n = 1 << 20
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows, cols, _ = knn_graph(n, os.path.join(repo,
                                              ".bench_cache_fvgraph_1m.npz"))
    deg = np.bincount(np.asarray(rows, np.int64), minlength=n)
    lrows = np.concatenate([rows, np.arange(n, dtype=rows.dtype)])
    lcols = np.concatenate([cols, np.arange(n, dtype=cols.dtype)])
    lvals = np.concatenate([np.full(len(rows), -1.0, np.float32),
                            (deg + 1.0).astype(np.float32)])
    order = np.lexsort((lcols, lrows))
    lrows, lcols, lvals = (lrows[order].astype(np.int32),
                           lcols[order].astype(np.int32),
                           lvals[order].astype(np.float32))

    from ogl_tpu.config import StoppingConfig
    from ogl_tpu.kernels import spmv
    from ogl_tpu.kernels.xell import XellCgKernels
    from ogl_tpu.solve.cg import cg
    from ogl_tpu.solve.cg_fused import cg_fused
    from ogl_tpu.solve.krylov import single_device_ops
    from ogl_tpu.solve.stopping import StoppingParams

    t0 = time.perf_counter()
    mat = spmv.pack_fast(lrows, lcols, lvals, n, presorted=True)
    print(f"pack -> {type(mat).__name__} K={mat.n_slots} "
          f"spill={mat.spill.nnz} ({time.perf_counter()-t0:.1f}s)")
    rng = np.random.default_rng(4)
    xt = rng.normal(size=n).astype(np.float32)
    leaves, tdef = jax.tree_util.tree_flatten(mat)
    b = jax.jit(lambda v, *ls: spmv.matvec(jax.tree_util.tree_unflatten(
        tdef, ls))(v))(jnp.asarray(xt), *leaves)
    sp = StoppingParams.of(StoppingConfig(
        tolerance=1e-6, rel_tol=0.0, max_iter=1000, frequency=1))

    # unfused loop (current bench lane)
    mv = lambda v: spmv.matvec(jax.tree_util.tree_unflatten(tdef, leaves))(v)
    ops = single_device_ops(mv, n)
    solve_u = jax.jit(lambda bb, pp: cg(ops, bb, jnp.zeros_like(bb), pp))
    res_u = solve_u(b, sp)
    it_u = int(res_u.iters)
    t_u = slope_timed(lambda: solve_u(b, sp),
                      lambda o: float(o.final_res_norm))
    print(f"unfused: {it_u} iters conv={bool(res_u.converged)} "
          f"{t_u*1e3:.1f} ms ({t_u/max(it_u,1)*1e6:.1f} µs/iter)")

    # merged-kernel path
    kern = XellCgKernels.for_matrix(mat)
    data3 = kern.pack_values(mat)
    dleaves, ddef = jax.tree_util.tree_flatten(data3)

    def fsolve(bb, pp, *ls):
        d3 = jax.tree_util.tree_unflatten(ddef, ls)
        return cg_fused(kern, d3, bb, jnp.zeros_like(bb), pp)

    solve_f = jax.jit(fsolve)
    res_f = solve_f(b, sp, *dleaves)
    it_f = int(res_f.iters)
    t_f = slope_timed(lambda: solve_f(b, sp, *dleaves),
                      lambda o: float(o.final_res_norm))
    print(f"fused:   {it_f} iters conv={bool(res_f.converged)} "
          f"{t_f*1e3:.1f} ms ({t_f/max(it_f,1)*1e6:.1f} µs/iter)")
    print(f"iteration parity: {it_u} vs {it_f}; speedup "
          f"{t_u/max(it_u,1)/(t_f/max(it_f,1)):.2f}x per iter")
    ru = np.asarray(jax.device_get(res_u.x))
    rf = np.asarray(jax.device_get(res_f.x))
    rel = float(np.abs(ru - rf).max() / max(np.abs(ru).max(), 1e-30))
    print(f"solution agreement rel {rel:.1e}")


if __name__ == "__main__":
    main()
