#!/usr/bin/env python
"""Measure fused-CG kernel cost vs tile size at a beyond-VMEM problem size.

The K1 stencil kernel reads z/p through a (T + 2K, 128) halo window; for
wide 3-D stencils (z-stride 65536 at 256x256x128 -> K = 520 rows) the
default tile T = max(512, 2K) makes the window 2x the interior, i.e. z and
p stream twice per iteration.  Larger tiles amortise the halo overlap at
the cost of VMEM; this script measures where the knee is on real hardware.

Usage: python scripts/tune_tile.py [dims]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    from ogl_tpu.config import StoppingConfig
    from ogl_tpu.kernels.fused import CgKernels
    from ogl_tpu.solve.cg_fused import cg_fused
    from ogl_tpu.solve.stopping import StoppingParams

    sys.path.insert(0, ".")
    from bench import _poisson_dia

    dims = (256, 256, 128)
    if len(sys.argv) > 1:
        dims = tuple(int(v) for v in sys.argv[1].split("x"))
    mat = _poisson_dia(dims)
    n = mat.shape[0]
    log(f"n={n:,} offsets={mat.offsets}")

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=n).astype(np.float32))

    # fixed-iteration-count solve: run exactly 60 iterations so tile
    # variants are compared on identical work
    sp = StoppingParams.of(StoppingConfig(
        tolerance=0.0, rel_tol=0.0, max_iter=60, min_iter=60, frequency=1))

    def rtt_of(v):
        t = jax.jit(lambda x: jnp.sum(x + 1.0))
        float(t(v))
        return min(_timed(lambda: float(t(v))) for _ in range(5))

    def _timed(f):
        t0 = time.perf_counter()
        f()
        return time.perf_counter() - t0

    rtt = rtt_of(b)
    log(f"RTT {rtt*1e3:.1f} ms")

    maxoff = max(abs(o) for o in mat.offsets)
    k = -(-(maxoff // 128 + 1) // 8) * 8
    log(f"halo rows K={k}")

    for mult in (2, 3, 4, 6, 8):
        tile = mult * k
        try:
            kern = CgKernels(n, mat.offsets, tile=tile)
            data3 = kern.pack_values(mat)
            solve = jax.jit(lambda bb, spp, d3, kk=kern: cg_fused(
                kk, d3, bb, jnp.zeros_like(bb), spp))
            r = solve(b, sp, data3)
            float(r.final_res_norm)
            t = max(min(_timed(lambda: float(
                solve(b, sp, data3).final_res_norm)) for _ in range(4)) - rtt,
                1e-9)
            it = int(r.iters)
            # bytes model: K1 reads data(nd) + z,p windows (1+2K/T each),
            # writes p',q; K2 reads 5, writes 3 vectors
            nd = len(mat.offsets)
            ov = 1.0 + 2 * kern.K / kern.tile
            words = nd + 2 * ov + 2 + 8
            gbs = words * n * 4 * it / t / 1e9
            log(f"tile={kern.tile:5d} (grid {kern.grid:3d}): {t/it*1e6:7.1f} "
                f"µs/iter  model {words:.1f} words/DOF -> {gbs:.0f} GB/s "
                f"implied")
        except Exception as e:
            log(f"tile={tile}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
