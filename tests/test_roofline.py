"""Roofline measurement harness: the numbers the bench publishes must come
from defensible machinery (VERDICT r2 item 1 — a >100%-of-peak readout is a
harness bug, not a win)."""

import jax.numpy as jnp
import numpy as np

from ogl_tpu import testing as problems
from ogl_tpu.core import formats, ldu
from ogl_tpu.kernels import roofline, spmv


def test_measure_chained_absolute_and_positive():
    m = problems.poisson_ldu((24, 24))
    mat = formats.coo_to_dia(ldu.ldu_to_coo_host(m, dtype=np.float32))
    mv = spmv.matvec(mat)
    r = roofline.measure_chained(
        mv, jnp.ones((m.n,), jnp.float32), iters=64,
        bytes_moved=roofline.spmv_bytes(mat),
        flops=roofline.spmv_flops(mat))
    assert r.seconds > 0 and np.isfinite(r.gbps)
    # the fixed dispatch cost is subtracted but never over-subtracted:
    # a longer chain cannot report a larger per-iteration time scale-up
    r2 = roofline.measure_chained(
        mv, jnp.ones((m.n,), jnp.float32), iters=256,
        bytes_moved=roofline.spmv_bytes(mat))
    assert r2.seconds < 20 * r.seconds  # same order of magnitude


def test_measure_chained_auto_iters():
    m = problems.poisson_ldu((16, 16))
    mat = formats.coo_to_dia(ldu.ldu_to_coo_host(m, dtype=np.float32))
    mv = spmv.matvec(mat)
    r = roofline.measure_chained(mv, jnp.ones((m.n,), jnp.float32),
                                 target_seconds=0.05,
                                 bytes_moved=roofline.spmv_bytes(mat))
    assert r.seconds > 0


def test_stream_peak_runs():
    bw = roofline.measure_stream_peak(n=1 << 18, target_seconds=0.05)
    assert bw > 0 and np.isfinite(bw)


def test_read_peak_runs():
    bw = roofline.measure_read_peak(read_streams=3, rows=256, chain_len=50)
    assert bw > 0 and np.isfinite(bw)


def test_sell_bytes_tracks_buckets():
    """spmv_bytes for SELL must use the bucketed footprint, not a
    global-max-width product."""
    m = problems.poisson_ldu((20, 20))
    coo = ldu.ldu_to_coo_host(m)
    sell = formats.coo_to_sell(coo, slice_height=8)
    bytes_ = roofline.spmv_bytes(sell)
    vs = np.dtype(sell.dtype).itemsize
    assert bytes_ == sell.stored * (vs + 4) + 2 * m.n * vs
