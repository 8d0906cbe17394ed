"""Pallas DIA kernel tests (interpret mode on CPU; the same kernel runs
compiled on TPU — verified on hardware, see bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ogl_tpu import testing as problems
from ogl_tpu.core import formats, ldu
from ogl_tpu.kernels import spmv
from ogl_tpu.kernels.pallas_spmv import dia_matvec


@pytest.mark.parametrize("dims", [(128, 16, 4), (64, 8), (200,)])
def test_pallas_dia_matches_xla(dims):
    m = problems.poisson_ldu(dims)
    mat = formats.coo_to_dia(ldu.ldu_to_coo_host(m, dtype=np.float32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=m.n).astype(np.float32))
    y_ref = np.asarray(spmv.spmv(mat, x))
    y = np.asarray(dia_matvec(mat, tile=64, interpret=True)(x))
    np.testing.assert_allclose(y, y_ref, atol=1e-4 * max(1.0, np.abs(y_ref).max()))


def test_pallas_dia_negative_and_positive_lane_offsets():
    # offsets ±1 exercise both lane-roll directions; ±5 a non-128 row case
    n = 512
    rng = np.random.default_rng(1)
    a = np.zeros((n, n))
    for off in (-5, -1, 0, 1, 5):
        idx = np.arange(max(0, -off), min(n, n - off))
        a[idx, idx + off] = rng.normal(size=len(idx))
    mat = formats.coo_to_dia(formats.coo_from_dense(a.astype(np.float32)))
    x = rng.normal(size=n).astype(np.float32)
    y = np.asarray(dia_matvec(mat, tile=8, interpret=True)(jnp.asarray(x)))
    np.testing.assert_allclose(y, a @ x, atol=1e-4)


def test_pallas_fallback_without_offsets():
    mat = formats.coo_to_dia(formats.coo_from_dense(np.eye(8, dtype=np.float32)))
    x = jnp.ones(8, jnp.float32)
    np.testing.assert_allclose(np.asarray(dia_matvec(mat)(x)), np.ones(8))
