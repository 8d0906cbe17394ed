"""Merged-kernel CG (interpret mode on CPU) vs the reference CG solver:
identical iteration counts and solutions."""

import jax.numpy as jnp
import numpy as np
import pytest

from ogl_tpu import testing as problems
from ogl_tpu.config import StoppingConfig
from ogl_tpu.core import formats, ldu
from ogl_tpu.kernels import spmv
from ogl_tpu.kernels.fused import make_cg_kernels
from ogl_tpu.precond.jacobi import diagonal_of
from ogl_tpu.solve import cg
from ogl_tpu.solve.cg_fused import cg_fused
from ogl_tpu.solve.krylov import single_device_ops


def _setup(dims):
    m = problems.poisson_ldu(dims)
    coo = ldu.ldu_to_coo_host(m, dtype=np.float32)
    mat = formats.coo_to_dia(coo)
    a = problems.poisson_dense(dims)
    rng = np.random.default_rng(0)
    x_true = rng.normal(size=m.n).astype(np.float32)
    b = jnp.asarray((a @ x_true).astype(np.float32))
    return coo, mat, b, x_true


CFG = StoppingConfig(tolerance=5e-5, rel_tol=0.0, max_iter=400)


@pytest.mark.parametrize("dims", [(128, 8), (96, 11)])
def test_fused_matches_reference_cg(dims):
    coo, mat, b, x_true = _setup(dims)
    kern, data3 = make_cg_kernels(mat, tile=16, interpret=True)
    res_f = cg_fused(kern, data3, b, jnp.zeros_like(b), CFG)
    ops = single_device_ops(spmv.matvec(mat), mat.shape[0])
    res_r = cg(ops, b, jnp.zeros_like(b), CFG)
    assert bool(res_f.converged) and bool(res_r.converged)
    assert int(res_f.iters) == int(res_r.iters)
    np.testing.assert_allclose(
        float(res_f.final_res_norm), float(res_r.final_res_norm), rtol=1e-3
    )
    np.testing.assert_allclose(np.asarray(res_f.x), np.asarray(res_r.x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res_f.x), x_true, atol=5e-2)


def test_wide_stencil_raises_tile_to_cover_halo():
    """Large 3-D z-strides make the halo exceed the default 512-row tile
    (8.4M-DOF 256x256x128: offset ±65536 -> K=520).  The plan must raise
    the tile (interior >= 2x halo) instead of rejecting — the foam auto
    path otherwise silently loses the fused route for big problems."""
    from ogl_tpu.kernels.fused import CgKernels

    n = 256 * 256 * 128
    offs = (-65536, -256, -1, 0, 1, 256, 65536)
    kern = CgKernels(n, offs)
    assert kern.K == 520
    assert kern.tile >= 2 * kern.K
    assert kern.rp % kern.tile == 0
    # small problems with modest offsets keep the requested tile
    k2 = CgKernels(1 << 16, (-128, -1, 0, 1, 128))
    assert k2.tile <= 512


def test_fused_with_jacobi_precond():
    coo, mat, b, x_true = _setup((128, 8))
    invd = jnp.asarray((1.0 / diagonal_of(coo)).astype(np.float32))
    kern, data3 = make_cg_kernels(mat, tile=16, interpret=True)
    res_pc = cg_fused(kern, data3, b, jnp.zeros_like(b), CFG, invd=invd)
    res_no = cg_fused(kern, data3, b, jnp.zeros_like(b), CFG)
    assert bool(res_pc.converged)
    assert int(res_pc.iters) <= int(res_no.iters)
    np.testing.assert_allclose(np.asarray(res_pc.x), x_true, atol=5e-2)


def test_fused_apply_matches_spmv():
    coo, mat, b, _ = _setup((128, 8))
    kern, data3 = make_cg_kernels(mat, tile=16, interpret=True)
    y = kern.unframe(kern.apply(data3, kern.frame(b)))
    y_ref = spmv.spmv(mat, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-3)


def test_fused_min_iter_and_frequency():
    coo, mat, b, _ = _setup((128, 8))
    kern, data3 = make_cg_kernels(mat, tile=16, interpret=True)
    cfg = StoppingConfig(tolerance=5e-5, rel_tol=0.0, max_iter=400, frequency=8)
    res = cg_fused(kern, data3, b, jnp.zeros_like(b), cfg)
    assert bool(res.converged)
    assert int(res.iters) % 8 == 0


def test_fused_gdia_matches_reference_cg():
    from ogl_tpu.kernels.gdia import gdia_from_coo

    coo, mat, b, x_true = _setup((128, 8))
    g = gdia_from_coo(coo)
    kern, data3 = make_cg_kernels(g, tile=16, interpret=True)
    res_f = cg_fused(kern, data3, b, jnp.zeros_like(b), CFG)
    ops = single_device_ops(spmv.matvec(mat), mat.shape[0])
    res_r = cg(ops, b, jnp.zeros_like(b), CFG)
    assert bool(res_f.converged)
    assert int(res_f.iters) == int(res_r.iters)
    np.testing.assert_allclose(np.asarray(res_f.x), np.asarray(res_r.x), atol=1e-3)


def test_fused_bicgstab_matches_reference():
    from ogl_tpu.solve import bicgstab
    from ogl_tpu.solve.bicgstab_fused import bicgstab_fused

    coo, mat, b, x_true = _setup((128, 8))
    kern, data3 = make_cg_kernels(mat, tile=16, interpret=True)
    res_f = bicgstab_fused(kern, data3, b, jnp.zeros_like(b), CFG)
    ops = single_device_ops(spmv.matvec(mat), mat.shape[0])
    res_r = bicgstab(ops, b, jnp.zeros_like(b), CFG)
    assert bool(res_f.converged) and bool(res_r.converged)
    assert int(res_f.iters) == int(res_r.iters)
    np.testing.assert_allclose(np.asarray(res_f.x), np.asarray(res_r.x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res_f.x), x_true, atol=5e-2)


def test_fused_bicgstab_nonsymmetric():
    from ogl_tpu.core.formats import coo_from_dense, coo_to_dia
    from ogl_tpu.solve.bicgstab_fused import bicgstab_fused

    n = 256
    rng = np.random.default_rng(0)
    a = np.diag(np.full(n, 3.0)) + np.diag(np.full(n - 1, -2.0), -1) + np.diag(
        np.full(n - 1, -0.5), 1)
    mat = coo_to_dia(coo_from_dense(a.astype(np.float32)))
    x_true = rng.normal(size=n).astype(np.float32)
    b = jnp.asarray((a @ x_true).astype(np.float32))
    kern, data3 = make_cg_kernels(mat, tile=16, interpret=True)
    res = bicgstab_fused(kern, data3, b, jnp.zeros_like(b),
                         StoppingConfig(tolerance=1e-5, rel_tol=0.0, max_iter=600))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-3)


def test_fused_smoother_kernels():
    """ksweep/kresid (the AMG smoother passes) against the unfused forms."""
    coo, mat, b, x_true = _setup((128, 8))
    n = mat.shape[0]
    kern, data3 = make_cg_kernels(mat, tile=16, interpret=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    invd = jnp.asarray((1.0 / diagonal_of(coo)).astype(np.float32))
    relax = 0.9

    ax = spmv.spmv(mat, x)
    want_sweep = np.asarray(x + relax * invd * (b - ax))
    got_sweep = np.asarray(kern.unframe(kern.ksweep(
        data3, kern.frame(x), kern.frame(b), kern.frame(invd), relax)))
    np.testing.assert_allclose(got_sweep, want_sweep, rtol=2e-5, atol=2e-5)

    want_resid = np.asarray(b - ax)
    got_resid = np.asarray(kern.unframe(kern.kresid(
        data3, kern.frame(x), kern.frame(b))))
    np.testing.assert_allclose(got_resid, want_resid, rtol=2e-5, atol=2e-5)


def test_fused_cg_with_framed_amg():
    """Merged-kernel PCG with the AMG V-cycle applied on the framed
    residual: same iteration count and solution as the general path."""
    import sys

    from ogl_tpu import precond as _p
    from ogl_tpu.kernels.fused import CgKernels

    amgmod = sys.modules["ogl_tpu.precond.amg"]
    coo, mat, b, x_true = _setup((128, 8))
    n = mat.shape[0]

    def interpret_plan(m_, inv_diag):
        from ogl_tpu.core.formats import Dia

        if not isinstance(m_, Dia) or not m_.offsets:
            return None, None, None
        try:
            plan = CgKernels(m_.shape[0], m_.offsets, tile=16, interpret=True)
        except ValueError:
            return None, None, None
        return plan, plan.pack_values(m_), plan.frame(inv_diag)

    orig = amgmod._fused_plan
    amgmod._fused_plan = interpret_plan
    try:
        op = _p.amg(coo, width=4)
    finally:
        amgmod._fused_plan = orig
    assert op.fine_plan is not None

    kern, data3 = make_cg_kernels(mat, tile=16, interpret=True)
    assert op.fine_plan == kern
    res_f = cg_fused(kern, data3, b, jnp.zeros_like(b), CFG,
                     precond_framed=lambda rf: op.framed_fn(op.state, rf))
    ops = single_device_ops(spmv.matvec(mat), n,
                            precond=lambda r: op.apply_fn(op.state, r))
    res_r = cg(ops, b, jnp.zeros_like(b), CFG)
    assert bool(res_f.converged) and bool(res_r.converged)
    assert abs(int(res_f.iters) - int(res_r.iters)) <= 1
    np.testing.assert_allclose(np.asarray(res_f.x), x_true, atol=5e-2)


def test_fused_inner_ir_bf16_interpret():
    """Mixed-precision GKOIR shape on the fused kernels: inner CG streams
    a bfloat16-packed data3 (kernels accumulate f32 in-kernel), outer
    Richardson computes exact f32 residuals — converges to f32 tolerance."""
    from ogl_tpu.solve.ir import ir

    coo, mat, b, x_true = _setup((128, 8))
    kern, _ = make_cg_kernels(mat, tile=16, interpret=True)
    data3 = kern.pack_values(mat, dtype=jnp.bfloat16)
    inner_cfg = StoppingConfig(tolerance=1e-2, rel_tol=0.0, max_iter=200)
    outer_cfg = StoppingConfig(tolerance=1e-6, rel_tol=0.0, max_iter=50)
    ops = single_device_ops(spmv.matvec(mat), mat.shape[0])
    res = ir(ops, b, jnp.zeros_like(b), outer_cfg,
             inner_solve=lambda r: cg_fused(
                 kern, data3, r, jnp.zeros_like(r), inner_cfg).x)
    assert bool(res.converged)
    assert float(res.final_res_norm) < 1e-6
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=5e-3)


def test_fused_identity_zfree_variant_matches():
    """The z-free identity-preconditioning variant (K2i; selected above a
    working-set threshold on hardware) produces the same iterates as the
    z-carried path: with invd = 1 exactly, rho = <r, 1*r> == <r, r>
    bitwise, so iteration counts and solutions must agree."""
    coo, mat, b, x_true = _setup((128, 8))
    kern, data3 = make_cg_kernels(mat, tile=16, interpret=True)
    res_z = cg_fused(kern, data3, b, jnp.zeros_like(b), CFG,
                     identity_min_bytes=1 << 60)  # force z-carried
    res_i = cg_fused(kern, data3, b, jnp.zeros_like(b), CFG,
                     identity_min_bytes=0)  # force z-free K2i
    assert bool(res_i.converged)
    assert int(res_i.iters) == int(res_z.iters)
    np.testing.assert_array_equal(np.asarray(res_i.x), np.asarray(res_z.x))


def test_fused_pipelined_matches_classical():
    """Merged-kernel Chronopoulos–Gear CG (solve/cg_pipe_fused.py): same
    iterates as the general pipelined solver and classical-CG iteration
    counts to rounding order; Jacobi variant converges to the truth."""
    from ogl_tpu.solve.cg_pipe import cg_pipelined
    from ogl_tpu.solve.cg_pipe_fused import cg_pipelined_fused

    coo, mat, b, x_true = _setup((128, 8))
    kern, data3 = make_cg_kernels(mat, tile=16, interpret=True)
    res_f = cg_pipelined_fused(kern, data3, b, jnp.zeros_like(b), CFG)
    ops = single_device_ops(spmv.matvec(mat), mat.shape[0])
    res_p = cg_pipelined(ops, b, jnp.zeros_like(b), CFG)
    res_c = cg(ops, b, jnp.zeros_like(b), CFG)
    assert bool(res_f.converged)
    assert int(res_f.iters) == int(res_p.iters)
    assert abs(int(res_f.iters) - int(res_c.iters)) <= 2
    assert np.abs(np.asarray(res_f.x) - x_true).max() < 5e-3

    invd = jnp.asarray(1.0 / np.asarray(coo_diag(coo)), jnp.float32)
    res_j = cg_pipelined_fused(kern, data3, b, jnp.zeros_like(b), CFG,
                               invd=invd)
    assert bool(res_j.converged)
    assert np.abs(np.asarray(res_j.x) - x_true).max() < 5e-3


def coo_diag(coo):
    d = np.zeros(coo.shape[0], np.float32)
    rows, cols, vals = (np.asarray(coo.rows), np.asarray(coo.cols),
                        np.asarray(coo.vals))
    m = rows == cols
    d[rows[m]] = vals[m]
    return d
