"""Fused distributed CG: the merged-kernel iteration with the halo
exchange folded in (solve/cg_fused_dist.py), validated against the truth
and against the plain dist solver's iteration counts on the virtual mesh
(Pallas interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ogl_tpu import dist
from ogl_tpu import testing as problems
from ogl_tpu.config import StoppingConfig
from ogl_tpu.core import ldu
from ogl_tpu.dist.partition import gather_global, partition_coo, split_vector
from ogl_tpu.solve.cg_fused_dist import dist_cg_fused
from ogl_tpu.solve.stopping import StoppingParams


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("x",))


@pytest.mark.parametrize("n_parts", [2, 4])
def test_dist_cg_fused_matches_plain(n_parts):
    m = problems.poisson_ldu((16, 16))
    a = problems.poisson_dense((16, 16))
    coo = ldu.ldu_to_coo(m)
    dm = partition_coo(coo, n_parts)  # stencil -> DiaStack
    rng = np.random.default_rng(0)
    x_true = rng.normal(size=m.n)
    b = a @ x_true
    bs = jnp.asarray(split_vector(dm, b), jnp.float32)
    mesh = _mesh(n_parts)
    sp = StoppingParams.of(StoppingConfig(tolerance=1e-5, rel_tol=0.0, max_iter=400))

    res = dist_cg_fused(dm, bs, jnp.zeros_like(bs), sp, mesh, interpret=True)
    assert bool(np.asarray(res.converged).all())
    err = np.abs(gather_global(dm, res.x) - x_true).max()
    assert err < 1e-2, err

    # iteration parity with the general dist path (same criterion; f64 b to
    # match the f64 matrix values of the plain path)
    bs64 = jnp.asarray(split_vector(dm, b))
    x2, res2 = dist.dist_solve(dm, bs64, jnp.zeros_like(bs64), sp, mesh,
                               solver="GKOCG")
    it_f = int(np.asarray(res.iters).ravel()[0])
    it_p = int(np.asarray(res2.iters).ravel()[0])
    assert abs(it_f - it_p) <= 2, (it_f, it_p)


def test_dist_cg_fused_jacobi():
    m = problems.poisson_ldu((16, 8))
    a = problems.poisson_dense((16, 8))
    coo = ldu.ldu_to_coo(m)
    dm = partition_coo(coo, 4)
    rng = np.random.default_rng(1)
    x_true = rng.normal(size=m.n)
    b = a @ x_true
    bs = jnp.asarray(split_vector(dm, b), jnp.float32)
    diag_idx = dm.local.offsets.index(0)
    invd = 1.0 / jnp.where(dm.local.data[:, diag_idx] == 0, 1.0,
                           dm.local.data[:, diag_idx]).astype(jnp.float32)
    sp = StoppingParams.of(StoppingConfig(tolerance=1e-5, rel_tol=0.0, max_iter=400))
    res = dist_cg_fused(dm, bs, jnp.zeros_like(bs), sp, _mesh(4),
                        invd_stack=invd, interpret=True)
    assert bool(np.asarray(res.converged).all())
    err = np.abs(gather_global(dm, res.x) - x_true).max()
    assert err < 1e-2, err


def test_dist_cg_fused_identity_zfree_variant_matches():
    """The z-free identity variant (K2i, selected above a working-set
    threshold on hardware) is bitwise-equivalent to the z-carried path
    with invd = 1 — identical iterates across the halo/psum iteration."""
    from ogl_tpu.solve.cg_fused_dist import make_dist_cg_fused_fn

    m = problems.poisson_ldu((16, 16))
    a = problems.poisson_dense((16, 16))
    coo = ldu.ldu_to_coo(m)
    dm = partition_coo(coo, 4)
    rng = np.random.default_rng(2)
    x_true = rng.normal(size=m.n)
    b = a @ x_true
    bs = jnp.asarray(split_vector(dm, b), jnp.float32)
    mesh = _mesh(4)
    sp = StoppingParams.of(StoppingConfig(tolerance=1e-5, rel_tol=0.0, max_iter=400))

    fn_z = make_dist_cg_fused_fn(dm, mesh, interpret=True,
                                 identity_min_bytes=1 << 60)
    fn_i = make_dist_cg_fused_fn(dm, mesh, interpret=True,
                                 identity_min_bytes=0)
    rz = fn_z(dm.local, dm.halo, bs, jnp.zeros_like(bs), None, sp)
    ri = fn_i(dm.local, dm.halo, bs, jnp.zeros_like(bs), None, sp)
    assert bool(np.asarray(ri.converged).all())
    assert int(np.asarray(ri.iters).ravel()[0]) == \
        int(np.asarray(rz.iters).ravel()[0])
    np.testing.assert_array_equal(np.asarray(ri.x), np.asarray(rz.x))


def test_dist_cg_pipe_fused_single_psum_variant():
    """Distributed merged-kernel pipelined CG (one psum/iteration): same
    iteration counts as the classical fused dist path to rounding order,
    identity and Schwarz-Jacobi."""
    from ogl_tpu.solve.cg_fused_dist import (make_dist_cg_fused_fn,
                                             make_dist_cg_pipe_fused_fn)

    m = problems.poisson_ldu((16, 16))
    a = problems.poisson_dense((16, 16))
    coo = ldu.ldu_to_coo(m)
    dm = partition_coo(coo, 4)
    rng = np.random.default_rng(3)
    x_true = rng.normal(size=m.n)
    b = a @ x_true
    bs = jnp.asarray(split_vector(dm, b), jnp.float32)
    mesh = _mesh(4)
    sp = StoppingParams.of(StoppingConfig(tolerance=1e-5, rel_tol=0.0, max_iter=400))

    fn_p = make_dist_cg_pipe_fused_fn(dm, mesh, interpret=True)
    fn_c = make_dist_cg_fused_fn(dm, mesh, interpret=True)
    rp = fn_p(dm.local, dm.halo, bs, jnp.zeros_like(bs), None, sp)
    rc = fn_c(dm.local, dm.halo, bs, jnp.zeros_like(bs), None, sp)
    assert bool(np.asarray(rp.converged).all())
    ip = int(np.asarray(rp.iters).ravel()[0])
    ic = int(np.asarray(rc.iters).ravel()[0])
    assert abs(ip - ic) <= 2, (ip, ic)
    assert np.abs(gather_global(dm, rp.x) - x_true).max() < 1e-2

    invd = 1.0 / np.asarray(m.diag)
    ivs = jnp.asarray(split_vector(dm, invd), jnp.float32)
    fn_j = make_dist_cg_pipe_fused_fn(dm, mesh, use_invd=True, interpret=True)
    rj = fn_j(dm.local, dm.halo, bs, jnp.zeros_like(bs), ivs, sp)
    assert bool(np.asarray(rj.converged).all())
    assert np.abs(gather_global(dm, rj.x) - x_true).max() < 1e-2


@pytest.mark.parametrize("pipelined", [False, True])
def test_dist_cg_fused_self_halo_parity(pipelined):
    """Self-neighbor halo route (cyclic_via_halo, the single-chip halo
    configuration): the fused and fused-pipelined dist-CG execute a d=0
    ppermute round per iteration and match the local-column route's
    iterations and solution."""
    from ogl_tpu.dist.from_ranks import dist_from_ldu_ranks
    from ogl_tpu.solve.cg_fused_dist import (
        make_dist_cg_fused_fn, make_dist_cg_pipe_fused_fn)

    m = problems.channel_ldu((32, 8))
    a = problems.to_dense_ldu(m)
    rng = np.random.default_rng(0)
    x_true = rng.normal(size=m.n)
    b = (a @ x_true).astype(np.float32)
    sp = StoppingParams.of(StoppingConfig(
        tolerance=1e-5, rel_tol=0.0, max_iter=600, frequency=1))
    mesh = _mesh(1)
    builder = make_dist_cg_pipe_fused_fn if pipelined else make_dist_cg_fused_fn

    its = {}
    for via_halo in (True, False):
        parts = ldu.decompose(m, 1, cyclic_via_halo=via_halo)
        dm = dist_from_ldu_ranks(parts, dtype=np.float32)
        assert (0 in dm.plan.offsets) == via_halo
        fn = builder(dm, mesh, interpret=True)
        bs = jnp.asarray(split_vector(dm, b), jnp.float32)
        res = fn(dm.local, dm.halo, bs, jnp.zeros_like(bs), None, sp)
        assert bool(np.ravel(res.converged)[0])
        err = np.abs(gather_global(dm, res.x) - x_true).max()
        assert err < 1e-2, err
        its[via_halo] = int(np.ravel(res.iters)[0])
    assert its[True] == its[False], its


def _wide_gdia_system(dims=(64, 16), n_parts=4):
    """Poisson + wide intra-shard couplings: the DIA union overflows, so
    partition_coo's auto ladder lands GdiaStack."""
    m0 = problems.poisson_ldu(dims)
    n = m0.n
    per = n // n_parts
    er = np.arange(0, n - 131)
    ec = er + 30 + (er % 100)
    keep = (er // per) == (ec // per)  # intra-shard couplings only
    er, ec = er[keep], ec[keep]
    la = np.concatenate([m0.lower_addr, er])
    ua = np.concatenate([m0.upper_addr, ec])
    order = np.lexsort((ua, la))
    m = ldu.LduMatrix(
        n=n, lower_addr=la[order], upper_addr=ua[order],
        diag=m0.diag + 0.2,
        upper=np.concatenate([m0.upper, np.full(len(er), -0.01)])[order])
    from ogl_tpu.core import formats as fmts

    a = fmts.to_dense(ldu.ldu_to_coo_host(m))
    return m, a


def test_dist_cg_fused_gdia_stack():
    """The merged-kernel dist-CG accepts a GdiaStack local operator
    (lane-gather K1): converges and iteration-matches the general path."""
    from ogl_tpu.dist.partition import GdiaStack

    n_parts = 4
    m, a = _wide_gdia_system(n_parts=n_parts)
    coo = ldu.ldu_to_coo(m)
    dm = partition_coo(coo, n_parts)
    assert isinstance(dm.local, GdiaStack), type(dm.local)
    rng = np.random.default_rng(5)
    x_true = rng.normal(size=m.n)
    b = a @ x_true
    bs = jnp.asarray(split_vector(dm, b), jnp.float32)
    mesh = _mesh(n_parts)
    sp = StoppingParams.of(StoppingConfig(tolerance=1e-5, rel_tol=0.0,
                                          max_iter=800))
    res = dist_cg_fused(dm, bs, jnp.zeros_like(bs), sp, mesh, interpret=True)
    assert bool(np.asarray(res.converged).all())
    err = np.abs(gather_global(dm, res.x) - x_true).max()
    assert err < 1e-2, err
    bs64 = jnp.asarray(split_vector(dm, b))
    _, res2 = dist.dist_solve(dm, bs64, jnp.zeros_like(bs64), sp, mesh,
                              solver="GKOCG")
    it_f = int(np.asarray(res.iters).ravel()[0])
    it_p = int(np.asarray(res2.iters).ravel()[0])
    assert abs(it_f - it_p) <= 2, (it_f, it_p)


def test_dist_cg_fused_gdia_jacobi_invd():
    """BJ maxBlockSize=1 on a GdiaStack: the invd stack comes from the
    generalized local_diag (plane-0 lane match)."""
    from ogl_tpu.dist.partition import GdiaStack
    from ogl_tpu.foam.dist_solver import _jacobi_invd_stack

    n_parts = 4
    m, a = _wide_gdia_system(dims=(64, 8), n_parts=n_parts)
    coo = ldu.ldu_to_coo(m)
    dm = partition_coo(coo, n_parts)
    assert isinstance(dm.local, GdiaStack)
    invd = _jacobi_invd_stack(dm.local, dm.n_local)
    # cross-check against the dense diagonal per shard
    per = m.n // n_parts
    for i in range(n_parts):
        d_ref = np.diag(a)[i * per:(i + 1) * per]
        np.testing.assert_allclose(np.asarray(invd[i][:per]),
                                   (1.0 / d_ref).astype(np.float32),
                                   rtol=1e-5)
    rng = np.random.default_rng(6)
    x_true = rng.normal(size=m.n)
    b = a @ x_true
    bs = jnp.asarray(split_vector(dm, b), jnp.float32)
    sp = StoppingParams.of(StoppingConfig(tolerance=1e-5, rel_tol=0.0,
                                          max_iter=800))
    res = dist_cg_fused(dm, bs, jnp.zeros_like(bs), sp, _mesh(n_parts),
                        invd_stack=invd, interpret=True)
    assert bool(np.asarray(res.converged).all())
    err = np.abs(gather_global(dm, res.x) - x_true).max()
    assert err < 1e-2, err


def test_pipelined_gdia_falls_back_cleanly():
    """pipelinedCG + a Gdia operator must take the GENERAL pipelined path
    (the fused ka kernel is Dia-only — it used to crash at trace with an
    opaque AttributeError)."""
    from ogl_tpu import foam, registry

    registry.global_registry.clear()
    m, a = _wide_gdia_system(dims=(64, 8), n_parts=1)
    rng = np.random.default_rng(7)
    x_true = rng.normal(size=m.n)
    b = a @ x_true
    x, perf = foam.solve("pipe_gdia", m, b,
                         {"solver": "GKOCG", "tolerance": 1e-6, "relTol": 0,
                          "maxIter": 2000, "pipelinedCG": True})
    assert perf.converged
    err = np.abs(np.asarray(x) - x_true).max()
    assert err < 1e-2, err
    registry.global_registry.clear()


def _unstructured_spd(n=768, deg=4, seed=3):
    import scipy.sparse as sp_

    rng = np.random.default_rng(seed)
    src = np.repeat(np.arange(n), deg)
    dst = rng.integers(0, n, size=n * deg)
    keep = src != dst
    r = np.concatenate([src[keep], dst[keep], np.arange(n)])
    c = np.concatenate([dst[keep], src[keep], np.arange(n)])
    v = rng.normal(size=len(r))
    m = sp_.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
    m = m + m.T
    m = sp_.diags(np.abs(m).sum(axis=1).A1 + 1.0) - sp_.diags(m.diagonal()) + m
    mc = m.tocoo()
    order = np.lexsort((mc.col, mc.row))
    from ogl_tpu.core.formats import Coo

    return Coo(rows=mc.row[order].astype(np.int32),
               cols=mc.col[order].astype(np.int32),
               vals=mc.data[order].astype(np.float64),
               shape=(n, n)), m


@pytest.mark.parametrize("force_spill", [False, True])
def test_dist_cg_fused_xell_matches_plain(monkeypatch, force_spill):
    """Merged-kernel dist-CG on an XellStack local operator (unstructured
    shards): iteration parity with the general dist path and correct
    solution — including through the PER-SHARD in-kernel spill tables
    (force_spill packs with a generous spill budget so the tables carry
    real entries)."""
    from ogl_tpu.dist.partition import XellStack

    if force_spill:
        import ogl_tpu.kernels.xell as xk

        orig = xk.xell_layout

        def leaky(*a, **kw):
            kw["spill_frac"] = 0.3
            return orig(*a, **kw)

        monkeypatch.setattr(xk, "xell_layout", leaky)

    coo, acsr = _unstructured_spd()
    n = coo.shape[0]
    nparts = 4
    dm = partition_coo(coo, nparts, local_format="Xell")
    assert isinstance(dm.local, XellStack)
    if force_spill:
        assert dm.local.spill_e > 0, "spill tables not exercised"
    rng = np.random.default_rng(4)
    x_true = rng.normal(size=n)
    b = acsr @ x_true
    bs = jnp.asarray(split_vector(dm, b), jnp.float32)
    mesh = _mesh(nparts)
    sp = StoppingParams.of(StoppingConfig(
        tolerance=5e-5, rel_tol=0.0, max_iter=600, frequency=1))
    res = dist_cg_fused(dm, bs, jnp.zeros_like(bs), sp, mesh, interpret=True)
    assert bool(np.asarray(res.converged).all())
    err = np.abs(gather_global(dm, res.x) - x_true).max() / \
        np.abs(x_true).max()
    assert err < 1e-2, err

    # iteration parity with the general dist path (f64 values there)
    bs64 = jnp.asarray(split_vector(dm, b))
    _, res2 = dist.dist_solve(dm, bs64, jnp.zeros_like(bs64), sp, mesh,
                              solver="GKOCG")
    it_f = int(np.asarray(res.iters).ravel()[0])
    it_p = int(np.asarray(res2.iters).ravel()[0])
    assert abs(it_f - it_p) <= 2, (it_f, it_p)


def test_dist_cg_fused_xell_jacobi(monkeypatch):
    """Schwarz-Jacobi (BJ maxBlockSize=1) through the XellStack merged
    path with forced spill."""
    import ogl_tpu.kernels.xell as xk

    orig = xk.xell_layout

    def leaky(*a, **kw):
        kw["spill_frac"] = 0.3
        return orig(*a, **kw)

    monkeypatch.setattr(xk, "xell_layout", leaky)
    from ogl_tpu.foam.dist_solver import _jacobi_invd_stack

    coo, acsr = _unstructured_spd(seed=9)
    n = coo.shape[0]
    dm = partition_coo(coo, 4, local_format="Xell")
    assert dm.local.spill_e > 0
    rng = np.random.default_rng(5)
    x_true = rng.normal(size=n)
    b = acsr @ x_true
    bs = jnp.asarray(split_vector(dm, b), jnp.float32)
    invd = _jacobi_invd_stack(dm.local, dm.n_local)
    sp = StoppingParams.of(StoppingConfig(
        tolerance=5e-5, rel_tol=0.0, max_iter=600))
    res = dist_cg_fused(dm, bs, jnp.zeros_like(bs), sp, _mesh(4),
                        invd_stack=invd, interpret=True)
    assert bool(np.asarray(res.converged).all())
    err = np.abs(gather_global(dm, res.x) - x_true).max() / \
        np.abs(x_true).max()
    assert err < 1e-2, err
