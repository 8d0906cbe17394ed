"""Reference-parity distributed construction: per-rank LDU + processor
interfaces -> DistMatrix (the decomposePar path), validated against the
global operator on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ogl_tpu import dist
from ogl_tpu import testing as problems
from ogl_tpu.config import StoppingConfig
from ogl_tpu.core import ldu
from ogl_tpu.dist.from_ranks import DistAssembler, dist_from_ldu_ranks
from ogl_tpu.dist.partition import gather_global, split_vector
from ogl_tpu.solve.stopping import StoppingParams

from tests.test_dist import dist_matvec


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("x",))


def test_decompose_reassembles():
    m = problems.poisson_ldu((12, 6))
    a = problems.poisson_dense((12, 6))
    parts = ldu.decompose(m, 4)
    assert sum(p.n for p in parts) == m.n
    # each rank's local matrix + interfaces reassemble the global matrix
    off = 0
    recon = np.zeros_like(a)
    for part in parts:
        acoo = ldu.ldu_to_coo_host(part)
        from ogl_tpu.core import formats

        recon[off:off + part.n, off:off + part.n] += formats.to_dense(acoo)
        off += part.n
    # off-block entries come from interfaces; check their count
    crossing = np.count_nonzero(a) - np.count_nonzero(recon)
    total_iface = sum(len(pi.face_cells) for p in parts for pi in p.proc_interfaces)
    assert crossing == total_iface


@pytest.mark.parametrize("n_parts", [2, 4, 8])
def test_from_ranks_matvec_matches_global(n_parts):
    m = problems.poisson_ldu((16, 16))
    a = problems.poisson_dense((16, 16))
    parts = ldu.decompose(m, n_parts)
    dm = dist_from_ldu_ranks(parts)
    rng = np.random.default_rng(0)
    x = rng.normal(size=m.n)
    xs = jnp.asarray(split_vector(dm, x))
    y = dist_matvec(dm, _mesh(n_parts), xs)
    np.testing.assert_allclose(gather_global(dm, y), a @ x, rtol=1e-12, atol=1e-12)


def test_from_ranks_cg_solves():
    m = problems.poisson_ldu((16, 8))
    a = problems.poisson_dense((16, 8))
    parts = ldu.decompose(m, 4)
    dm = dist_from_ldu_ranks(parts)
    rng = np.random.default_rng(1)
    x_true = rng.normal(size=m.n)
    b = a @ x_true
    bs = jnp.asarray(split_vector(dm, b))
    sp = StoppingParams.of(StoppingConfig(tolerance=1e-10, rel_tol=0.0, max_iter=500))
    x, res = dist.dist_solve(dm, bs, jnp.zeros_like(bs), sp, _mesh(4), solver="GKOCG")
    assert bool(np.asarray(res.converged).all())
    np.testing.assert_allclose(gather_global(dm, x), x_true, atol=1e-6)


@pytest.mark.parametrize("local_format", ["auto", "Ell"])
def test_assembler_update_is_device_side(local_format):
    """Distributed steady-state coefficient update (the reference's
    update_*_matrix_data + device value overwrite): new values, same
    plan/sparsity, correct operator — via jit'd gathers, no repacking.
    Runs for both the DiaStack fast path and the EllStack fallback."""
    m = problems.poisson_ldu((12, 8))
    parts = ldu.decompose(m, 4)
    asm = DistAssembler(parts, local_format=local_format)
    dm = asm.dm
    import dataclasses

    m2 = dataclasses.replace(m, diag=m.diag + 1.5)
    parts2 = ldu.decompose(m2, 4)
    dm2 = asm.update(parts2)
    assert dm2.plan is dm.plan
    assert type(dm2.local) is type(dm.local)
    a2 = problems.poisson_dense((12, 8)) + 1.5 * np.eye(m.n)
    rng = np.random.default_rng(5)
    x = rng.normal(size=m.n)
    xs = jnp.asarray(split_vector(dm2, x))
    y = dist_matvec(dm2, _mesh(4), xs)
    np.testing.assert_allclose(gather_global(dm2, y), a2 @ x, atol=1e-12)


def test_multiple_interfaces_same_pair():
    """Two ranks coupled through two separate interfaces (like two cyclic
    processor patches): pairwise ordering must survive."""
    # global 1-D chain of 8 cells split 4/4 -> one crossing face; fabricate a
    # second coupling between cell 0 and cell 7 by adding a face (0,7)
    lower = np.array([0, 1, 2, 3, 4, 5, 6, 0])
    upper = np.array([1, 2, 3, 4, 5, 6, 7, 7])
    order = np.lexsort((upper, lower))
    m = ldu.LduMatrix(
        n=8,
        lower_addr=lower[order],
        upper_addr=upper[order],
        diag=np.full(8, 4.0),
        upper=np.full(8, -1.0),
    )
    a = np.zeros((8, 8))
    np.fill_diagonal(a, 4.0)
    for f in range(8):
        a[m.lower_addr[f], m.upper_addr[f]] = m.upper[f]
        a[m.upper_addr[f], m.lower_addr[f]] = m.upper[f]
    parts = ldu.decompose(m, 2)
    dm = dist_from_ldu_ranks(parts)
    rng = np.random.default_rng(2)
    x = rng.normal(size=8)
    xs = jnp.asarray(split_vector(dm, x))
    y = dist_matvec(dm, _mesh(2), xs)
    np.testing.assert_allclose(gather_global(dm, y), a @ x, atol=1e-12)


@pytest.mark.parametrize("kind", ["sym", "asym", "cyclic"])
def test_decompose_reassembles_exact_values(kind):
    """Reassembling local blocks + ProcInterface couplings (A[row, remote]
    = -bouCoeff, the LocalInterface/ProcInterface sign convention) must
    reproduce the global matrix VALUE-exactly — counting crossing entries
    alone would have missed the cyclic-coupling sign regression."""
    import dataclasses as dc

    if kind == "sym":
        m = problems.poisson_ldu((10, 6))
    elif kind == "asym":
        m = problems.convection_diffusion_ldu((10, 6))
    else:
        m0 = problems.poisson_ldu((24,))
        iface = ldu.LocalInterface(rows=np.array([0, 23]), cols=np.array([23, 0]),
                                   coeffs=np.array([1.5, 1.5]))
        m = dc.replace(m0, local_interfaces=(iface,), diag=m0.diag + 1.5)
    a = problems.to_dense_ldu(m)
    parts = ldu.decompose(m, 4)
    bounds = np.cumsum([0] + [p.n for p in parts])
    recon = np.zeros_like(a)
    for i, part in enumerate(parts):
        lo = bounds[i]
        recon[lo:lo + part.n, lo:lo + part.n] += problems.to_dense_ldu(part)
        for pi in part.proc_interfaces:
            # pair with the matching interface on the neighbor: OpenFOAM
            # pairwise contract = same position in each other's lists
            nbr = parts[pi.neighbor]
            mine_on_nbr = [q for q in nbr.proc_interfaces if q.neighbor == i]
            mine = [q for q in part.proc_interfaces if q.neighbor == pi.neighbor]
            k = mine.index(pi)
            twin = mine_on_nbr[k]
            rows = lo + np.asarray(pi.face_cells)
            cols = bounds[pi.neighbor] + np.asarray(twin.face_cells)
            np.add.at(recon, (rows, cols), -np.asarray(pi.coeffs))
    np.testing.assert_allclose(recon, a, rtol=1e-12, atol=1e-12)
