"""Graph-partitioned decomposition (the decomposePar-scotch role): the
renumber primitive, the recursive-bisection partitioner, and the
`decomposition scotch` end-to-end path through DistFoamSolver.  Mirrors the
reference integration matrix's decomposition axis (test/integration.yaml:
47-57: simple-2 / simple-8 / scotch-8)."""

import dataclasses

import numpy as np
import pytest

from ogl_tpu import foam
from ogl_tpu import testing as problems
from ogl_tpu.core import graph, ldu
from ogl_tpu.core.formats import to_dense


def _dense(m):
    return to_dense(ldu.ldu_to_coo_host(m))


def _perm_matrix_check(m, perm):
    """P A Pᵀ of the dense original == dense of the renumbered LDU."""
    a = _dense(m)
    a2 = _dense(ldu.renumber(m, perm))
    np.testing.assert_allclose(a2, a[np.ix_(perm, perm)], atol=0)


def test_renumber_symmetric_poisson():
    m = problems.poisson_ldu((9, 7))
    rng = np.random.default_rng(3)
    _perm_matrix_check(m, rng.permutation(m.n))


def test_renumber_nonsymmetric():
    m = problems.convection_diffusion_ldu((8, 6), peclet=0.7)
    assert not m.symmetric
    rng = np.random.default_rng(4)
    _perm_matrix_check(m, rng.permutation(m.n))


def test_renumber_with_cyclic_interface():
    m = problems.channel_ldu((12, 6))
    assert m.local_interfaces
    rng = np.random.default_rng(5)
    perm = rng.permutation(m.n)
    m2 = ldu.renumber(m, perm)
    assert m2.local_interfaces  # interfaces survive as interfaces
    _perm_matrix_check(m, perm)


def test_bisection_balance_and_cut():
    # long-thin grid numbered x-fastest: contiguous blocks of n/8 = 64
    # cells are single x-lines, so every "simple" cut is a y-normal plane
    # of 64 edges (7 × 64 = 448 total); the good cuts are the x-normal
    # planes of only ny = 8 edges, which the graph partitioner must find
    # from connectivity alone
    nx, ny = 64, 8
    m = problems.poisson_ldu((nx, ny))

    owner = ldu.partition_cells(m, 8, "scotch")
    sizes = np.bincount(owner, minlength=8)
    assert sizes.min() >= m.n // 8 - 1 and sizes.max() <= -(-m.n // 8) + 1

    r = np.asarray(m.lower_addr)
    c = np.asarray(m.upper_addr)
    simple = ldu.partition_cells(m, 8, "simple")
    cut_g = graph.edge_cut(r, c, owner)
    cut_s = graph.edge_cut(r, c, simple)
    assert cut_s >= 400  # the bad slabs, as constructed
    assert cut_g < cut_s / 3, (cut_g, cut_s)


def test_decompose_with_map_roundtrip():
    """Graph decompose = renumber + block split: reassembling the parts as a
    global operator in the NEW numbering reproduces P A Pᵀ."""
    m = problems.poisson_ldu((10, 10))
    parts, perm = ldu.decompose_with_map(m, 4, "bisect")
    assert perm is not None and len(parts) == 4
    a_perm = _dense(m)[np.ix_(perm, perm)]
    # reassemble: local blocks on the block diagonal, proc-interface
    # couplings as off-diagonal entries (coeffs are NOT-yet-negated
    # bouCoeffs: matrix entry = -coeff, cf. ldu.decompose docstring)
    sizes = [p.n for p in parts]
    off = np.concatenate([[0], np.cumsum(sizes)])
    a2 = np.zeros_like(a_perm)
    for i, p in enumerate(parts):
        a2[off[i]:off[i + 1], off[i]:off[i + 1]] = _dense(p)
    # crossing couplings: each side's ProcInterface rows pair with the
    # matching face slot of the neighbour's interface back to it
    for i, p in enumerate(parts):
        for pi in p.proc_interfaces:
            back = [q for q in parts[pi.neighbor].proc_interfaces
                    if q.neighbor == i]
            assert len(back) >= 1
            # face order is identical on both sides (pairwise contract);
            # match by position within the first interface pair
            q = back[0]
            rows = off[i] + np.asarray(pi.face_cells)
            cols = off[pi.neighbor] + np.asarray(q.face_cells)
            kmax = min(len(rows), len(cols))
            a2[rows[:kmax], cols[:kmax]] += -np.asarray(pi.coeffs)[:kmax]
    np.testing.assert_allclose(a2, a_perm, atol=0)


def test_partition_map_matches_decompose_with_map():
    """The public partition_map helper and decompose_with_map agree (they
    share the implementation; this pins the contract)."""
    m = problems.poisson_ldu((10, 10))
    perm, bounds = ldu.partition_map(m, 4, "bisect")
    parts, perm2 = ldu.decompose_with_map(m, 4, "bisect")
    np.testing.assert_array_equal(perm, perm2)
    assert [p.n for p in parts] == np.diff(bounds).tolist()
    assert ldu.partition_map(m, 4, "simple")[0] is None


def test_empty_part_decompositions_rejected():
    """n_parts > n_cells would create zero-cell rank matrices downstream."""
    m = problems.poisson_ldu((2, 2))
    for method in ("simple", "bisect"):
        with pytest.raises(ValueError, match="n_parts"):
            ldu.partition_map(m, 5, method)
    adj = graph.adjacency_from_edges(
        m.n, np.asarray(m.lower_addr), np.asarray(m.upper_addr))
    with pytest.raises(ValueError, match="empty"):
        graph.recursive_bisection(adj, 5)


def test_decomposition_key_rejected_for_rank_lists():
    """An already-decomposed list of per-rank systems cannot be
    re-partitioned: a non-simple decomposition key is a loud error on the
    single-process path too (mirrors the _solve_multiproc guard)."""
    parts = ldu.decompose(problems.poisson_ldu((8, 8)), 2)
    b = np.ones(64)
    with pytest.raises(ValueError, match="decomposition"):
        foam.solve_distributed(
            "pranks_scotch", parts, b,
            {"solver": "GKOCG", "decomposition": "scotch"})


@pytest.mark.parametrize("precond", ["none", "BJ"])
def test_dist_foam_scotch_end_to_end(precond):
    m = problems.poisson_ldu((16, 12))
    a = problems.poisson_dense((16, 12))
    rng = np.random.default_rng(11)
    x_true = rng.normal(size=m.n)
    b = a @ x_true
    controls = {"solver": "GKOCG", "tolerance": 1e-10, "relTol": 0,
                "maxIter": 600, "dtype": "float64",
                "preconditioner": precond, "decomposition": "scotch"}
    x, perf = foam.solve_distributed(f"pscotch_{precond}", m, b, controls)
    assert perf.converged
    np.testing.assert_allclose(x, x_true, atol=1e-6)

    # iteration parity with the simple decomposition (same operator, same
    # stopping): Schwarz-block CONTENT differs so allow a small band
    c2 = dict(controls)
    c2["decomposition"] = "simple"
    x2, perf2 = foam.solve_distributed(f"psimple_{precond}", m, b, c2)
    assert abs(perf.n_iterations - perf2.n_iterations) <= max(
        3, perf2.n_iterations // 10)


def test_dist_foam_scotch_steady_state_and_guess():
    """Steady-state coefficient updates reuse the cached partition, and
    updateInitGuess feeds the permuted previous solution back correctly."""
    m = problems.channel_ldu((12, 10))
    a = _dense(m)
    rng = np.random.default_rng(7)
    x_true = rng.normal(size=m.n)
    b = a @ x_true
    controls = {"solver": "GKOCG", "tolerance": 1e-10, "relTol": 0,
                "maxIter": 800, "dtype": "float64",
                "decomposition": "bisect", "updateInitGuess": True}
    x1, p1 = foam.solve_distributed("pch_sc", m, b, controls)
    np.testing.assert_allclose(x1, x_true, atol=1e-6)
    # coefficient update: double diag + upper but NOT the cyclic interface
    # coefficients — the operator changes non-uniformly, so recompute the
    # RHS from the actual updated operator
    m2 = dataclasses.replace(m, diag=2 * np.asarray(m.diag),
                             upper=2 * np.asarray(m.upper))
    b2 = _dense(m2) @ x_true
    x2, p2 = foam.solve_distributed("pch_sc", m2, b2, {}, psi=x1)
    assert p2.converged
    np.testing.assert_allclose(x2, x_true, atol=1e-6)
    # warm start from the exact solution: immediate convergence
    assert p2.n_iterations <= 2, p2.n_iterations
