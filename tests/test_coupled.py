"""Coupled (GKOACG) solver: multi-RHS CG on a scalar operator with
per-component OpenFOAM stopping (reference LduMatrix/GKOACG/GKOACG.H —
shipped dead there, working here)."""

import numpy as np
import pytest

from ogl_tpu import foam, registry
from ogl_tpu import testing as problems


def _coupled_problem(dims=(12, 12), nc=3):
    m = problems.poisson_ldu(dims)
    a = problems.poisson_dense(dims)
    rng = np.random.default_rng(4)
    X_true = rng.normal(size=(m.n, nc))
    return m, a, a @ X_true, X_true


def test_acg_solves_all_components():
    m, a, B, X_true = _coupled_problem()
    registry.global_registry.clear()
    X, perf = foam.solve_coupled("U", m, B, {
        "executor": "reference", "tolerance": 1e-10, "relTol": 0,
        "maxIter": 600, "dtype": "float64"})
    assert perf.converged
    assert len(perf.initial_residual) == 3 and len(perf.final_residual) == 3
    assert all(fr < 1e-10 for fr in perf.final_residual)
    np.testing.assert_allclose(np.asarray(X), X_true, atol=1e-6)


def test_acg_class_and_bj():
    m, a, B, X_true = _coupled_problem((10, 8))
    s = foam.GKOACG("U2", {"executor": "reference", "tolerance": 1e-10,
                           "relTol": 0, "maxIter": 600, "dtype": "float64",
                           "preconditioner": {"preconditioner": "BJ",
                                              "maxBlockSize": 8}})
    X, perf = s.solve(m, B)
    assert perf.converged and perf.solver_name.startswith("GKOACG")
    np.testing.assert_allclose(np.asarray(X), X_true, atol=1e-6)


def test_acg_component_iteration_counts_differ():
    """Components converge independently: an already-solved component
    (b = 0 -> x = 0) must freeze at iteration 0 while others iterate."""
    m, a, B, X_true = _coupled_problem((10, 10), nc=2)
    B = B.copy()
    B[:, 1] = 0.0
    registry.global_registry.clear()
    X, perf = foam.solve_coupled("Uz", m, B, {
        "executor": "reference", "tolerance": 1e-10, "relTol": 0,
        "maxIter": 600, "dtype": "float64"})
    assert perf.converged
    np.testing.assert_allclose(np.asarray(X)[:, 1], 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(X)[:, 0], X_true[:, 0], atol=1e-6)


def test_acg_matches_segregated_iterations():
    """Each coupled component must take the same iterations as a segregated
    solve of that component (identical recurrences and criterion)."""
    m, a, B, X_true = _coupled_problem((12, 10), nc=2)
    registry.global_registry.clear()
    ctl = {"executor": "reference", "tolerance": 1e-9, "relTol": 0,
           "maxIter": 600, "dtype": "float64", "adaptMinIter": False}
    _, perf_c = foam.solve_coupled("Up", m, B, ctl)
    its = []
    for c in range(2):
        registry.global_registry.clear()
        _, p = foam.solve("Us", m, B[:, c], {**ctl, "solver": "GKOCG"})
        its.append(p.n_iterations)
    assert perf_c.n_iterations == max(its), (perf_c.n_iterations, its)


def test_acg_rejects_unsupported():
    m, a, B, _ = _coupled_problem((6, 6))
    registry.global_registry.clear()
    with pytest.raises(ValueError, match="none|BJ"):
        foam.solve_coupled("Ux", m, B, {
            "executor": "reference", "dtype": "float64",
            "preconditioner": "ILU"})
    with pytest.raises(ValueError, match="n, nc"):
        foam.solve_coupled("Uy", m, B[:, 0], {
            "executor": "reference", "dtype": "float64"})
