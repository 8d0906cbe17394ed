"""Integration-style tests — the analogue of the reference's OBR-driven
case matrix (test/integration.yaml: cavity × {solvers} × {preconditioners}
× {matrix formats} × {decompositions}) and of data_validation.py's checks
(exported matrices exist, are unique across time steps, have correct
diagonal signs)."""

import hashlib
import os

import numpy as np
import pytest

from ogl_tpu import foam, registry
from ogl_tpu import testing as problems
from ogl_tpu.core import ldu, mtx


def _cavity_like_step(m, step, rng):
    """Emulate a transient run: diagonal grows with 1/dt-ish contribution
    that changes per step (like icoFoam's momentum/pressure updates)."""
    import dataclasses

    return dataclasses.replace(
        m,
        diag=m.diag + 0.1 * (1 + step) + 0.01 * rng.normal(size=m.n) ** 2,
    )


CASE_MATRIX = [
    ("GKOCG", "none", "Coo"),
    ("GKOCG", "BJ", "Csr"),
    ("GKOCG", "GISAI", "Ell"),
    ("GKOCG", "ILU", "Dia"),
    ("GKOBiCGStab", "BJ", "Csr"),
    ("GKOGMRES", "ISAI", "Sell"),
    ("GKOCG", "Multigrid", "Hybrid"),
    ("GKOGMRES", "GISAI", "Gdia"),
]


@pytest.mark.parametrize("solver,pc,fmt", CASE_MATRIX)
def test_cavity_case_matrix(solver, pc, fmt):
    """Each (solver, preconditioner, format) combination completes a short
    transient run with physics-style acceptance (converged every step,
    residuals below tolerance) — mirroring integration.yaml:29-87."""
    base = problems.poisson_ldu((10, 10))
    rng = np.random.default_rng(0)
    x_prev = np.zeros(base.n)
    controls = {
        "solver": solver,
        "executor": "reference",
        "matrixFormat": fmt,
        "tolerance": 1e-8,
        "relTol": 0,
        "maxIter": 2000,
        "dtype": "float64",
        "preconditioner": pc,
        "updateInitGuess": True,
    }
    for step in range(3):
        m = _cavity_like_step(base, step, rng)
        b = rng.normal(size=m.n)
        x, perf = foam.solve(f"p_{solver}_{pc}_{fmt}", m, b, controls, psi=x_prev)
        assert perf.converged, (solver, pc, fmt, step)
        assert perf.final_residual < 1e-8
        # true residual check against the freshly assembled operator
        from ogl_tpu.core import formats

        a = formats.to_dense(ldu.ldu_to_coo_host(m))
        r = b - a @ np.asarray(x)
        assert np.abs(r).sum() / np.abs(b).sum() < 1e-6
        x_prev = np.asarray(x)


def test_multi_field_time_loop():
    """icoFoam-style loop: momentum (coupled GKOACG, 2 components) then
    pressure (GKOCG) each time step, through the per-field persistent
    solvers — programs and device caches must be reused across steps and
    fields, solutions must track each step's operator, and the shared
    residual-eval chain must not re-compile per field."""
    import dataclasses

    base = problems.poisson_ldu((10, 10))
    rng = np.random.default_rng(3)
    common_keys = {"executor": "reference", "tolerance": 1e-9, "relTol": 0,
                   "maxIter": 2000, "dtype": "float64"}
    from ogl_tpu.core import formats

    for step in range(3):
        mu = _cavity_like_step(base, step, rng)          # momentum operator
        mp = dataclasses.replace(base, diag=base.diag + 0.05 * step)
        BU = rng.normal(size=(mu.n, 2))
        bp = rng.normal(size=mp.n)
        XU, perf_u = foam.solve_coupled("U", mu, BU, common_keys)
        xp, perf_p = foam.solve("p", mp, bp, {"solver": "GKOCG",
                                              **common_keys})
        assert perf_u.converged and perf_p.converged, step
        au = formats.to_dense(ldu.ldu_to_coo_host(mu))
        ap = formats.to_dense(ldu.ldu_to_coo_host(mp))
        for c in range(2):
            np.testing.assert_allclose(au @ np.asarray(XU)[:, c], BU[:, c],
                                       atol=1e-6)
        np.testing.assert_allclose(ap @ np.asarray(xp), bp, atol=1e-6)
    u_slv = registry.global_registry.get("U_coupled_solver")
    p_slv = registry.global_registry.get("p_solver")
    assert len(u_slv._compiled) == 1 and len(p_slv._compiled) == 1


def test_export_unique_across_time_steps(tmp_path):
    """data_validation.py:53-121 — exported matrices must exist and differ
    across time steps (proves coefficient updates reach the device)."""
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        base = problems.poisson_ldu((8, 8))
        rng = np.random.default_rng(1)
        controls = {
            "solver": "GKOCG", "executor": "reference", "tolerance": 1e-8,
            "relTol": 0, "dtype": "float64", "export": True, "maxIter": 500,
        }
        md5s = set()
        for step in range(3):
            m = _cavity_like_step(base, step, rng)
            b = rng.normal(size=m.n)
            foam.solve("p", m, b, controls, psi=None)
            # emulate OpenFOAM time directories
            path = f"processor0/{step}"
            os.makedirs(path, exist_ok=True)
            solver_obj = registry.global_registry.get("p_solver")
            # re-export under the step's time label
            mtx.write_coo(f"{path}/p_A_local.mtx", solver_obj.coo_host())
            with open(f"{path}/p_A_local.mtx", "rb") as f:
                md5s.add(hashlib.md5(f.read()).hexdigest())
        assert len(md5s) == 3  # unique per step
        # diagonal dominance/sign checks like data_validation.py
        a = mtx.read("processor0/2/p_A_local.mtx")
        from ogl_tpu.core import formats

        dense = formats.to_dense(a)
        assert (np.diag(dense) > 0).all()
        off = dense - np.diag(np.diag(dense))
        assert (off <= 0).all()
    finally:
        os.chdir(cwd)


def test_residual_history_export():
    base = problems.poisson_ldu((8, 8))
    rng = np.random.default_rng(2)
    b = rng.normal(size=base.n)
    from ogl_tpu.foam.solver import FoamSolver

    s = FoamSolver("ph", {
        "solver": "GKOCG", "executor": "reference", "tolerance": 1e-10,
        "relTol": 0, "dtype": "float64", "export": True, "maxIter": 300,
        "adaptMinIter": False,
    })
    cwd = os.getcwd()
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        os.chdir(d)
        try:
            x, perf = s.solve(base, b)
            hist = np.asarray(mtx.read("processor0/0/ph_residuals.mtx")).ravel()
        finally:
            os.chdir(cwd)
    assert perf.final_residual < 1e-10
    assert len(hist) == perf.n_iterations
    assert hist[0] == pytest.approx(perf.initial_residual)
    assert hist[-1] > 0 and hist[-1] < hist[0]  # residuals decreased


def test_named_solver_classes():
    from ogl_tpu.foam import GKOACG, GKOBiCGStab, GKOCG

    base = problems.poisson_ldu((8, 8))
    rng = np.random.default_rng(3)
    b = rng.normal(size=base.n)
    s = GKOCG("pn", {"executor": "reference", "tolerance": 1e-8, "relTol": 0,
                     "dtype": "float64"})
    x, perf = s.solve(base, b)
    assert perf.converged and perf.solver_name.startswith("GKOCG")
    # CG refuses non-symmetric systems (sym-only registration, GKOCG.C:16)
    import dataclasses

    nonsym = dataclasses.replace(base, lower=base.upper * 0.5)
    with pytest.raises(ValueError, match="symmetric"):
        s.solve(nonsym, b)
    # GKOACG is a working coupled solver now (tests/test_coupled.py); the
    # class constructs fine
    GKOACG("x", {"executor": "reference"})
    sb = GKOBiCGStab("un", {"executor": "reference", "tolerance": 1e-8,
                            "relTol": 0, "dtype": "float64", "maxIter": 400})
    x, perf = sb.solve(nonsym, b)
    assert perf.converged


def test_global_index():
    from ogl_tpu.dist import GlobalIndex

    gi = GlobalIndex([3, 5, 2])
    assert gi.total_size == 10
    np.testing.assert_array_equal(gi.to_global(1, [0, 4]), [3, 7])
    np.testing.assert_array_equal(gi.which_rank([0, 3, 8, 9]), [0, 1, 2, 2])
    chunks = [np.arange(3), np.arange(5), np.arange(2)]
    full = gi.gather(chunks)
    back = gi.scatter(full)
    for c, b2 in zip(chunks, back):
        np.testing.assert_array_equal(c, b2)


def test_channel_case_matrix():
    """Periodic-channel analogue of the reference's second integration case
    (cyclic BCs + wall-normal anisotropy, test_matrix.json): GKOCG converges
    on the periodic SPD system single-device AND distributed, with matching
    solutions."""
    m = problems.channel_ldu((12, 8, 4))
    a = problems.to_dense_ldu(m)
    np.testing.assert_allclose(a, a.T)  # cyclic pairs keep symmetry
    rng = np.random.default_rng(2)
    x_true = rng.normal(size=m.n)
    b = a @ x_true
    controls = {"solver": "GKOCG", "executor": "reference", "tolerance": 1e-11,
                "relTol": 0, "maxIter": 1200, "dtype": "float64"}
    x, perf = foam.solve("chan", m, b, controls)
    assert perf.converged
    np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-6)
    registry.global_registry.clear()
    xd, perfd = foam.solve_distributed("chand", m, b, {k: v for k, v in controls.items() if k != "executor"})
    assert perfd.converged
    np.testing.assert_allclose(xd, x_true, atol=1e-6)
