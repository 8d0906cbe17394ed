"""The lid-driven-cavity example as an integration test.

The reference's integration tier runs real OpenFOAM cases (icoFoam cavity,
test/integration.yaml) and validates physics-level quantities rather than
exact residuals (data_validation.py, validation.json).  This drives the
examples/cavity.py vorticity–streamfunction application — two foam-front-end
solves per time step (asymmetric transport + SPD Poisson) with per-step
coefficient updates — and validates against the Ghia, Ghia & Shin (1982)
benchmark values.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from cavity import Cavity, run  # noqa: E402


def test_cavity_ghia_validation():
    cav, records = run(n=32, re=100.0, verbose=False)
    psi_min = float(cav.psi.min())
    # Ghia et al. Re=100: psi_min = -0.10342 (129x129, second order); a
    # first-order-upwind 32x32 solution lands within a few percent
    assert -0.115 < psi_min < -0.085, psi_min
    h = cav.h
    pn = np.pad(cav.psi, 1)
    jc = cav.n // 2
    u_c = (pn[2:, jc + 1] - pn[:-2, jc + 1]) / (2 * h)
    assert -0.24 < float(u_c.min()) < -0.17  # Ghia: -0.2109
    # the lid drives a clockwise primary vortex: u > 0 near the lid
    assert float(u_c[-1]) > 0.3


def test_cavity_solvers_reach_steady_iteration_plateau():
    """Per-step coefficient updates ride the compiled-program path: the
    transport solve's iteration count must settle (operator converges) and
    every step must converge within maxIter."""
    cav, records = run(n=24, re=100.0, verbose=False)
    iters_w = [r["omega_iters"] for r in records]
    iters_p = [r["psi_iters"] for r in records]
    assert max(iters_w) < 1000 and max(iters_p) < 1000
    # steady operator => stable iteration counts at the tail
    tail_w = iters_w[-10:]
    assert max(tail_w) - min(tail_w) <= 5, tail_w
    # residual of the time derivative decayed by orders of magnitude
    assert records[-1]["dmax"] < 1e-2 * max(r["dmax"] for r in records)


def test_cavity_momentum_system_is_asymmetric():
    cav = Cavity(16, 100.0, 0.05)
    cav.psi = np.random.default_rng(0).normal(size=(16, 16)) * 0.01
    m, rhs = cav.assemble_omega()
    assert not m.symmetric
    assert rhs.shape == (256,)
    # upwinding keeps it an M-matrix: positive diag, non-positive offdiag
    assert np.all(np.asarray(m.diag) > 0)
    assert np.all(np.asarray(m.upper) <= 0)
    assert np.all(np.asarray(m.lower) <= 0)
