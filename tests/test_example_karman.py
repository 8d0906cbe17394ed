"""The Karman-vortex-street example as an integration test.

The reference's headline demo offloads a Karman vortex street's momentum
and pressure solves (reference README.md:159-161).  The full shedding
validation (Strouhal 0.1467 at Re=100 vs literature 0.14-0.15, measured
over 3000 steps) runs in the example CLI; the test tier keeps a bounded
run that pins solver health, the wake, and the assembled-system structure.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from karman import Karman, run  # noqa: E402


def test_karman_develops_wake():
    k, probe = run(nx=96, ny=32, d=6, re=100.0, steps=400, verbose=False)
    assert np.all(np.isfinite(k.psi)) and np.all(np.isfinite(k.omega))
    u, v = k.velocities()
    jc = k.ny // 2
    # wake: streamwise velocity right behind the cylinder is well below
    # the free stream (recirculation/deficit)
    behind = u[jc, k.i0 + k.d + 1 : k.i0 + k.d + 6]
    assert behind.mean() < 0.5 * k.u0, behind
    # upstream of the cylinder the flow still runs at ~free stream
    ahead = u[jc - k.d : jc + k.d, 2].mean()
    assert ahead > 0.6 * k.u0, ahead
    # solid nodes carry no velocity and hold the stagnation streamfunction
    assert np.all(u[k.solid] == 0.0)
    np.testing.assert_allclose(k.psi[k.solid], k.psi_obs, rtol=1e-5)


def test_karman_system_structure():
    k = Karman(nx=64, ny=24, d=4, re=100.0)
    # psi operator: symmetric SPD pattern, solid rows identity
    m = k.a_psi
    assert m.symmetric
    d = np.asarray(m.diag)
    assert np.all(d[k.solid.ravel()] == 1.0)
    assert np.all(d[~k.solid.ravel()] >= 3.0)
    # omega system: asymmetric M-matrix, solid rows identity
    k.psi += 0.01 * np.random.default_rng(0).standard_normal(k.psi.shape)
    mo, rhs = k.assemble_omega()
    assert not mo.symmetric
    assert np.all(np.asarray(mo.upper) <= 0)
    assert np.all(np.asarray(mo.lower) <= 0)
    assert np.all(np.asarray(mo.diag)[k.solid.ravel()] == 1.0)
    assert rhs.shape == (k.nx * k.ny,)
