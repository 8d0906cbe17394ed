"""Incremental per-block value updates (formats.block_update_plans +
FoamSolver._apply_block_updates): a steady-state step that changes only
SOME LDU blocks overwrites just those entries of the device container —
including as a single contiguous slice write when the block's plan is
affine (the LDU diag onto the DIA main plane) — instead of re-gathering
all nnz entries.  Reference contrast: HostMatrix.C:684-692 always bulk
re-copies every coefficient."""

import dataclasses

import numpy as np

from ogl_tpu import foam
from ogl_tpu import testing as problems
from ogl_tpu.core import formats


def _dense(m):
    return problems.to_dense_ldu(m)


def _solver(name, m, b, extra=None):
    ctl = {"solver": "GKOCG", "tolerance": 1e-8, "relTol": 0.0,
           "maxIter": 2000, "matrixFormat": "Dia"}
    ctl.update(extra or {})
    slv = foam.FoamSolver(name, ctl)
    slv.solve(m, b)
    return slv


def test_diag_only_change_is_affine_slice():
    """Symmetric Poisson + DIA: the diag block's plan is affine (one
    contiguous run onto the main plane), a diag-only change stages exactly
    one block, leaves the other unstaged, and the solve tracks the new
    operator exactly."""
    dims = (12, 10, 8)
    m = problems.poisson_ldu(dims)
    rng = np.random.default_rng(0)
    b = rng.normal(size=m.n).astype(np.float32)
    slv = _solver("pIncr", m, b)

    m2 = dataclasses.replace(m, diag=m.diag + np.float32(0.5))
    x2, perf2 = slv.solve(m2, b)
    assert perf2.converged
    # blocks are [upper, diag]: the diag change stages only block 1
    assert slv.last_blocks_changed == (1, 2)
    assert slv.last_blocks_uploaded == (1, 2)
    assert slv._block_plans is not None
    assert slv._block_plans[1].dest is None  # affine: one slice write
    assert slv._blocks_dev[0] is None  # unchanged block never staged
    ref = np.linalg.solve(_dense(m2), np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(x2), ref, atol=2e-4)

    # second diag-only step reuses the same jit'd program (one cache entry)
    m3 = dataclasses.replace(m, diag=m.diag + np.float32(1.25))
    x3, _ = slv.solve(m3, b)
    assert len(slv._incr_fns) == 1
    ref3 = np.linalg.solve(_dense(m3), np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(x3), ref3, atol=2e-4)


def test_nonsymmetric_partial_and_full_changes():
    """Non-symmetric (3 source blocks): each partial change pattern updates
    the container correctly, and an all-blocks change falls back to the
    full assemble path."""
    dims = (10, 9, 7)
    m = problems.convection_diffusion_ldu(dims, peclet=0.4)
    rng = np.random.default_rng(1)
    b = rng.normal(size=m.n).astype(np.float32)
    slv = _solver("uIncr", m, b,
                  {"solver": "GKOBiCGStab", "preconditioner": "BJ"})

    # diag only (blocks are [upper, lower, diag])
    m2 = dataclasses.replace(m, diag=m.diag * np.float32(1.1))
    x2, _ = slv.solve(m2, b)
    assert slv.last_blocks_uploaded == (1, 3)
    np.testing.assert_allclose(
        np.asarray(x2),
        np.linalg.solve(_dense(m2), np.asarray(b, np.float64)), atol=2e-4)

    # lower only — a genuinely scattered (non-affine or affine) plan
    m3 = dataclasses.replace(m2, lower=m2.lower * np.float32(1.3))
    x3, _ = slv.solve(m3, b)
    assert slv.last_blocks_uploaded == (1, 3)
    np.testing.assert_allclose(
        np.asarray(x3),
        np.linalg.solve(_dense(m3), np.asarray(b, np.float64)), atol=2e-4)

    # upper + diag together: one program per changed-index set
    m4 = dataclasses.replace(
        m3, upper=m3.upper * np.float32(0.9),
        diag=m3.diag + np.float32(0.2))
    x4, _ = slv.solve(m4, b)
    assert slv.last_blocks_uploaded == (2, 3)
    np.testing.assert_allclose(
        np.asarray(x4),
        np.linalg.solve(_dense(m4), np.asarray(b, np.float64)), atol=2e-4)

    # all three change: the full assemble path runs (and stages everything)
    m5 = dataclasses.replace(
        m4, upper=m4.upper * np.float32(1.05),
        lower=m4.lower * np.float32(1.05), diag=m4.diag + np.float32(0.1))
    x5, _ = slv.solve(m5, b)
    assert slv.last_blocks_uploaded == (3, 3)
    np.testing.assert_allclose(
        np.asarray(x5),
        np.linalg.solve(_dense(m5), np.asarray(b, np.float64)), atol=2e-4)


def test_incremental_with_rcm_reorder():
    """The plans compose the RCM entry_order with the sparsity permute
    (perm2): diag-only updates stay exact under renumbering."""
    dims = (9, 8, 6)
    m = problems.poisson_ldu(dims)
    rng = np.random.default_rng(2)
    b = rng.normal(size=m.n).astype(np.float32)
    slv = _solver("pRcm", m, b, {"reorder": "rcm"})
    m2 = dataclasses.replace(m, diag=m.diag + np.float32(0.7))
    x2, _ = slv.solve(m2, b)
    assert slv.last_blocks_uploaded == (1, 2)
    np.testing.assert_allclose(
        np.asarray(x2),
        np.linalg.solve(_dense(m2), np.asarray(b, np.float64)), atol=2e-4)


def test_incremental_identity_map_coo():
    """executor=reference keeps the Coo container (identity ValueMap):
    the per-block plans are slices of the inverse permute and a diag-only
    change still uploads one block."""
    dims = (8, 7, 5)
    m = problems.poisson_ldu(dims)
    rng = np.random.default_rng(3)
    b = rng.normal(size=m.n).astype(np.float64)
    ctl = {"solver": "GKOCG", "executor": "reference", "tolerance": 1e-10,
           "relTol": 0.0, "maxIter": 2000, "dtype": "float64"}
    slv = foam.FoamSolver("pCooIncr", ctl)
    slv.solve(m, b)
    m2 = dataclasses.replace(m, diag=m.diag + 0.5)
    x2, _ = slv.solve(m2, b)
    assert slv.last_blocks_uploaded == (1, 2)
    np.testing.assert_allclose(
        np.asarray(x2),
        np.linalg.solve(_dense(m2), np.asarray(b)), atol=1e-8)


def test_interface_blocks_and_scaling():
    """Periodic channel (local cyclic interface -> an extra source block;
    duplicate COO slots may force the accumulate ValueMap, where the
    incremental path must disable itself) with a scaling factor: every
    change pattern still tracks the operator."""
    dims = (8, 6, 4)
    m = problems.channel_ldu(dims)
    rng = np.random.default_rng(4)
    b = rng.normal(size=m.n).astype(np.float32)
    slv = _solver("chanIncr", m, b, {"scaling": 2.0})
    m2 = dataclasses.replace(m, diag=m.diag + np.float32(0.4))
    x2, perf2 = slv.solve(m2, b)
    assert perf2.converged
    a2 = _dense(m2)
    # scaling rescales A and b identically: x is invariant
    np.testing.assert_allclose(
        np.asarray(x2), np.linalg.solve(a2, np.asarray(b, np.float64)),
        atol=3e-4)


def test_incremental_composes_with_bf16_upload():
    """uploadPrecision bfloat16 + incremental: the changed block crosses
    the wire as a bf16 error-feedback delta and the incremental scatter
    still lands the decoded values."""
    dims = (10, 8, 6)
    m = problems.poisson_ldu(dims)
    rng = np.random.default_rng(5)
    b = rng.normal(size=m.n).astype(np.float32)
    slv = _solver("pBfIncr", m, b, {"uploadPrecision": "bfloat16",
                                    "uploadDeltaTol": 1.0})
    m1 = dataclasses.replace(m, diag=m.diag + np.float32(0.5))
    slv.solve(m1, b)  # stages the diag at full width (first staging)
    m2 = dataclasses.replace(m, diag=m.diag + np.float32(0.5 + 1e-3))
    x2, _ = slv.solve(m2, b)
    bf, _ = slv.last_blocks_bf16
    assert bf == 1  # the tiny delta rode the bf16 encoding
    ref = np.linalg.solve(_dense(m2), np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(x2), ref, atol=5e-3)


def test_block_update_plans_accumulate_guard():
    """A non-unique ValueMap (duplicate slots accumulate) must return None:
    per-block set() would drop the other contributions."""
    vm = formats.ValueMap(dest=None, out_shape=(4,), unique=False)
    assert formats.block_update_plans(vm, np.arange(4), [2, 2]) is None
