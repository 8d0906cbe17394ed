"""Incremental per-block coefficient updates on the DISTRIBUTED path
(DistAssembler._apply_block_updates): a step that changes only some raw
LDU blocks overwrites only those blocks' entries in the stacked local/halo
storages — the distributed twin of FoamSolver's incremental path
(reference contrast: HostMatrix.C:684-704 + CsrMatrixWrapper.H:74-136
always re-gather every value)."""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from ogl_tpu import testing as problems
from ogl_tpu.core import ldu
from ogl_tpu.dist.from_ranks import DistAssembler
from ogl_tpu.dist.partition import DiaStack


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("x",))


def _dense_of(dm):
    """Global dense matrix reconstructed from a DistMatrix (local blocks on
    the diagonal + halo columns resolved through the plan)."""
    from tests.test_dist import dist_matvec

    n = dm.global_n
    mesh = _mesh(dm.plan.n_parts)
    cols = []
    for k in range(n):
        e = np.zeros(n)
        e[k] = 1.0
        from ogl_tpu.dist.partition import gather_global, split_vector

        xs = jax.numpy.asarray(split_vector(dm, e))
        cols.append(np.asarray(gather_global(dm, dist_matvec(dm, mesh, xs))))
    return np.stack(cols, axis=1)


def _parts(dims=(12, 8), n_parts=4):
    m = problems.poisson_ldu(dims)
    return m, ldu.decompose(m, n_parts)


def test_diag_only_change_routes_incremental_and_matches():
    m, parts = _parts()
    asm = DistAssembler(parts, dtype=np.float64)
    # perturb only the diag of every rank (the transient-CFD step shape)
    parts2 = [dataclasses.replace(p, diag=p.diag + 1.5) for p in parts]
    asm.update(parts2)
    # exactly one block per rank crossed the wire, and the incremental
    # program (not the full assemble) ran
    assert asm.last_blocks_uploaded[0] == len(parts)
    assert asm._incr_fns, "diag-only change did not take the incremental path"
    fresh = DistAssembler(parts2, dtype=np.float64)
    got, want = _dense_of(asm.dm), _dense_of(fresh.dm)
    np.testing.assert_allclose(got, want, rtol=1e-14, atol=1e-14)


def test_unchanged_step_skips_device_work():
    m, parts = _parts()
    asm = DistAssembler(parts, dtype=np.float64)
    before = asm.dm
    asm.update([dataclasses.replace(p) for p in parts])
    assert asm.last_blocks_changed[0] == 0
    assert asm.last_blocks_uploaded == (0, asm.last_blocks_uploaded[1])
    assert asm.dm is before  # resident values reused, no new arrays


def test_proc_iface_change_updates_halo():
    m, parts = _parts()
    asm = DistAssembler(parts, dtype=np.float64)
    # perturb only the processor-interface coefficients of every rank:
    # the halo values (and only them) must change
    parts2 = [
        dataclasses.replace(p, proc_interfaces=tuple(
            dataclasses.replace(pi, coeffs=np.asarray(pi.coeffs) * 2.0)
            for pi in p.proc_interfaces))
        for p in parts]
    local_before = np.asarray(asm.dm.local.data if isinstance(
        asm.dm.local, DiaStack) else asm.dm.local.vals)
    asm.update(parts2)
    assert asm._incr_fns, "proc-iface change did not take the incremental path"
    local_after = np.asarray(asm.dm.local.data if isinstance(
        asm.dm.local, DiaStack) else asm.dm.local.vals)
    np.testing.assert_array_equal(local_before, local_after)
    fresh = DistAssembler(parts2, dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(asm.dm.halo.vals), np.asarray(fresh.dm.halo.vals),
        rtol=1e-14, atol=1e-14)


def test_diag_plus_upper_change_matches_full():
    m, parts = _parts()
    asm = DistAssembler(parts, dtype=np.float64)
    parts2 = [dataclasses.replace(p, diag=p.diag * 1.25,
                                  upper=p.upper - 0.5) for p in parts]
    asm.update(parts2)
    fresh = DistAssembler(parts2, dtype=np.float64)
    np.testing.assert_allclose(_dense_of(asm.dm), _dense_of(fresh.dm),
                               rtol=1e-14, atol=1e-14)


def test_scale_change_forces_full_and_matches():
    m, parts = _parts()
    asm = DistAssembler(parts, dtype=np.float64)
    asm.update([dataclasses.replace(p) for p in parts], scale=2.0)
    # same host blocks, new effective scale: every stored value changed
    fresh = DistAssembler(parts, dtype=np.float64, scale=2.0)
    np.testing.assert_allclose(_dense_of(asm.dm), _dense_of(fresh.dm),
                               rtol=1e-14, atol=1e-14)
    # and back to the incremental path afterwards on a diag-only change
    parts2 = [dataclasses.replace(p, diag=p.diag + 1.0) for p in parts]
    asm.update(parts2, scale=2.0)
    fresh2 = DistAssembler(parts2, dtype=np.float64, scale=2.0)
    np.testing.assert_allclose(_dense_of(asm.dm), _dense_of(fresh2.dm),
                               rtol=1e-14, atol=1e-14)


@pytest.mark.parametrize("fmt", ["Dia", "Ell"])
def test_incremental_matches_across_local_formats(fmt):
    m, parts = _parts()
    asm = DistAssembler(parts, dtype=np.float64, local_format=fmt)
    parts2 = [dataclasses.replace(p, diag=p.diag + 0.75) for p in parts]
    asm.update(parts2)
    fresh = DistAssembler(parts2, dtype=np.float64, local_format=fmt)
    np.testing.assert_allclose(_dense_of(asm.dm), _dense_of(fresh.dm),
                               rtol=1e-14, atol=1e-14)
