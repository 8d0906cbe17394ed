"""Distributed foam solver on the 8-device virtual mesh: end-to-end
fvSolution-config solves over decomposed systems with steady-state updates
(the reference's solve_multi_gpu_impl flow) and the full additive-Schwarz
preconditioner set (reference Preconditioner.H:47-81 wraps every local
preconditioner in Schwarz in parallel runs)."""

import dataclasses

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from ogl_tpu import foam, registry
from ogl_tpu import testing as problems
from ogl_tpu.core import ldu


def _problem(dims=(16, 16)):
    m = problems.poisson_ldu(dims)
    a = problems.poisson_dense(dims)
    rng = np.random.default_rng(11)
    x_true = rng.normal(size=m.n)
    return m, a, a @ x_true, x_true


def test_dist_foam_solve_from_global():
    m, a, b, x_true = _problem()
    controls = {"solver": "GKOCG", "tolerance": 1e-10, "relTol": 0,
                "maxIter": 600, "dtype": "float64", "preconditioner": "BJ"}
    x, perf = foam.solve_distributed("p", m, b, controls)
    assert perf.converged
    assert perf.solver_name.endswith("dist8")
    np.testing.assert_allclose(x, x_true, atol=1e-6)


def test_dist_foam_steady_state_update():
    m, a, b, x_true = _problem((12, 8))
    controls = {"solver": "GKOCG", "tolerance": 1e-10, "relTol": 0,
                "maxIter": 600, "dtype": "float64"}
    x1, perf1 = foam.solve_distributed("p", m, b, controls)
    s1 = registry.global_registry.get("p_dist_solver")
    m2 = dataclasses.replace(m, diag=2 * m.diag, upper=2 * m.upper)
    x2, perf2 = foam.solve_distributed("p", m2, b, {})
    s2 = registry.global_registry.get("p_dist_solver")
    assert s1 is s2  # same persistent solver
    assert s2.assembler.dm.plan is s1.assembler.dm.plan  # plan reused
    np.testing.assert_allclose(x2, x_true / 2, atol=1e-6)


def test_dist_foam_delta_block_upload():
    """Per-(rank, block) delta uploads in the dist steady state: unchanged
    source blocks stay HBM-resident, a diag-only change re-uploads exactly
    one block per rank, and solutions track the current coefficients."""
    m, a, b, x_true = _problem((16, 8))
    controls = {"solver": "GKOCG", "tolerance": 1e-10, "relTol": 0,
                "maxIter": 600, "dtype": "float64"}
    x1, _ = foam.solve_distributed("pDdist", m, b, controls)
    np.testing.assert_allclose(x1, x_true, atol=1e-6)
    slv = registry.global_registry.get("pDdist_dist_solver")

    # identical step after the baseline seeds: nothing crosses the boundary
    foam.solve_distributed("pDdist", dataclasses.replace(m), b, {})
    up1, tot = slv.assembler.last_blocks_uploaded
    foam.solve_distributed("pDdist", dataclasses.replace(m), b, {})
    assert slv.assembler.last_blocks_uploaded == (0, tot)
    assert up1 in (tot, 0)  # first tracked step may seed everything

    # diag-only change: exactly one block per rank re-uploads
    m3 = dataclasses.replace(m, diag=m.diag + 1.0)
    x3, perf3 = foam.solve_distributed("pDdist", m3, b, {})
    up3, _ = slv.assembler.last_blocks_uploaded
    assert up3 == slv.n_parts
    assert perf3.converged
    np.testing.assert_allclose(
        x3, np.linalg.solve(a + np.eye(m.n), np.asarray(b)), atol=1e-6)

    # unchanged RHS is delta-skipped; a changed one re-uploads
    assert slv.last_rhs_uploaded is False
    x4, _ = foam.solve_distributed("pDdist", m3, np.asarray(b) * 2.0, {})
    assert slv.last_rhs_uploaded is True
    np.testing.assert_allclose(np.asarray(x4), 2.0 * np.asarray(x3), atol=1e-5)


def test_dist_foam_from_rank_list():
    m, a, b, x_true = _problem((16, 8))
    parts = ldu.decompose(m, 8)
    controls = {"solver": "GKOBiCGStab", "tolerance": 1e-10, "relTol": 0,
                "maxIter": 1200, "dtype": "float64"}
    x, perf = foam.solve_distributed("u", parts, b, controls)
    assert perf.converged
    np.testing.assert_allclose(x, x_true, atol=1e-6)


def test_dist_foam_block_jacobi():
    m, a, b, x_true = _problem((16, 16))
    base = {"solver": "GKOCG", "tolerance": 1e-10, "relTol": 0,
            "maxIter": 600, "dtype": "float64"}
    x0, p0 = foam.solve_distributed("bj0", m, b, base)
    x4, p4 = foam.solve_distributed(
        "bj4", m, b, {**base, "preconditioner": {"preconditioner": "BJ", "maxBlockSize": 4}},
    )
    assert p4.converged
    np.testing.assert_allclose(x4, x_true, atol=1e-6)
    assert p4.n_iterations <= p0.n_iterations


@pytest.mark.parametrize("name", ["ILU", "IRILU", "ILUT", "IC", "ICT", "ISAI", "GISAI", "Multigrid"])
def test_dist_foam_schwarz_preconditioners(name):
    """Every local preconditioner generates on the shard's local block under
    additive Schwarz (reference Preconditioner.H:47-81) and accelerates the
    unpreconditioned solve."""
    m, a, b, x_true = _problem((16, 16))
    base = {"solver": "GKOCG", "tolerance": 1e-10, "relTol": 0,
            "maxIter": 600, "dtype": "float64"}
    x0, p0 = foam.solve_distributed(f"s0_{name}", m, b, base)
    xp, pp = foam.solve_distributed(
        f"sp_{name}", m, b, {**base, "preconditioner": name})
    assert pp.converged
    np.testing.assert_allclose(xp, x_true, atol=1e-6)
    assert pp.n_iterations <= p0.n_iterations


def test_dist_foam_asym_bicgstab_schwarz_ilu():
    """Non-symmetric distributed system (convection-diffusion) with
    Schwarz-ILU preconditioning."""
    m = problems.convection_diffusion_ldu((12, 12), peclet=0.8)
    a = problems.to_dense_ldu(m)
    rng = np.random.default_rng(7)
    x_true = rng.normal(size=m.n)
    b = a @ x_true
    controls = {"solver": "GKOBiCGStab", "tolerance": 1e-10, "relTol": 0,
                "maxIter": 1200, "dtype": "float64", "preconditioner": "ILU"}
    x, perf = foam.solve_distributed("asym_ilu", m, b, controls)
    assert perf.converged
    np.testing.assert_allclose(x, x_true, atol=1e-6)


def test_dist_foam_unsupported_precond():
    m, a, b, _ = _problem((8, 8))
    with pytest.raises(ValueError, match="distributed preconditioner"):
        foam.solve_distributed("q", m, b, {"solver": "GKOCG", "dtype": "float64",
                                           "preconditioner": "NoSuchPC"})


def test_dist_foam_stats_and_export(tmp_path, monkeypatch, capsys):
    """Observability parity (reference lduLduBase.H:280-305, common.C:31-58):
    stats block printed, per-rank matrices exported, rel-res cost measured."""
    monkeypatch.chdir(tmp_path)
    m, a, b, x_true = _problem((12, 8))
    controls = {"solver": "GKOCG", "tolerance": 1e-10, "relTol": 0,
                "maxIter": 600, "dtype": "float64", "verbose": 1, "export": True}
    x, perf = foam.solve_distributed("pexp", m, b, controls)
    out = capsys.readouterr().out
    assert "Time per iteration" in out
    assert "Time per iteration and DOF" in out
    s = registry.global_registry.get("pexp_dist_solver")
    assert s.props.prev_rel_res_cost > 0
    for i in range(8):
        assert (tmp_path / f"processor{i}" / "0" / "pexp_A_local.mtx").exists()
        assert (tmp_path / f"processor{i}" / "0" / "pexp_b.mtx").exists()


def test_dist_foam_cyclic_interface_across_partitions():
    """A cyclic (local) interface whose two sides land on different ranks
    must survive decomposition as paired ProcInterfaces (reference
    HostMatrix.C:309-331 handles all interface kinds in parallel)."""
    from ogl_tpu.core import formats as _f

    m0 = problems.poisson_ldu((32,))
    iface = ldu.LocalInterface(
        rows=np.array([0, 31]), cols=np.array([31, 0]), coeffs=np.array([1.0, 1.0])
    )
    m = dataclasses.replace(m0, local_interfaces=(iface,), diag=m0.diag + 1.0)
    a = _f.to_dense(ldu.ldu_to_coo_host(m))
    assert a[0, 31] == -1.0 and a[31, 0] == -1.0
    rng = np.random.default_rng(12)
    x_true = rng.normal(size=m.n)
    b = a @ x_true
    controls = {"solver": "GKOCG", "tolerance": 1e-12, "relTol": 0,
                "maxIter": 400, "dtype": "float64"}
    registry.global_registry.clear()
    x, perf = foam.solve_distributed("pcyc", m, b, controls)
    assert perf.converged
    np.testing.assert_allclose(x, x_true, atol=1e-7)


def test_dist_foam_multigrid_as_solver():
    """GKOMultigrid distributed = Richardson around the Schwarz-AMG cycle
    (the single-device mapping); previously it silently ran plain CG."""
    m, a, b, x_true = _problem((16, 16))
    controls = {"solver": "GKOMultigrid", "tolerance": 1e-10, "relTol": 0,
                "maxIter": 600, "dtype": "float64"}
    registry.global_registry.clear()
    x, perf = foam.solve_distributed("pmg", m, b, controls)
    assert perf.converged
    np.testing.assert_allclose(x, x_true, atol=1e-6)


def test_dist_foam_schwarz_amg_grid_aggregation():
    """Geometric 2x-per-axis aggregation on the distributed Schwarz-AMG
    path: slab shards of a lexicographic Poisson grid have box-stencil
    union offsets, so grid aggregation must (a) be detected, (b) converge
    to the true solution, and (c) need no more CG iterations than 1-D
    natural runs (better coarse operators)."""
    m, a, b, x_true = _problem((32, 32))
    results = {}
    for agg in ("grid", "natural"):
        registry.global_registry.clear()
        controls = {"solver": "GKOCG", "tolerance": 1e-10, "relTol": 0,
                    "maxIter": 600, "dtype": "float64",
                    "preconditioner": {"preconditioner": "Multigrid",
                                       "aggregation": agg}}
        x, perf = foam.solve_distributed(f"pga_{agg}", m, b, controls)
        assert perf.converged
        np.testing.assert_allclose(x, x_true, atol=1e-6)
        results[agg] = perf.n_iterations
    assert results["grid"] <= results["natural"]


def test_dist_foam_precond_skip_when_operator_unchanged():
    """Unchanged operator coefficients skip the Schwarz refactorisation
    even with caching=0 (regeneration from identical inputs is a no-op;
    the host-side per-shard setup dominates the steady-state Multigrid
    step otherwise); a coefficient change still triggers it."""
    m, a, b, x_true = _problem((16, 16))
    controls = {"solver": "GKOCG", "tolerance": 1e-10, "relTol": 0,
                "maxIter": 600, "dtype": "float64",
                "preconditioner": {"preconditioner": "Multigrid", "caching": 0}}
    registry.global_registry.clear()
    x1, p1 = foam.solve_distributed("ppcs", m, b, controls)
    np.testing.assert_allclose(x1, x_true, atol=1e-6)
    slv = registry.global_registry.get("ppcs_dist_solver")
    pc1 = slv._precond
    assert pc1 is not None

    foam.solve_distributed("ppcs", dataclasses.replace(m), b, controls)
    assert slv._precond is pc1  # bitwise-unchanged operator: same state

    m2 = dataclasses.replace(m, diag=m.diag + 1.0)
    x2, p2 = foam.solve_distributed("ppcs", m2, b, controls)
    assert slv._precond is not pc1
    assert p2.converged
    a2 = a + np.eye(m.n)
    np.testing.assert_allclose(x2, np.linalg.solve(a2, b), atol=1e-6)


def test_dist_foam_unknown_solver_raises():
    m, a, b, x_true = _problem((8, 8))
    registry.global_registry.clear()
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown solver"):
        foam.solve_distributed("pbad", m, b, {"solver": "GKOFancy"})


def test_dist_foam_residual_history_export(tmp_path, monkeypatch):
    """export=true writes per-rank residual histories (reference
    StoppingCriterion.C:115-117 in the multi-GPU path)."""
    monkeypatch.chdir(tmp_path)
    m, a, b, x_true = _problem((12, 8))
    registry.global_registry.clear()
    controls = {"solver": "GKOCG", "tolerance": 1e-10, "relTol": 0,
                "maxIter": 600, "dtype": "float64", "export": True}
    x, perf = foam.solve_distributed("ph", m, b, controls)
    assert perf.converged
    for i in range(8):
        path = tmp_path / f"processor{i}" / "0" / "ph_residuals.mtx"
        assert path.exists(), path


def test_dist_single_device_iteration_parity():
    """BASELINE.md target 3 / VERDICT r2 item 3: a distributed solve on ONE
    shard has no halo and must take (within rounding) the same iteration
    count as the single-device path — across steady-state solves too (the
    r2 drift came from adaptMinIter fed by an RTT-inflated residual-eval
    cost measurement, stretching the check frequency)."""
    import jax
    from jax.sharding import Mesh

    m, a, b, x_true = _problem((24, 24))
    controls = {"solver": "GKOCG", "tolerance": 1e-8, "relTol": 0,
                "maxIter": 900, "dtype": "float64", "adaptMinIter": True}
    def _pin_cost(key):
        # the adapted check frequency derives from the MEASURED residual-
        # eval cost ratio; pin it so load spikes on a 1-core CI box can't
        # skew the two paths differently (the r2 drift this test guards
        # against was algorithmic — a wrongly-measured ratio by 4 orders
        # of magnitude — which a pinned equal ratio still exposes via
        # prev_solve_iters feeding minIter)
        slv = registry.global_registry.get_or_init(key, lambda: None)
        slv._res_eval_time = 1.0
        slv.props.prev_rel_res_cost = 30.0

    iters_single, iters_dist = [], []
    for step in range(3):
        _, p1 = foam.solve("pparity", m, b, controls if step == 0 else {})
        _pin_cost("pparity_solver")
        iters_single.append(p1.n_iterations)
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("x",))
    for step in range(3):
        _, p2 = foam.solve_distributed("pparity_d", m, b,
                                       controls if step == 0 else {},
                                       mesh=mesh1 if step == 0 else None)
        _pin_cost("pparity_d_dist_solver")
        iters_dist.append(p2.n_iterations)
    for s, d in zip(iters_single, iters_dist):
        assert abs(s - d) <= 2, (iters_single, iters_dist)


def test_dist_foam_schwarz_bf16_state():
    """`precision bfloat16` narrows the per-shard Schwarz state; the solve
    still converges to full tolerance (the residual uses the exact A)."""
    m, a, b, x_true = _problem((16, 16))
    base = {"solver": "GKOCG", "tolerance": 1e-8, "relTol": 0,
            "maxIter": 600, "dtype": "float32"}
    xf, pf = foam.solve_distributed("bfP32", m, b, {
        **base, "preconditioner": {"preconditioner": "ILU"}})
    xb, pb = foam.solve_distributed("bfP16", m, b, {
        **base, "preconditioner": {"preconditioner": "ILU",
                                   "precision": "bfloat16"}})
    assert pb.converged
    np.testing.assert_allclose(xb, x_true, atol=5e-4)
    assert pb.n_iterations <= int(pf.n_iterations * 1.5) + 8


def test_dist_foam_ir_inner_bf16():
    """Distributed GKOIR with an `inner` sub-dict: the inner CG halo-
    exchanges and psums over the mesh under its own criterion; with
    `precision bfloat16` the inner streams half-width local+halo operators
    while the outer converges to f32 tolerance."""
    m, a, b, x_true = _problem((16, 16))
    base = {"solver": "GKOIR", "tolerance": 1e-6, "relTol": 0,
            "maxIter": 900, "dtype": "float32"}
    _, p_rich = foam.solve_distributed("dIrPlain", m, b, {
        **base, "preconditioner": "BJ"})
    xi, pi = foam.solve_distributed("dIrInner", m, b, {
        **base, "preconditioner": "BJ",
        "inner": {"tolerance": 1e-2, "maxIter": 300, "precision": "bfloat16"}})
    assert pi.converged
    assert pi.final_residual < 1e-6
    np.testing.assert_allclose(xi, x_true, atol=1e-3)
    assert pi.n_iterations * 4 < p_rich.n_iterations


def test_dist_foam_pipelined_cg():
    """Distributed GKOCG with `pipelinedCG true`: the shard_map program
    runs the single-reduction variant (one psum per iteration) and must
    match the classical distributed solve."""
    m, a, b, x_true = _problem()
    base = {"solver": "GKOCG", "tolerance": 1e-10, "relTol": 0,
            "maxIter": 600, "dtype": "float64", "preconditioner": "BJ"}
    registry.global_registry.clear()
    _, perf_ref = foam.solve_distributed("pipeRef", m, b, base)
    x, perf = foam.solve_distributed("pipeCg", m, b,
                                     {**base, "pipelinedCG": True})
    assert perf.converged
    np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-6)
    assert abs(perf.n_iterations - perf_ref.n_iterations) <= 2

    # steady-state coefficient update reuses the compiled pipelined program
    import dataclasses as dc

    m2 = dc.replace(m, diag=2 * m.diag, upper=2 * m.upper)
    x2, perf2 = foam.solve_distributed("pipeCg", m2, b, {})
    assert perf2.converged
    np.testing.assert_allclose(np.asarray(x2), x_true / 2.0, atol=1e-6)


def test_dist_foam_cyclic_via_halo_parity():
    """cyclicViaHalo routes same-rank cyclic couplings through paired
    self-neighbor ProcInterfaces (the single-chip halo-exchange
    configuration): solutions and iteration counts match the
    local-column route exactly, on 1 and 4 parts, including the
    steady-state update path."""
    import dataclasses as dc

    m = problems.channel_ldu((16, 8))
    a = problems.to_dense_ldu(m)
    rng = np.random.default_rng(0)
    x_true = rng.normal(size=m.n)
    b = a @ x_true
    base = {"solver": "GKOCG", "tolerance": 1e-10, "relTol": 0,
            "maxIter": 800, "dtype": "float64"}
    for p in (1, 4):
        mesh = Mesh(np.array(jax.devices()[:p]), ("x",))
        x1, p1 = foam.solve_distributed(f"cvh{p}", m, b,
                                        {**base, "cyclicViaHalo": True},
                                        mesh=mesh)
        slv = registry.global_registry.get_or_init(
            f"cvh{p}_dist_solver", lambda: None)
        assert 0 in slv.assembler.dm.plan.offsets  # self class present
        x2, p2 = foam.solve_distributed(f"cvl{p}", m, b, base, mesh=mesh)
        assert p1.converged and p1.n_iterations == p2.n_iterations
        np.testing.assert_allclose(np.asarray(x1), x_true, atol=1e-6)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                   atol=1e-9)
        # steady state: coefficient change reuses the self-halo sparsity
        m2 = dc.replace(m, diag=np.asarray(m.diag) * 1.01)
        b2 = problems.to_dense_ldu(m2) @ x_true
        x3, p3 = foam.solve_distributed(f"cvh{p}", m2, b2, {})
        assert p3.converged
        np.testing.assert_allclose(np.asarray(x3), x_true, atol=1e-6)


def test_self_neighbor_interfaces_must_pair():
    """build_halo_plan rejects an odd self-interface list (the pairing
    contract of cyclic sides)."""
    from ogl_tpu.dist.from_ranks import build_halo_plan

    with pytest.raises(ValueError, match="pairs"):
        build_halo_plan([[(0, np.array([0, 1]))]], 2)
    with pytest.raises(ValueError, match="mismatched"):
        build_halo_plan([[(0, np.array([0, 1])), (0, np.array([2]))]], 3)
