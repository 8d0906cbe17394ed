#!/usr/bin/env python
"""Benchmark harness — the reference's headline metric on real TPU hardware.

The reference prints per-solve statistics (time/iter [µs], time/iter/DOF
[ns], lduLduBase.H:280-305) but vendors no numbers (BASELINE.md); the
baseline is therefore *generated* here: an unpreconditioned GKOCG solve of
a 3-D FV pressure-Poisson system (the lid-driven-cavity/channel p-equation
analogue), plus SpMV throughput against the HBM roofline.

Prints ONE JSON line (to stdout, IMMEDIATELY after the headline lanes so a
budget kill cannot lose it — VERDICT r04 item 1):
  metric       cg_time_per_iter_per_dof
  value        nanoseconds per CG iteration per DOF (reference north-star)
  vs_baseline  achieved SpMV bandwidth / (0.80 × HBM peak) — ≥1.0 means the
               BASELINE.md roofline target (SpMV ≥ 80% of peak) is met

Everything else goes to stderr.  The run is WALL-CLOCK BUDGETED
(OGL_BENCH_BUDGET_S, default 1140 s): optional lanes are skipped (with a
log line) when the remaining budget cannot cover their estimate, and a
compact SUMMARY block re-printing every completed lane's one-liner is
emitted at the end — and on SIGTERM — so the driver's 2000-byte output
tail always carries the headlines (BENCH_r04 was rc=124/parsed:null; this
structure makes that failure mode impossible to repeat).
"""

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("OGL_BENCH_BUDGET_S", "1140"))
SUMMARY: list[str] = []
_JSON_PRINTED = False


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def lane_ok(name: str, est_s: float) -> bool:
    """Budget gate: skip-and-log when the estimate exceeds what's left."""
    if remaining() < est_s:
        line = (f"[skip] {name}: est {est_s:.0f}s > {remaining():.0f}s "
                f"remaining of the {BUDGET_S:.0f}s budget")
        log(line)
        SUMMARY.append(line)
        return False
    return True


def headline(line: str):
    """A lane's one-line result: logged now AND re-printed in the final
    summary block (tail-survivable evidence)."""
    log(line)
    SUMMARY.append(line)


def print_summary():
    log(f"===== SUMMARY ({time.monotonic() - _T0:.0f}s elapsed of "
        f"{BUDGET_S:.0f}s budget) =====")
    for s in SUMMARY:
        log("  " + s)
    log("===== END SUMMARY =====")


def _on_term(signum, frame):  # driver timeout sends SIGTERM first
    log(f"[SIGTERM at {time.monotonic() - _T0:.0f}s — printing summary "
        "and exiting]")
    print_summary()
    sys.exit(1 if not _JSON_PRINTED else 0)


def _on_alarm(signum, frame):
    """Hard internal deadline: on pathological backend weather (first
    Mosaic compiles have been observed taking ~300 s each after a tunnel
    recovery) a single lane can blow far past its estimate AFTER the
    lane_ok gate admitted it.  Rather than let the driver's outer timeout
    kill the run (BENCH_r04: rc=124, parsed:null, no tail), expire the
    budget from inside: print the summary and exit — rc 0 when the
    machine-readable headline already printed, 1 otherwise (the summary
    still carries every completed lane either way)."""
    log(f"[budget alarm at {time.monotonic() - _T0:.0f}s — printing summary "
        "and exiting]")
    print_summary()
    sys.exit(0 if _JSON_PRINTED else 1)


signal.signal(signal.SIGTERM, _on_term)
signal.signal(signal.SIGALRM, _on_alarm)
signal.alarm(max(int(BUDGET_S) + 30, 60))  # +grace so lane gating acts first


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def _slope_timed(call, force, lo=1, hi=9, reps=3):
    """Per-call seconds of an async-dispatchable device program, measured
    as the slope between two dispatch-queue lengths with ONE forced fetch
    each.  Subtracting a separately measured RTT from a single timed call
    (the old approach) breaks when the program is shorter than the tunnel
    RTT variance — on a 34 ms-RTT day it reported a 5.3 ms CG solve as
    0.2 ms (caught by the device-timeline cross-check, VERDICT r03 weak 2).
    The slope cancels the fixed RTT + dispatch cost exactly."""
    def run(k):
        out = None
        t0 = time.perf_counter()
        for _ in range(k):
            out = call()
        force(out)
        return time.perf_counter() - t0

    run(1)  # warm the dispatch path
    tlo = min(run(lo) for _ in range(reps))
    thi = min(run(hi) for _ in range(reps))
    return max((thi - tlo) / (hi - lo), 1e-9)


def main():
    # persistent compilation cache: repeat bench runs skip the large solver
    # compiles (no-op if the backend bypasses it)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from ogl_tpu.config import StoppingConfig
    from ogl_tpu.kernels import roofline
    from ogl_tpu.solve import cg
    from ogl_tpu.solve.krylov import single_device_ops
    from ogl_tpu.solve.stopping import StoppingParams

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    dims = (128, 128, 64) if on_tpu else (32, 32, 16)
    dtype = jnp.float32
    log(f"device: {dev.device_kind} ({dev.platform}); problem: {dims} "
        f"({np.prod(dims):,} DOF), dtype {dtype.__name__}; "
        f"budget {BUDGET_S:.0f}s")

    t0 = time.perf_counter()
    # analytic host-side construction (pinned identical to the
    # coo_to_dia(ldu_to_coo_host(poisson_ldu(dims))) conversion path by
    # tests): the headline operator costs seconds of numpy + ONE upload —
    # no cache file, and crucially no device DOWN-fetch during setup (on a
    # slow tunnel day a 28 MB device_get can eat the whole budget; the
    # LDU conversion path itself is exercised in the foam lanes below)
    mat = _poisson_dia(dims)
    m_n = mat.shape[0]
    log(f"setup: {time.perf_counter() - t0:.1f}s (analytic Dia, "
        f"{len(mat.offsets)} diagonals)")

    from ogl_tpu.kernels.pallas_spmv import dia_matvec

    n = m_n
    rng = np.random.default_rng(0)
    x_true = rng.normal(size=n).astype(np.float32)
    mv_kernel = dia_matvec(mat)  # Pallas on TPU, XLA fallback elsewhere
    b = jax.jit(mv_kernel)(jnp.asarray(x_true))
    jax.block_until_ready(b)

    # round-trip latency of a host fetch (tunneled devices: tens of ms)
    tiny = jax.jit(lambda v: jnp.sum(v + 1.0))
    float(tiny(b))
    rtt = min(_timed(lambda: float(tiny(b))) for _ in range(5))
    log(f"host-fetch RTT: {rtt * 1e3:.1f} ms")

    # --- SpMV roofline (HEADLINE lane 1) --------------------------------
    # Measured on a problem whose operand set exceeds VMEM (~128 MB on
    # v5e/v5p): at 1M DOF the 36 MB of DIA data + vectors can stay
    # VMEM-resident across chained iterations and read >HBM peak (the
    # BENCH_r02 133% artifact).  8.4M DOF → ~300 MB working set: every
    # iteration must stream from HBM, so the number is an honest HBM
    # fraction (and a lower bound — see roofline.measure_chained).
    if on_tpu:
        rmat = _poisson_dia((256, 256, 128))
    else:
        rmat = mat
    rx = jnp.ones((rmat.shape[0],), jnp.float32)
    if on_tpu:
        # pass the matrix as a traced operand: closing over 235 MB bakes
        # it into the jaxpr as a constant (pathological compile time)
        from ogl_tpu.kernels.pallas_spmv import _DiaPlan, _dia_spmv_padded

        rplan = _DiaPlan(rmat, 512)

        def rmv(x, data3):
            y = _dia_spmv_padded(data3, rplan.pad_x(x), offsets=rplan.offsets,
                                 n=rplan.n, tile=rplan.tile)
            return y.reshape(-1)[: rplan.n]

        r_ops = (rplan.data3,)
    else:
        _rmv = dia_matvec(rmat)
        rmv = lambda x: _rmv(x)
        r_ops = ()
    r = roofline.measure_chained(
        rmv, rx, warmup=3, target_seconds=1.5, operands=r_ops,
        bytes_moved=roofline.spmv_bytes(rmat),
        flops=roofline.spmv_flops(rmat),
    )
    # Denominator: the spec-table peak can misdescribe the device actually
    # behind a tunneled backend, and a STREAM-triad (2 reads : 1 write)
    # under-measures what HBM sustains for the SpMV's READ-dominant mix
    # (a 7-diagonal DIA iteration is ~8 reads : 1 write) — the r2/r3
    # ">100% of peak" artifacts.  A roofline fraction is only defensible
    # against a peak this same harness demonstrates with dense streaming
    # of the SAME traffic mix: use max(spec, triad, read-dominant),
    # calibrated once and cached.
    eff_peak = r.peak_gbps
    rdev = None
    if on_tpu:
        speak_cache = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".bench_cache_streampeak.json")
        mpeak = rpeak = rdev = None
        if os.path.exists(speak_cache):
            with open(speak_cache) as f:
                d = json.load(f)
            if d.get("device_kind") == dev.device_kind:
                mpeak = float(d["stream_gbps"])
                rpeak = d.get("read_gbps")
                rdev = d.get("read_dev_gbps")
        if mpeak is None or rpeak is None or rdev is None:
            try:
                t0 = time.perf_counter()
                mpeak = roofline.measure_stream_peak()
                rpeak = roofline.measure_read_peak()
                rdev = roofline.measure_read_peak_device()
                log(f"stream-peak calibration: triad {mpeak:.0f} GB/s, "
                    f"read-dominant {rpeak:.0f} GB/s (host slope), "
                    f"{rdev:.0f} GB/s (device timeline) "
                    f"({time.perf_counter() - t0:.0f}s, cached)")
                with open(speak_cache, "w") as f:
                    json.dump({"device_kind": dev.device_kind,
                               "stream_gbps": mpeak,
                               "read_gbps": rpeak,
                               "read_dev_gbps": rdev}, f)
            except Exception as e:  # calibration must never kill the metric
                log(f"stream-peak calibration failed ({type(e).__name__}: "
                    f"{e}); denominator falls back to the spec table")
                mpeak, rpeak, rdev = mpeak or 0.0, rpeak or 0.0, rdev or 0.0
        eff_peak = max(eff_peak, mpeak, rpeak or 0.0)
        log(f"peak: spec {r.peak_gbps:.0f} GB/s, measured triad "
            f"{mpeak:.0f} GB/s, read-dominant {rpeak or 0:.0f} GB/s "
            f"-> denominator {eff_peak:.0f} GB/s")
    frac = r.gbps / eff_peak
    headline(f"SpMV roofline (n={rmat.shape[0]:,}): {r.seconds * 1e6:.1f} µs, "
             f"{r.gbps:.1f} GB/s = {100 * frac:.1f}% of the "
             f"{eff_peak:.0f} GB/s read-dominant peak")
    if frac > 1.0:
        headline("WARNING: fraction-of-peak >100% — measurement-harness "
                 "bug, treat the roofline number as invalid")

    # device-timeline cross-check (VERDICT r03 weak 2): the same chained
    # SpMV captured with jax.profiler and read from the xplane device plane
    # (kernels/xplane.py) — an independent clock.  Host-slope timing can
    # only be >= device-busy time (dispatch gaps, tunnel), so agreement
    # within a few % validates both; the device fraction-of-peak divides by
    # the read-peak measured on the SAME device clock so no mixed-clock
    # figure can exceed 100%.
    if on_tpu:
        try:
            k_dev = int(min(max(0.25 / r.seconds, 64), 4000))
            dev_s = roofline.measure_device_chained(
                rmv, rx, iters=k_dev, operands=r_ops)
            if dev_s > 0:
                dgbps = roofline.spmv_bytes(rmat) / dev_s / 1e9
                gap = 100 * (r.seconds - dev_s) / dev_s
                dfrac = (f", {100 * dgbps / rdev:.1f}% of the device-clock "
                         f"read peak ({rdev:.0f} GB/s)") if rdev else ""
                headline(f"SpMV device-timeline cross-check ({k_dev} chained"
                         f" applies): {dev_s * 1e6:.1f} µs/apply busy, "
                         f"{dgbps:.1f} GB/s{dfrac}; host-slope {gap:+.1f}% "
                         f"vs device")
            else:
                log("SpMV device-timeline cross-check: capture had no "
                    "accelerator plane — skipped")
        except Exception as e:
            log(f"SpMV device-timeline cross-check failed: "
                f"{type(e).__name__}: {e}")

    # --- CG solve (HEADLINE lane 2: merged-kernel path on TPU) -----------
    cfg = StoppingConfig(tolerance=1e-6, rel_tol=0.0, max_iter=1000, frequency=1)
    sp = StoppingParams.of(cfg)
    if on_tpu:
        from ogl_tpu.kernels.fused import CgKernels
        from ogl_tpu.solve.cg_fused import cg_fused

        kern = CgKernels(n, mat.offsets)
        data3 = kern.pack_values(mat)
        solve0 = jax.jit(
            lambda b, sp, d3: cg_fused(kern, d3, b, jnp.zeros_like(b), sp))
        solve = lambda b, sp: solve0(b, sp, data3)  # d3 traced, not a const
    else:
        ops = single_device_ops(mv_kernel, n)
        solve = jax.jit(lambda b, sp: cg(ops, b, jnp.zeros_like(b), sp))
    res = solve(b, sp)
    float(res.final_res_norm)  # compile + warm, forced
    # hi=33: the slope must span several times the tunnel's ~30 ms RTT
    # jitter or a ~5 ms solve reads ±25% run to run
    solve_t = _slope_timed(lambda: solve(b, sp),
                           lambda out: float(out.final_res_norm), hi=33)
    iters = int(res.iters)
    tpi = solve_t / max(iters, 1)
    tpi_dof_ns = tpi * 1e9 / n
    headline(f"CG 1M: {iters} iters, converged={bool(res.converged)}, "
             f"final={float(res.final_res_norm):.2e}, "
             f"solve {solve_t * 1e3:.1f} ms, time/iter {tpi * 1e6:.1f} µs, "
             f"time/iter/DOF {tpi_dof_ns:.3f} ns")

    # ==== the machine-readable headline JSON — printed NOW, before any
    # optional lane can eat the budget (VERDICT r04 item 1) ===============
    global _JSON_PRINTED
    vs_baseline = frac / 0.80
    print(json.dumps({
        "metric": "cg_time_per_iter_per_dof",
        "value": round(tpi_dof_ns, 4),
        "unit": "ns",
        "vs_baseline": round(vs_baseline, 3),
    }), flush=True)
    _JSON_PRINTED = True

    if on_tpu:
        # solve-level consistency cross-check for the SpMV roofline: one
        # fused-CG iteration streams the DIA planes once (K1) plus ~12
        # vector streams (K1: z,p in / p',q out; K2: x,r,p',q,invd in /
        # x,r,z out) — implied bandwidth must be the same order as the
        # SpMV measurement (it shares the HBM bottleneck)
        cg_bytes = (len(mat.offsets) + 12) * n * 4
        ws_mb = (len(mat.offsets) + 6) * n * 4 / 1e6  # data3 + ~6 live vectors
        note = (" [working set fits VMEM: chained iterations are served "
                "from VMEM, so >100% of the HBM stream peak is expected]"
                if ws_mb < 100 else "")
        log(f"CG implied bandwidth: {cg_bytes / tpi / 1e9:.0f} GB/s "
            f"({100 * cg_bytes / tpi / 1e9 / eff_peak:.0f}% of denominator, "
            f"working set ~{ws_mb:.0f} MB){note}")

        # device-timeline cross-check of the headline CG number: one traced
        # solve; device-busy union vs the host-slope solve time
        try:
            dsolve = _device_busy_of(
                lambda: float(solve(b, sp).final_res_norm))
            if dsolve:
                gap = 100 * (solve_t - dsolve) / dsolve
                headline(f"CG 1M device-timeline cross-check: "
                         f"{dsolve * 1e3:.1f} ms device-busy = "
                         f"{dsolve * 1e9 / max(iters, 1) / n:.4f} ns/iter/DOF"
                         f"; host-slope {gap:+.1f}% vs device")
            else:
                log("CG device-timeline cross-check: no accelerator plane "
                    "in capture — skipped")
        except Exception as e:
            log(f"CG device-timeline cross-check failed: "
                f"{type(e).__name__}: {e}")

    # --- beyond-VMEM CG: the 8.4M-DOF case streams every iteration from
    # HBM (~430 MB working set), so time/iter is the honest HBM-bound
    # figure (the 1M headline above is VMEM-resident and faster) ---------
    if on_tpu and lane_ok("CG 8.4M", 90):
        try:
            from ogl_tpu.kernels.fused import CgKernels
            from ogl_tpu.solve.cg_fused import cg_fused

            n8 = rmat.shape[0]
            kern8 = CgKernels(n8, rmat.offsets)
            data38 = kern8.pack_values(rmat)
            rng8 = np.random.default_rng(3)
            x8 = rng8.normal(size=n8).astype(np.float32)
            b8 = jax.jit(rmv)(jnp.asarray(x8), *r_ops)
            sp8 = StoppingParams.of(StoppingConfig(
                tolerance=1e-6, rel_tol=0.0, max_iter=2000, frequency=1))
            solve8 = jax.jit(lambda b, sp, d3: cg_fused(
                kern8, d3, b, jnp.zeros_like(b), sp))
            r8 = solve8(b8, sp8, data38)
            float(r8.final_res_norm)  # compile + warm
            t8 = _slope_timed(lambda: solve8(b8, sp8, data38),
                              lambda out: float(out.final_res_norm),
                              hi=5, reps=2)
            it8 = int(r8.iters)
            tpi8 = t8 / max(it8, 1)
            headline(f"CG 8.4M (beyond VMEM): {it8} iters, "
                     f"converged={bool(r8.converged)}, "
                     f"solve {t8 * 1e3:.1f} ms, "
                     f"time/iter {tpi8 * 1e6:.1f} µs, "
                     f"time/iter/DOF {tpi8 * 1e9 / n8:.4f} ns")
            # streaming-model context: the z-free identity iteration is
            # K1 (data nd + r,p windows + p',q writes) + K2i (4 reads,
            # 2 writes).  The window overlap (2K/T extra rows per tile)
            # is an upper bound on HBM traffic — consecutive windows
            # overlap and partially coalesce — so the model brackets the
            # bytes between overlap-free (17 words/DOF) and fully
            # re-streamed (19+); an implied bandwidth at/above the
            # measured read peak means the loop IS memory-system-bound.
            ov = 1.0 + 2 * kern8.K / kern8.tile
            lo8 = len(rmat.offsets) + 2 + 2 + 6
            hi8 = len(rmat.offsets) + 2 * ov + 2 + 6
            bw = lambda w: w * n8 * 4 / tpi8 / 1e9
            log(f"CG 8.4M streaming model: {lo8:.0f}-{hi8:.0f} words/DOF "
                f"traffic bracket -> {bw(lo8):.0f}-{bw(hi8):.0f} GB/s "
                f"implied; {100 * bw(lo8) / eff_peak:.0f}% of the "
                f"read-dominant peak already at the overlap-free LOW bound "
                f"(an upper-bracket figure above the peak just means actual "
                f"traffic sits near the low bound): the iteration is "
                f"memory-system-bound")
            dev8 = _device_busy_of(lambda: float(
                solve8(b8, sp8, data38).final_res_norm))
            if dev8:
                gap8 = 100 * (t8 - dev8) / dev8
                log(f"CG 8.4M device-timeline cross-check: "
                    f"{dev8 * 1e3:.1f} ms device-busy per solve; host-slope "
                    f"{t8 * 1e3:.1f} ms is {gap8:+.1f}% vs device")
        except Exception as e:
            log(f"8.4M CG bench failed: {type(e).__name__}: {e}")

    # --- BASELINE.json config sweep (iteration counts; stderr only) ------
    if os.environ.get("OGL_BENCH_SWEEP", "1") != "0" and lane_ok("sweep", 60):
        try:
            _config_sweep()
        except Exception as e:  # the sweep must never break the metric line
            log(f"config sweep failed: {type(e).__name__}: {e}")

    # --- large foam-path benches: per-step (update+solve) cost and the
    # preconditioned 1M cases (GKOCG+Multigrid, GKOGMRES+GISAI) ----------
    if os.environ.get("OGL_BENCH_LARGE", "1") != "0":
        try:
            _foam_large_benches(dims)
        except Exception as e:
            log(f"large foam benches failed: {type(e).__name__}: {e}")

    # --- unstructured SpMV + end-to-end solve: the Xell tier on a
    # realistic polyhedral-mesh analogue (1M-cell kNN-6 FV graph) --------
    if (on_tpu and os.environ.get("OGL_BENCH_XELL", "1") != "0"
            and lane_ok("unstructured Xell", 120)):
        try:
            _unstructured_bench()
        except Exception as e:
            log(f"unstructured bench failed: {type(e).__name__}: {e}")

    # --- multi-field cold start: wall-clock to the first completed time
    # step of a 4-field (p + U x 3) transient case in a FRESH process.
    # Demoted (VERDICT r04 item 1): the warm-cache regime only by default
    # (cold spawns a full XLA-compile subprocess — minutes); the recorded
    # cold/warm table lives in BASELINE.md (scripts/cold_start.py run once)
    if (on_tpu and os.environ.get("OGL_BENCH_COLDSTART", "1") != "0"
            and lane_ok("cold start (warm-cache regime)", 200)):
        try:
            _cold_start_bench(dims,
                              cold=os.environ.get("OGL_BENCH_COLDSTART") == "full")
        except Exception as e:
            log(f"cold-start bench failed: {type(e).__name__}: {e}")

    print_summary()


def _device_busy_of(call):
    """Device-busy seconds (xplane event-interval union, kernels/xplane.py)
    of one forced call under jax.profiler.trace; None if the capture has no
    accelerator plane."""
    import shutil
    import tempfile

    from ogl_tpu.kernels import xplane

    tdir = tempfile.mkdtemp(prefix="ogl_xplane_")
    try:
        with jax.profiler.trace(tdir):
            call()
        busy = xplane.device_busy_seconds(tdir)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return max(busy.values()) if busy else None


def _cold_start_bench(dims, cold=False):
    import shutil
    import subprocess
    import sys
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    script = os.path.join(repo, "scripts", "cold_start.py")
    cache_dir = tempfile.mkdtemp(prefix="ogl_coldcache_")
    env = dict(os.environ)
    env["COLD_DIMS"] = "x".join(map(str, dims))
    # the subprocess's sys.path[0] is scripts/, not the repo root — make
    # ogl_tpu importable (keep any existing entries, e.g. the axon site dir)
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    regimes = [("warm-cache (restart)", os.path.join(repo, ".jax_cache"))]
    if cold:  # opt-in: OGL_BENCH_COLDSTART=full (minutes of XLA compiles)
        regimes.insert(0, ("cold (fresh machine)", cache_dir))
    try:
        for regime, cdir in regimes:
            budget = max(min(remaining() - 30, 900), 60)
            env["OGL_JAX_CACHE_DIR"] = cdir
            p = subprocess.run([sys.executable, script], env=env,
                               capture_output=True, text=True,
                               timeout=budget)
            if p.returncode != 0:
                log(f"cold-start {regime} failed: {p.stderr[-1200:]}")
                return
            d = json.loads(p.stdout.strip().splitlines()[-1])
            per_field = " ".join(f"{k}={v:.1f}s"
                                 for k, v in d["fields_s"].items())
            headline(f"4-field first step, {regime}: "
                     f"{d['first_step_s']:.1f} s "
                     f"(import {d['import_s']:.1f}s, setup "
                     f"{d['setup_s']:.1f}s, {per_field}); second step "
                     f"{d['second_step_s'] * 1e3:.0f} ms")
    except subprocess.TimeoutExpired:
        log("cold-start subprocess hit its budget — skipped")
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)


def _poisson_dia(dims):
    """The 7-point Dirichlet-pinned Poisson DIA operator, constructed
    analytically (identical to coo_to_dia(ldu_to_coo(poisson_ldu(dims))) —
    pinned by tests — but seconds instead of minutes at 8M+ DOF)."""
    import jax.numpy as jnp
    import numpy as np

    from ogl_tpu.core import formats

    nx, ny, nz = dims
    n = nx * ny * nz
    i = np.arange(n)
    ix, iy, iz = i % nx, (i // nx) % ny, i // (nx * ny)
    planes = []
    offsets = []
    for stride, coord, m in ((nx * ny, iz, nz), (nx, iy, ny), (1, ix, nx)):
        if m > 1:
            offsets.append(-stride)
            planes.append(np.where(coord != 0, -1.0, 0.0))
    offsets.append(0)
    planes.append(np.full(n, 2.0 * sum(m > 1 for m in (nx, ny, nz))))
    for stride, coord, m in ((1, ix, nx), (nx, iy, ny), (nx * ny, iz, nz)):
        if m > 1:
            offsets.append(stride)
            planes.append(np.where(coord != m - 1, -1.0, 0.0))
    order = np.argsort(offsets)
    data = np.stack([planes[k] for k in order]).astype(np.float32)
    return formats.Dia(data=jnp.asarray(data),
                       offsets=tuple(int(offsets[k]) for k in order),
                       shape=(n, n))


def _foam_large_benches(dims):
    """Foam-front-end benches at the headline size (reference printed-metric
    parity, lduLduBase.H:280-305): per-step steady-state cost, delta/bf16
    uploads, preconditioned large cases, dist + halo-exchange-on-hardware,
    f64 (single-device AND distributed), BiCGStab, ACG, GMRES bf16 basis.
    Each sub-lane is budget-gated.  All results go to stderr."""
    import dataclasses as dc

    from ogl_tpu import foam, registry
    from ogl_tpu import testing as problems

    if not lane_ok("foam benches (LDU build + first solve)", 60):
        return
    t0 = time.perf_counter()
    m = problems.poisson_ldu(dims)
    n = m.n
    rng = np.random.default_rng(1)
    b = rng.normal(size=n).astype(np.float32)
    log(f"foam benches: LDU build {time.perf_counter() - t0:.1f}s, n={n:,}")
    base = {"tolerance": 1e-6, "relTol": 0, "maxIter": 2000}

    # (a) per-step update+solve (GKOCG, auto format -> fused path on TPU)
    registry.global_registry.clear()
    t0 = time.perf_counter()
    _, perf = foam.solve("benchStep", m, b, {"solver": "GKOCG", **base})
    log(f"per-step: first solve (init+compile+solve) {time.perf_counter() - t0:.1f}s, "
        f"iters={perf.n_iterations}")
    steps = []
    for i in range(3):
        m2 = dc.replace(m, upper=m.upper * (1.0 + 1e-7 * (i + 1)),
                        diag=m.diag * (1.0 + 1e-7 * (i + 1)))
        t0 = time.perf_counter()
        _, perf = foam.solve("benchStep", m2, b, {"solver": "GKOCG", **base})
        steps.append(time.perf_counter() - t0)
    headline(f"per-step (update+solve, steady state): "
             f"{min(steps) * 1e3:.1f} ms, iters={perf.n_iterations}, "
             f"{min(steps) * 1e9 / max(perf.n_iterations, 1) / n:.3f} "
             "ns/iter/DOF incl. coefficient update")
    slv = registry.global_registry.get_or_init("benchStep_solver", lambda: None)
    if slv is not None and getattr(slv, "last_timings", None):
        split = ", ".join(f"{k} {v * 1e3:.1f} ms"
                          for k, v in sorted(slv.last_timings.items()))
        log(f"per-step phase split (dispatches are async, so the blocking "
            f"'solve' phase absorbs the queued host->device coefficient "
            f"upload — tunnel-bound here, PCIe-class on a production "
            f"part): {split}")
    if slv is not None:
        dt = slv.time_device_solve()
        it = max(perf.n_iterations, 1)
        headline(f"per-step device-only solve (resident state, incl. one "
                 f"dispatch round trip): {dt * 1e3:.1f} ms, "
                 f"{dt * 1e6 / it:.1f} µs/iter, "
                 f"{dt * 1e9 / it / n:.4f} ns/iter/DOF")

    # delta-update steady state: only the DIAG changes (the transient-CFD
    # common case — fixed mesh + constant transport coefficients keep the
    # off-diagonal blocks constant while ddt terms move diag/RHS); the
    # per-block compare skips the unchanged uploads
    steps = []
    for i in range(3):
        m2 = dc.replace(m, diag=m.diag * (1.0 + 1e-7 * (i + 1)))
        t0 = time.perf_counter()
        _, perf = foam.solve("benchStep", m2, b, {"solver": "GKOCG", **base})
        steps.append(time.perf_counter() - t0)
    up = getattr(slv, "last_blocks_uploaded", None) if slv is not None else None
    headline(f"per-step diag-only change (delta upload {up}): "
             f"{min(steps) * 1e3:.1f} ms, iters={perf.n_iterations}")

    # (a') uploadPrecision bfloat16: the error-feedback bf16 delta encoding
    # of the coefficient/RHS streams — same transient nudges, half bytes
    if lane_ok("bf16 upload deltas", 45):
        try:
            registry.global_registry.clear()
            bf_controls = {"solver": "GKOCG", **base,
                           "uploadPrecision": "bfloat16"}
            foam.solve("benchBf16Up", m, b, bf_controls)
            steps = []
            for i in range(4):
                m2 = dc.replace(m, upper=m.upper * (1.0 + 1e-7 * (i + 1)),
                                diag=m.diag * (1.0 + 1e-7 * (i + 1)))
                t0 = time.perf_counter()
                _, perf = foam.solve("benchBf16Up", m2, b, bf_controls)
                steps.append(time.perf_counter() - t0)
            bslv = registry.global_registry.get_or_init(
                "benchBf16Up_solver", lambda: None)
            bf = getattr(bslv, "last_blocks_bf16", ("?", "?"))
            by = getattr(bslv, "last_upload_bytes", 0)
            headline(f"per-step with bf16 upload deltas: "
                     f"{min(steps[1:]) * 1e3:.1f} ms, "
                     f"iters={perf.n_iterations}, bf16 blocks {bf[0]}/{bf[1]}"
                     f", {by / 1e6:.1f} MB/step uploaded")
        except Exception as e:
            log(f"bf16-upload bench failed: {type(e).__name__}: {e}")

    # (b) GKOCG + Multigrid (precond TTL models the reference `caching` key)
    if lane_ok("GKOCG+Multigrid", 60):
        amg_controls = {"solver": "GKOCG", **base,
                        "preconditioner": {"preconditioner": "Multigrid",
                                           "caching": 30}}
        t0 = time.perf_counter()
        _, perf = foam.solve("benchAmg", m, b, amg_controls)
        log(f"GKOCG+Multigrid: first solve {time.perf_counter() - t0:.1f}s, "
            f"iters={perf.n_iterations}")
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, perf = foam.solve("benchAmg", m, b, amg_controls)
            ts.append(time.perf_counter() - t0)
        headline(f"GKOCG+Multigrid steady: {min(ts) * 1e3:.1f} ms, "
                 f"iters={perf.n_iterations}, converged={perf.converged}")

    # (c) distributed solve over the available mesh (shard_map + psum; on a
    # one-device mesh the plan is empty, so this measures the dist program
    # WITHOUT halo traffic — the halo-exchange cost is measured in (c'))
    if lane_ok("dist GKOCG", 45):
        try:
            t0 = time.perf_counter()
            _, perf = foam.solve_distributed("benchDist", m, b,
                                             {"solver": "GKOCG", **base})
            log(f"dist GKOCG ({len(jax.devices())} device(s)): first solve "
                f"{time.perf_counter() - t0:.1f}s, iters={perf.n_iterations}")
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _, perf = foam.solve_distributed("benchDist", m, b, {})
                ts.append(time.perf_counter() - t0)
            headline(f"dist GKOCG steady: {min(ts) * 1e3:.1f} ms, "
                     f"iters={perf.n_iterations}, converged={perf.converged}")
            dslv = registry.global_registry.get_or_init(
                "benchDist_dist_solver", lambda: None)
            if dslv is not None:
                dt = dslv.time_device_solve()
                it = max(perf.n_iterations, 1)
                headline(f"dist device-only solve (resident state): "
                         f"{dt * 1e3:.1f} ms, {dt * 1e6 / it:.1f} µs/iter")
        except Exception as e:
            log(f"dist bench failed: {type(e).__name__}: {e}")

    # (c') halo-exchange hot path ON HARDWARE (VERDICT r3 item 1)
    if lane_ok("halo exchange on hardware", 90):
        try:
            _halo_hw_bench(dims)
        except Exception as e:
            log(f"halo-exchange bench failed: {type(e).__name__}: {e}")

    # (d) mixed-precision GKOIR: outer f32 Richardson, inner CG streaming a
    # bfloat16-packed operator (defect correction — converges to the f32
    # tolerance; the inner rides the merged-kernel path with half the
    # A-read bytes).  Compared against the unpreconditioned CG above.
    if lane_ok("GKOIR inner-bf16", 40):
        try:
            ir_controls = {"solver": "GKOIR", **base,
                           "inner": {"tolerance": 1e-2, "relTol": 0,
                                     "maxIter": 600, "precision": "bfloat16"}}
            t0 = time.perf_counter()
            _, perf = foam.solve("benchIrBf16", m, b, ir_controls)
            log(f"GKOIR inner-bf16: first solve {time.perf_counter() - t0:.1f}s, "
                f"outer iters={perf.n_iterations}")
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _, perf = foam.solve("benchIrBf16", m, b, ir_controls)
                ts.append(time.perf_counter() - t0)
            headline(f"GKOIR inner-bf16 steady: {min(ts) * 1e3:.1f} ms, "
                     f"outer iters={perf.n_iterations}, "
                     f"converged={perf.converged}, "
                     f"final={perf.final_residual:.2e}")
        except Exception as e:
            log(f"GKOIR inner-bf16 bench failed: {type(e).__name__}: {e}")

    # (d') THE f64 configuration: host-f64 defect correction around the
    # fused f32 device inner (foam/f64.py), batched sweeps.  Solves to a
    # residual level f32 cannot reach.  OpenFOAM double parity
    # (GKOCG.H:45-61).
    if lane_ok("f64 defect correction", 60):
        try:
            f64_controls = {"solver": "GKOCG", "tolerance": 0.0,
                            "relTol": 1e-12, "maxIter": 6000,
                            "dtype": "float64"}
            t0 = time.perf_counter()
            _, perf = foam.solve("benchF64", m, b, f64_controls)
            log(f"f64 defect-correction: first solve "
                f"{time.perf_counter() - t0:.1f}s, total inner "
                f"iters={perf.n_iterations}")
            ts = []
            for i in range(3):
                m2 = dc.replace(m, diag=m.diag * (1.0 + 1e-9 * (i + 1)))
                t0 = time.perf_counter()
                _, perf = foam.solve("benchF64", m2, b, f64_controls)
                ts.append(time.perf_counter() - t0)
            f64slv = registry.global_registry.get_or_init(
                "benchF64_solver", lambda: None)
            sweeps = getattr(f64slv, "last_outer_sweeps", -1)
            headline(f"f64 defect-correction steady (relTol 1e-12): "
                     f"{min(ts) * 1e3:.1f} ms/step, {sweeps} sweeps, "
                     f"total inner iters={perf.n_iterations}, final f64 "
                     f"residual {perf.final_residual:.2e}, "
                     f"converged={perf.converged}")
        except Exception as e:
            log(f"f64 bench failed: {type(e).__name__}: {e}")

    # (d'') DISTRIBUTED f64 (VERDICT r04 item 2): the same defect
    # correction gated through solve_distributed — f64 outer on host CSR,
    # fused dist-f32 inner over the mesh
    if lane_ok("distributed f64", 60):
        try:
            f64d_controls = {"solver": "GKOCG", "tolerance": 0.0,
                             "relTol": 1e-12, "maxIter": 6000,
                             "dtype": "float64"}
            t0 = time.perf_counter()
            _, perf = foam.solve_distributed("benchF64d", m, b, f64d_controls)
            log(f"dist f64 defect-correction: first solve "
                f"{time.perf_counter() - t0:.1f}s, total inner "
                f"iters={perf.n_iterations}")
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                _, perf = foam.solve_distributed("benchF64d", m, b,
                                                 f64d_controls)
                ts.append(time.perf_counter() - t0)
            headline(f"dist f64 defect-correction steady (relTol 1e-12, "
                     f"{len(jax.devices())} device(s)): "
                     f"{min(ts) * 1e3:.1f} ms/step, total inner "
                     f"iters={perf.n_iterations}, final f64 residual "
                     f"{perf.final_residual:.2e}, converged={perf.converged}")
        except Exception as e:
            log(f"dist f64 bench failed: {type(e).__name__}: {e}")

    # (e') GKOBiCGStab at the headline size: the BJ production config plus
    # the fused-vs-unfused decision data in the VMEM-resident regime
    # (VERDICT r04 weak 5 — the ≤VMEM default is decided from THIS data,
    # not the 8.4M measurement): both variants identity-preconditioned so
    # they are iteration-exact comparable (bicgstab_fused.py contract)
    if lane_ok("GKOBiCGStab fused-vs-unfused", 90):
        try:
            for tag, controls in (
                ("BJ/unfused", {"solver": "GKOBiCGStab", **base,
                                "preconditioner": {"preconditioner": "BJ",
                                                   "maxBlockSize": 1}}),
                ("none/unfused", {"solver": "GKOBiCGStab", **base}),
                ("none/fused", {"solver": "GKOBiCGStab", **base,
                                "fusedBiCGStab": True}),
            ):
                registry.global_registry.clear()
                t0 = time.perf_counter()
                _, perf = foam.solve("benchBi", m, b, controls)
                first = time.perf_counter() - t0
                ts = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    _, perf = foam.solve("benchBi", m, b, controls)
                    ts.append(time.perf_counter() - t0)
                bslv = registry.global_registry.get_or_init(
                    "benchBi_solver", lambda: None)
                dt = (bslv.time_device_solve() if bslv is not None
                      else float("nan"))
                headline(f"GKOBiCGStab {tag} steady 1M: "
                         f"{min(ts) * 1e3:.1f} ms, iters={perf.n_iterations},"
                         f" device-only {dt * 1e3:.1f} ms "
                         f"({dt * 1e6 / max(perf.n_iterations, 1):.0f} "
                         f"µs/iter; first {first:.1f}s)")
        except Exception as e:
            log(f"GKOBiCGStab bench failed: {type(e).__name__}: {e}")

    # (e'') coupled GKOACG: the 3-component multivector solve the reference
    # ships dead (aborting coupled ctor, HostMatrix.C:153-156)
    if lane_ok("GKOACG coupled", 40):
        try:
            nc = 3
            rngc = np.random.default_rng(7)
            bc = rngc.normal(size=(n, nc)).astype(np.float32)
            acg_controls = dict(base)  # GKOACG is its own entry point
            t0 = time.perf_counter()
            _, perfc = foam.solve_coupled("benchAcg", m, bc, acg_controls)
            log(f"GKOACG ({nc}-component coupled): first solve "
                f"{time.perf_counter() - t0:.1f}s, iters={perfc.n_iterations}")
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                _, perfc = foam.solve_coupled("benchAcg", m, bc, acg_controls)
                ts.append(time.perf_counter() - t0)
            headline(f"GKOACG steady: {min(ts) * 1e3:.1f} ms, "
                     f"iters={perfc.n_iterations}, "
                     f"converged={perfc.converged}")
        except Exception as e:
            log(f"GKOACG bench failed: {type(e).__name__}: {e}")

    # (e) GKOGMRES + GISAI (+ bf16 basis variant)
    if lane_ok("GKOGMRES+GISAI", 80):
        gmres_controls = {"solver": "GKOGMRES", **base,
                          "preconditioner": {"preconditioner": "GISAI",
                                             "sparsityPower": 1, "caching": 30}}
        t0 = time.perf_counter()
        _, perf = foam.solve("benchGmres", m, b, gmres_controls)
        log(f"GKOGMRES+GISAI: first solve {time.perf_counter() - t0:.1f}s, "
            f"iters={perf.n_iterations}")
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            _, perf = foam.solve("benchGmres", m, b, gmres_controls)
            ts.append(time.perf_counter() - t0)
        headline(f"GKOGMRES+GISAI steady: {min(ts) * 1e3:.1f} ms, "
                 f"iters={perf.n_iterations}, converged={perf.converged}")
        it32, ms32 = perf.n_iterations, min(ts) * 1e3

        # basisPrecision bfloat16: the Krylov basis stream IS the GMRES
        # per-iteration cost at this size — bf16 storage halves it while
        # H, Givens, dots and x stay f32
        if lane_ok("GMRES bf16 basis", 40):
            try:
                registry.global_registry.clear()
                g16 = {**gmres_controls, "basisPrecision": "bfloat16"}
                foam.solve("benchGmres16", m, b, g16)
                ts = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    _, perf = foam.solve("benchGmres16", m, b, g16)
                    ts.append(time.perf_counter() - t0)
                ms16 = min(ts) * 1e3
                headline(f"GKOGMRES+GISAI bf16 basis steady: {ms16:.1f} ms, "
                         f"iters={perf.n_iterations} (f32 basis: "
                         f"{ms32:.1f} ms, {it32} iters) -> ms/iter "
                         f"{ms16 / max(perf.n_iterations, 1):.2f} vs "
                         f"{ms32 / max(it32, 1):.2f}")
            except Exception as e:
                log(f"bf16-basis GMRES bench failed: {type(e).__name__}: {e}")


def _halo_hw_bench(dims):
    """Fused dist-CG with a NON-EMPTY halo plan on the available mesh (one
    real chip: self-neighbor d=0 class), vs the same operator with an
    empty plan (cyclic couplings as plain local columns).

    Cost AND parity are measured on PINNED-iteration runs (minIter =
    maxIter, tolerance 0): both variants execute identical trip counts and
    must land on the SAME final residual (trajectory parity — the halo
    representation is bit-rounding-close to the local one, verified off
    line to rel ~1e-7 per matvec).  A tolerance-stopped comparison at the
    f32 stagnation floor is NOT meaningful for parity: near the floor a
    one-ulp rounding difference flips the convergence decision and the
    iteration counts diverge wildly while both trajectories are equally
    converged.  Also runs the fused-pipelined variant through the same
    plan."""
    from ogl_tpu import foam, registry
    from ogl_tpu import testing as problems

    t0 = time.perf_counter()
    ch = problems.channel_ldu(dims)
    n = ch.n
    rng = np.random.default_rng(5)
    b = rng.normal(size=n).astype(np.float32)
    log(f"halo-exchange bench: channel LDU build {time.perf_counter() - t0:.1f}s, "
        f"n={n:,}")
    pin = 200
    base = {"solver": "GKOCG", "tolerance": 0.0, "relTol": 0,
            "minIter": pin, "maxIter": pin}
    results = {}
    for tag, controls in (
        ("halo", {**base, "cyclicViaHalo": True}),
        ("halo-pipelined", {**base, "cyclicViaHalo": True,
                            "pipelinedCG": True}),
        ("local-cols", base),
    ):
        t0 = time.perf_counter()
        _, perf = foam.solve_distributed(f"benchHalo_{tag}", ch, b, controls)
        first = time.perf_counter() - t0
        slv = registry.global_registry.get_or_init(
            f"benchHalo_{tag}_dist_solver", lambda: None)
        dm = slv.assembler.dm
        dt = slv.time_device_solve()
        it = max(perf.n_iterations, 1)
        results[tag] = [it, dt, perf.final_residual, slv]
        route = ("affine (slices + lane matmuls)"
                 if dm.plan.send_affine is not None else "generic gather")
        log(f"halo-exchange {tag}: plan offsets {dm.plan.offsets} "
            f"({sum(dm.halo_sizes):,} halo entries, route: {route}), "
            f"{it} pinned iters, "
            f"final residual {perf.final_residual:.4e}, first {first:.1f}s, "
            f"device-only {dt * 1e3:.1f} ms ({dt * 1e6 / it:.1f} µs/iter, "
            f"{dt * 1e9 / it / n:.4f} ns/iter/DOF)")
        if tag.startswith("halo"):
            assert dm.plan.offsets, "halo bench built an empty plan"
    if "halo" in results and "local-cols" in results:
        # the exchange cost is a DIFFERENCE of two ~200 µs/iter figures
        # measured ~30 s apart — tunnel phase drift between them dominated
        # the r4/r5 artifacts (16-57 µs/iter swing across runs).  Re-time
        # both variants INTERLEAVED so any drift hits them equally.
        for _ in range(2):
            for tag in ("halo", "local-cols"):
                results[tag][1] = min(results[tag][1],
                                      results[tag][3].time_device_solve())
        (it_h, dt_h, r_h, _s) = results["halo"]
        (it_l, dt_l, r_l, _s) = results["local-cols"]
        rel = abs(r_h - r_l) / max(abs(r_l), 1e-30)
        headline(f"halo-exchange on hw: parity after {pin} pinned iters — "
                 f"residuals {r_h:.4e} (halo) vs {r_l:.4e} (no-halo), "
                 f"rel {rel:.1e}; exchange cost "
                 f"{max(dt_h / it_h - dt_l / it_l, 0) * 1e6:.1f} µs/iter "
                 f"({dt_h / it_h * 1e6:.1f} vs {dt_l / it_l * 1e6:.1f} µs)")


def _unstructured_bench():
    """The fully-unstructured tier: a 1M-cell kNN-6 FV-graph matrix (the
    polyhedral-mesh analogue whose RCM'd bandwidth ~112 blocks exceeds any
    Gdia plane budget), packed by pack_fast -> Xell crossed-gather SpMV,
    PLUS the end-to-end GKOCG solve on the same operator (VERDICT r04
    item 4: the SpMV alone is not the iteration cost).  Reference role:
    device-fast Csr for arbitrary sparsity (CsrMatrixWrapper.H:138-161)."""
    from ogl_tpu.core import formats
    from ogl_tpu.kernels import roofline, spmv

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache_fvgraph_1m.npz")
    n = 1 << 20
    t0 = time.perf_counter()
    if os.path.exists(cache):
        z = np.load(cache)
        rows, cols, vals = z["rows"], z["cols"], z["vals"]
    else:
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        from scipy.spatial import cKDTree

        rng = np.random.default_rng(0)
        pts = rng.random((n, 3))
        _, idx = cKDTree(pts).query(pts, k=7, workers=-1)
        src = np.repeat(np.arange(n), 6)
        dst = idx[:, 1:].ravel()
        r_ = np.concatenate([src, dst])
        c_ = np.concatenate([dst, src])
        m_ = coo_matrix((np.ones(len(r_)), (r_, c_)), shape=(n, n)).tocsr()
        perm = reverse_cuthill_mckee(m_, symmetric_mode=True)
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        mc = m_.tocoo()
        rows, cols = inv[mc.row], inv[mc.col]
        order = np.lexsort((cols, rows))
        rows = rows[order].astype(np.int32)
        cols = cols[order].astype(np.int32)
        vals = np.random.default_rng(1).normal(
            size=len(rows)).astype(np.float32)
        np.savez(cache, rows=rows, cols=cols, vals=vals)
    mat = spmv.pack_fast(rows, cols, vals, n, presorted=True)
    fmt = type(mat).__name__
    log(f"unstructured 1M FV-graph: nnz={len(rows):,}, pack_fast -> {fmt} "
        f"({time.perf_counter() - t0:.1f}s setup)")
    if fmt != "Xell":
        log("unexpected format (wanted Xell) — skipping")
        return
    # correctness spot-check vs scipy
    import scipy.sparse as sp_

    x = np.random.default_rng(2).normal(size=n).astype(np.float32)
    acsr = sp_.csr_matrix((vals, (rows, cols)), shape=(n, n))
    yref = acsr @ x.astype(np.float64)
    y = np.asarray(jax.device_get(spmv.matvec(mat)(jnp.asarray(x))))
    rel = float(np.abs(y - yref).max() / np.abs(yref).max())
    assert rel < 1e-5, f"Xell hw mismatch: {rel}"
    main_ = int(np.prod(mat.vals.shape))
    bytes_moved = main_ * 7 + n * 4 * 2  # vals f32 + ll i8 + bbT i16 + x + y
    leaves, tdef = jax.tree_util.tree_flatten(mat)

    def step(v, *ls):
        return spmv.matvec(jax.tree_util.tree_unflatten(tdef, ls))(v)

    r = roofline.measure_chained(step, jnp.asarray(x),
                                 bytes_moved=bytes_moved,
                                 operands=tuple(leaves))
    stream_bound = bytes_moved / 819e9  # v5e spec read-dominant floor
    headline(f"Xell SpMV 1M unstructured: {r.seconds * 1e6:.1f} µs/apply "
             f"({r.gbps:.0f} GB/s effective, {r.seconds / stream_bound:.1f}x "
             f"the 819 GB/s streaming bound; K={mat.n_slots}, "
             f"fill={len(rows) / mat.stored:.0%}, spill={mat.spill.nnz}); "
             f"vs scipy rel {rel:.1e}")

    spd = None
    # end-to-end GKOCG solve on the Xell operator (VERDICT r04 item 4):
    # SPD shifted graph Laplacian with the same sparsity — µs/iter and
    # ns/iter/DOF vs the structured fused path's headline
    if lane_ok("Xell end-to-end CG", 60):
        try:
            spd = _spd_laplacian(rows, cols, n)
            _unstructured_solve_bench(*spd, n)
        except Exception as e:
            log(f"Xell end-to-end solve bench failed: {type(e).__name__}: {e}")

    # DISTRIBUTED Xell on hardware (VERDICT r04 missing 2 'Done'): the
    # same unstructured operator with ~4096 entries forced through the
    # halo exchange — a real self-neighbor ppermute round per iteration
    # with the crossed-gather local apply inside shard_map
    if lane_ok("dist Xell on hardware", 120):
        try:
            if spd is None:
                spd = _spd_laplacian(rows, cols, n)
            _dist_xell_bench(*spd, n)
        except Exception as e:
            log(f"dist Xell bench failed: {type(e).__name__}: {e}")


def _spd_laplacian(rows, cols, n):
    """Shifted graph Laplacian (deg+1 on the diagonal, -1 off): same
    sparsity as the kNN graph plus the diagonal, guaranteed SPD.  ONE
    construction shared by the end-to-end and distributed Xell lanes (the
    7M-entry lexsort is seconds of the budget; and the lanes must solve
    the SAME operator to be comparable)."""
    deg = np.bincount(np.asarray(rows, np.int64), minlength=n)
    lrows = np.concatenate([rows, np.arange(n, dtype=rows.dtype)])
    lcols = np.concatenate([cols, np.arange(n, dtype=cols.dtype)])
    lvals = np.concatenate([np.full(len(rows), -1.0, np.float32),
                            (deg + 1.0).astype(np.float32)])
    order = np.lexsort((lcols, lrows))
    return (lrows[order].astype(np.int32), lcols[order].astype(np.int32),
            lvals[order].astype(np.float32))


def _dist_xell_bench(lrows, lcols, lvals, n):
    from jax.sharding import Mesh

    from ogl_tpu.config import StoppingConfig
    from ogl_tpu.dist.partition import (XellStack, gather_global,
                                        partition_coo, split_vector)
    from ogl_tpu.dist.solve import dist_solve
    from ogl_tpu.core.formats import Coo
    from ogl_tpu.solve.stopping import StoppingParams

    coo = Coo(rows=lrows, cols=lcols, vals=lvals, shape=(n, n))
    rng = np.random.default_rng(9)
    fh = np.zeros(len(lrows), bool)
    fh[rng.choice(len(lrows), size=4096, replace=False)] = True
    t0 = time.perf_counter()
    dm = partition_coo(coo, 1, local_format="Xell", force_halo=fh)
    assert isinstance(dm.local, XellStack)
    assert dm.plan.offsets == (0,), dm.plan.offsets
    setup = time.perf_counter() - t0
    x_true = rng.normal(size=n).astype(np.float32)
    import scipy.sparse as sp_

    acsr = sp_.csr_matrix((np.asarray(coo.vals),
                           (np.asarray(coo.rows), np.asarray(coo.cols))),
                          shape=(n, n))
    b = (acsr @ x_true.astype(np.float64)).astype(np.float32)
    bs = jnp.asarray(split_vector(dm, b))
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    pin = 50
    sp2 = StoppingParams.of(StoppingConfig(
        tolerance=0.0, rel_tol=0.0, min_iter=pin, max_iter=pin, frequency=1))
    t0 = time.perf_counter()
    xs, res = dist_solve(dm, bs, jnp.zeros_like(bs), sp2, mesh)
    x = gather_global(dm, xs)
    first = time.perf_counter() - t0
    rel = float(np.abs(acsr @ x.astype(np.float64) - b).max()
                / np.abs(b).max())
    it = int(np.asarray(jax.device_get(res.iters)).ravel()[0])
    headline(f"dist Xell on hw (self-neighbor plan, {sum(dm.halo_sizes)} "
             f"halo entries, K={dm.local.n_slots}): {it} pinned iters, "
             f"|Ax-b|/|b| {rel:.1e}, first {first:.1f}s "
             f"(setup {setup:.1f}s)")


def _unstructured_solve_bench(lrows, lcols, lvals, n):
    """GKOCG on an SPD operator with the 1M kNN-6 unstructured sparsity
    (graph Laplacian + I: same Xell structure, guaranteed SPD).  The
    headline is the MERGED-kernel path (XellCgKernels: K1 = p-update +
    crossed-gather SpMV + in-kernel spill + δ-dot, K2 streaming) — the
    unfused multi-kernel loop is timed after it for the comparison when
    budget remains."""
    from ogl_tpu.config import StoppingConfig
    from ogl_tpu.kernels import spmv
    from ogl_tpu.solve import cg
    from ogl_tpu.solve.krylov import single_device_ops
    from ogl_tpu.solve.stopping import StoppingParams

    mat = spmv.pack_fast(lrows, lcols, lvals, n, presorted=True)
    fmt = type(mat).__name__
    leaves, tdef = jax.tree_util.tree_flatten(mat)
    rng = np.random.default_rng(4)
    xt = rng.normal(size=n).astype(np.float32)
    b = jax.jit(lambda v, *ls: spmv.matvec(jax.tree_util.tree_unflatten(
        tdef, ls))(v))(jnp.asarray(xt), *leaves)
    sp = StoppingParams.of(StoppingConfig(
        tolerance=1e-6, rel_tol=0.0, max_iter=1000, frequency=1))

    it_f = None
    if fmt == "Xell":
        try:
            from ogl_tpu.kernels.xell import XellCgKernels
            from ogl_tpu.solve.cg_fused import cg_fused

            kern = XellCgKernels.for_matrix(mat)
            data3 = kern.pack_values(mat)
            dleaves, ddef = jax.tree_util.tree_flatten(data3)
            solve_f = jax.jit(lambda bb, pp, *ls: cg_fused(
                kern, jax.tree_util.tree_unflatten(ddef, ls), bb,
                jnp.zeros_like(bb), pp))
            res_f = solve_f(b, sp, *dleaves)
            float(res_f.final_res_norm)
            t_f = _slope_timed(lambda: solve_f(b, sp, *dleaves),
                               lambda out: float(out.final_res_norm),
                               hi=9, reps=2)
            it_f = int(res_f.iters)
            tpi_f = t_f / max(it_f, 1)
            headline(f"Xell end-to-end GKOCG 1M (merged kernels, in-kernel "
                     f"spill): {it_f} iters, "
                     f"converged={bool(res_f.converged)}, "
                     f"solve {t_f * 1e3:.1f} ms, {tpi_f * 1e6:.1f} µs/iter, "
                     f"{tpi_f * 1e9 / n:.4f} ns/iter/DOF "
                     f"(structured fused path: see 'CG 1M' above)")
        except Exception as e:
            log(f"merged Xell solve failed: {type(e).__name__}: {e}")

    if it_f is not None and not lane_ok("Xell unfused comparison", 45):
        return
    mv = lambda v: spmv.matvec(jax.tree_util.tree_unflatten(
        tdef, leaves))(v)
    ops = single_device_ops(mv, n)
    solve = jax.jit(lambda bb, pp: cg(ops, bb, jnp.zeros_like(bb), pp))
    res = solve(b, sp)
    float(res.final_res_norm)
    t = _slope_timed(lambda: solve(b, sp),
                     lambda out: float(out.final_res_norm), hi=9, reps=2)
    it = int(res.iters)
    tpi = t / max(it, 1)
    headline(f"Xell end-to-end GKOCG 1M (unfused loop, {fmt} operator): "
             f"{it} iters, "
             f"converged={bool(res.converged)}, solve {t * 1e3:.1f} ms, "
             f"{tpi * 1e6:.1f} µs/iter, {tpi * 1e9 / n:.4f} ns/iter/DOF"
             + (f"; iteration parity fused {it_f} = {it}" if it_f == it
                else ""))


def _config_sweep():
    """The BASELINE.json configs (small sizes; the parity metric is the
    iteration count, which is size- and tolerance-controlled):
      1. GKOCG unpreconditioned (the headline above, full size)
      2. GKOBiCGStab + BJ maxBlockSize>1
      3. GKOGMRES + GISAI, Ell format, adaptMinIter
      4. GKOCG + Multigrid (maxLevels 9, minCoarseRows 10)
      5. multi-rank halo SpMV — validated by __graft_entry__.dryrun_multichip
         on the virtual mesh (one real chip here)."""
    from ogl_tpu import foam, registry
    from ogl_tpu import testing as problems

    registry.global_registry.clear()
    m = problems.poisson_ldu((48, 48))
    rng = np.random.default_rng(0)
    x_true = rng.normal(size=m.n)
    from ogl_tpu.core import ldu as _l

    a_coo = _l.ldu_to_coo_host(m)
    import scipy.sparse as sp_

    acsr = sp_.csr_matrix(
        (np.asarray(a_coo.vals), (np.asarray(a_coo.rows), np.asarray(a_coo.cols))),
        shape=a_coo.shape,
    )
    b = acsr @ x_true
    configs = [
        ("GKOBiCGStab+BJ8/Csr", {"solver": "GKOBiCGStab", "matrixFormat": "Csr",
                                 "preconditioner": {"preconditioner": "BJ", "maxBlockSize": 8}}),
        ("GKOGMRES+GISAI/Ell", {"solver": "GKOGMRES", "matrixFormat": "Ell",
                                "adaptMinIter": True,
                                "preconditioner": {"preconditioner": "GISAI", "sparsityPower": 2}}),
        ("GKOCG+AMG/Csr", {"solver": "GKOCG", "matrixFormat": "Csr",
                           "preconditioner": {"preconditioner": "Multigrid",
                                              "maxLevels": 9, "minCoarseRows": 10}}),
    ]
    for name, extra in configs:
        controls = {"tolerance": 1e-6, "relTol": 0, "maxIter": 2000, **extra}
        x, perf = foam.solve(f"sweep_{name}", m, b, controls)
        err = float(np.abs(np.asarray(x) - x_true).max())
        # iteration parity vs the "reference executor" (BASELINE.md metric 3:
        # same systems solved on the CPU backend must take the same number
        # of iterations up to rounding-order effects)
        _, perf_cpu = foam.solve(f"sweepcpu_{name}", m, b,
                                 {**controls, "executor": "cpu"})
        headline(f"sweep {name}: iters={perf.n_iterations} "
                 f"(cpu executor: {perf_cpu.n_iterations}) "
                 f"converged={perf.converged} "
                 f"final={perf.final_residual:.2e} max|err|={err:.2e}")


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException:
        print_summary()
        raise
