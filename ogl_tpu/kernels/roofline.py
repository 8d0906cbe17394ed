"""Roofline model for SpMV and solver iterations.

The reference prints per-solve derived metrics (time/iter [µs],
time/iter/DOF [ns], copy-back GB/s — lduLduBase.H:280-305) but has no
bytes-moved model.  SpMV is memory-bound everywhere, so the north-star
metric on TPU is achieved HBM bandwidth vs. the chip's peak
(BASELINE.md target: ≥80% of roofline).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ogl_tpu.core.formats import Coo, Csr, Dia, Ell, Sell

__all__ = ["spmv_bytes", "spmv_flops", "hbm_peak_gbps", "Roofline", "measure"]

# Peak HBM bandwidth per chip [GB/s].  Sources: public TPU spec tables
# (jax-ml.github.io/scaling-book numbers).
_HBM_PEAK = {
    "v4": 1228.0,
    "v5e": 819.0,
    "v5 lite": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
    "v6 lite": 1640.0,  # device_kind spells v6e as "TPU v6 lite"
    "cpu": 50.0,  # nominal, for relative numbers in CI
}


def hbm_peak_gbps(device=None) -> float:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, bw in _HBM_PEAK.items():
        if key in kind:
            return bw
    return _HBM_PEAK["cpu"] if device.platform == "cpu" else 819.0


def _isize(m):
    return 4  # int32 indices


def spmv_bytes(m) -> int:
    """Minimal HBM traffic for one y = A@x: read values+indices once,
    read x once (perfect cache), write y once."""
    vs = np.dtype(m.dtype).itemsize
    n, nc = m.shape
    if isinstance(m, (Coo,)):
        return m.nnz * (vs + 2 * _isize(m)) + nc * vs + n * vs
    if isinstance(m, Csr):
        return m.nnz * (vs + _isize(m)) + (n + 1) * _isize(m) + nc * vs + n * vs
    if isinstance(m, Ell):
        k = m.row_width
        return n * k * (vs + _isize(m)) + nc * vs + n * vs
    if isinstance(m, Sell):
        s, c, w = m.vals.shape
        return s * c * w * (vs + _isize(m)) + nc * vs + n * vs
    if isinstance(m, Dia):
        nd = len(m.offsets)
        # values + x streamed once per diagonal band (worst case) vs once
        # total (best case); report the optimistic bound like the GPU
        # SpMV literature: vals once, x once, y once.
        return nd * n * vs + nc * vs + n * vs
    raise TypeError(type(m))


def spmv_flops(m) -> int:
    if isinstance(m, Dia):
        return 2 * len(m.offsets) * m.shape[0]
    if isinstance(m, Ell):
        return 2 * m.shape[0] * m.row_width
    if isinstance(m, Sell):
        s, c, w = m.vals.shape
        return 2 * s * c * w
    return 2 * m.nnz


@dataclasses.dataclass(frozen=True)
class Roofline:
    seconds: float
    bytes: int
    flops: int
    peak_gbps: float

    @property
    def gbps(self) -> float:
        return self.bytes / self.seconds / 1e9

    @property
    def fraction_of_peak(self) -> float:
        return self.gbps / self.peak_gbps


def measure(fn, *args, warmup: int = 3, iters: int = 20, bytes_moved=0, flops=0) -> Roofline:
    """Wall-clock a device function (blocks on the result).

    NOTE: per-call dispatch latency can dominate for µs-scale kernels
    (especially through a remote-device tunnel); prefer measure_chained for
    roofline numbers."""
    import time

    out = fn(*args)  # ensure compiled even when warmup=0
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return Roofline(seconds=dt, bytes=bytes_moved, flops=flops, peak_gbps=hbm_peak_gbps())


def measure_chained(vec_fn, x0, iters: int = 50, warmup: int = 2,
                    bytes_moved=0, flops=0) -> Roofline:
    """Time a vector->vector kernel accurately on remote/tunneled devices.

    Two defences against timing artifacts:
      * `iters` dependent applications run inside ONE compiled fori_loop
        (no per-kernel dispatch overhead);
      * execution is forced by fetching a scalar reduction to the host
        (block_until_ready can acknowledge before the device has actually
        executed on tunneled backends), and the constant round-trip cost
        cancels via the difference of an `iters`- and a 2×`iters`-length
        chain.
    """
    import time

    def chain_of(k):
        @jax.jit
        def chain(x):
            return jnp.sum(jax.lax.fori_loop(0, k, lambda i, v: vec_fn(v), x))

        return chain

    def best_time(f, reps):
        float(f(x0))  # compile + warm, forced
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    reps = max(warmup, 2)
    t1 = best_time(chain_of(iters), reps)
    t2 = best_time(chain_of(2 * iters), reps)
    per_iter = max((t2 - t1) / iters, 1e-9)
    return Roofline(seconds=per_iter, bytes=bytes_moved, flops=flops,
                    peak_gbps=hbm_peak_gbps())
