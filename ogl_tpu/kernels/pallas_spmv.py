"""Pallas TPU kernel for DIA (stencil) SpMV — the device hot loop at
HBM-roofline speed.

Why a kernel: the XLA lowering of DIA SpMV (static shifted products,
kernels/spmv.py:spmv_dia) materialises each shifted copy of x through
sublane/lane shift ops at HBM cost, reaching only ~16% of peak on v5e.
This kernel streams the (n_diags, T, 128) coefficient blocks through the
automatic pallas pipeline, DMAs one (T+2K, 128) halo'd window of x per
tile, and performs all shifts as in-VMEM lane rolls:

  flat index i+off, off = 128·q + rm  ⇒  row r+q (sublane slice, free)
  and lane roll by rm combining rows r+q and r+q+1 (two pltpu.rolls + a
  lane-predicated select) — only non-multiple-of-128 offsets pay the roll.

Layout contract: x is viewed as (R, 128); grids whose x-pitch is 128 make
the ±nx offsets pure row shifts (choose nx=128-multiples for channel-type
cases).  Everything is static: offsets are compile-time, shapes padded to
tiles; pad rows carry zero coefficients so they are numerically inert.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ogl_tpu.core.formats import Dia

__all__ = ["dia_spmv", "dia_matvec"]

LANES = 128


def _kernel(x_hbm, data_ref, y_ref, xs, sem, *, offsets, T, K, n_diags):
    """xs: (2, T+2K, LANES) double-buffered x windows; the window for tile
    i+1 is DMA'd while tile i computes (the coefficient blocks are
    pipelined automatically by pallas_call's block machinery)."""
    i = jnp.asarray(pl.program_id(0), jnp.int32)  # x64-safe (Mosaic slice indices must be i32)
    num = pl.num_programs(0)

    def window_dma(tile_idx, slot):
        slot = jnp.asarray(slot, jnp.int32)  # literal slots are i64 under x64
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(jnp.asarray(tile_idx * T, jnp.int32), T + 2 * K), :],
            xs.at[slot], sem.at[slot]
        )

    two = jnp.asarray(2, i.dtype if hasattr(i, "dtype") else jnp.int32)
    slot = jax.lax.rem(i, two)

    @pl.when(i == 0)
    def _():
        window_dma(0, 0).start()

    @pl.when(i + 1 < num)
    def _():
        window_dma(i + 1, jax.lax.rem(i + 1, two)).start()

    window_dma(i, slot).wait()

    acc = jnp.zeros((T, LANES), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
    for k, off in enumerate(offsets):
        q, rm = divmod(off, LANES)
        base = K + q
        a = xs[slot, base : base + T, :]
        if rm == 0:
            sh = a
        else:
            b = xs[slot, base + 1 : base + 1 + T, :]
            # want lane mapping c -> (c+rm) % 128 == jnp.roll by -rm;
            # pltpu.roll requires a non-negative shift: use LANES - rm
            ar = pltpu.roll(a, jnp.asarray(LANES - rm, jnp.int32), 1)
            br = pltpu.roll(b, jnp.asarray(LANES - rm, jnp.int32), 1)
            sh = jnp.where(lane < LANES - rm, ar, br)
        acc = acc + data_ref[k].astype(jnp.float32) * sh.astype(jnp.float32)
    y_ref[:] = acc.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("offsets", "n", "tile", "interpret"))
def _dia_spmv_padded(data3, xpad, *, offsets, n, tile, interpret=False):
    """data3: (nd, Rp, 128) zero-padded; xpad: (Rp + 2K, 128)."""
    nd, rp, _ = data3.shape
    K = (xpad.shape[0] - rp) // 2
    grid = rp // tile
    y = pl.pallas_call(
        functools.partial(_kernel, offsets=offsets, T=tile, K=K, n_diags=nd),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # x stays in HBM, manual DMA
            pl.BlockSpec((nd, tile, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, LANES), xpad.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile + 2 * K, LANES), xpad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * rp * LANES,
            bytes_accessed=(nd + 2) * rp * LANES * xpad.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xpad, data3)
    return y


class _DiaPlan:
    """Precomputed padded layout for a Dia matrix (cached per matrix id)."""

    def __init__(self, mat: Dia, tile: int):
        n = mat.shape[0]
        self.n = n
        self.offsets = mat.offsets
        maxoff = max((abs(o) for o in mat.offsets), default=0)
        k = maxoff // LANES + 1
        self.K = -(-k // 8) * 8  # sublane-aligned halo row count
        r = math.ceil(n / LANES)
        self.tile = min(tile, max(8, 8 * math.ceil(r / 8)))
        rp = math.ceil(r / self.tile) * self.tile
        self.rp = rp
        data = mat.data
        pad = rp * LANES - n
        data3 = jnp.pad(data, ((0, 0), (0, pad))).reshape(len(mat.offsets), rp, LANES)
        self.data3 = data3

    def pad_x(self, x):
        xp = jnp.pad(x, (0, self.rp * LANES - self.n)).reshape(self.rp, LANES)
        return jnp.pad(xp, ((self.K, self.K), (0, 0)))


def dia_matvec(mat: Dia, tile: int = 512, interpret: bool | None = None):
    """Return x -> A@x using the Pallas kernel (TPU; interpret mode
    elsewhere when interpret=True) with automatic fallback to the XLA path.
    float32 accumulate."""
    if interpret is None:
        interpret = False
    if (jax.default_backend() != "tpu" and not interpret) or not mat.offsets:
        from ogl_tpu.kernels.spmv import spmv_dia

        return lambda x: spmv_dia(mat, x)
    plan = _DiaPlan(mat, tile)

    def mv(x):
        xpad = plan.pad_x(x)
        y = _dia_spmv_padded(
            plan.data3, xpad, offsets=plan.offsets, n=plan.n, tile=plan.tile,
            interpret=interpret,
        )
        return y.reshape(-1)[: plan.n]

    return mv


def dia_spmv(mat: Dia, x, tile: int = 512, interpret: bool | None = None):
    return dia_matvec(mat, tile, interpret=interpret)(x)
