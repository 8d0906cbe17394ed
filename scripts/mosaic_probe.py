#!/usr/bin/env python
"""Probe individual Mosaic ops used by the Xell in-kernel spill path —
run each in its own pallas_call with unbuffered prints so a compile hang
identifies the offending op (the chip wedges on a hung backend compile,
so this costs one tunnel-recovery cycle per hang)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

S = 128
TB = 128
LANES = 128
C = 2


def run(name, kernel, out_shape, *args):
    print(f"[{time.strftime('%H:%M:%S')}] {name}: compiling...",
          flush=True)
    t0 = time.time()
    y = pl.pallas_call(kernel, out_shape=out_shape)(*args)
    s = float(jnp.sum(y))
    print(f"[{time.strftime('%H:%M:%S')}] {name}: OK ({time.time()-t0:.1f}s,"
          f" sum={s:.3e})", flush=True)


def main():
    which = sys.argv[1:] or ["concat", "dg10", "dg11", "onehot", "slice8",
                             "sum0", "all"]
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((TB, LANES)).astype(np.float32))
    b = jnp.asarray(rng.random((TB, LANES)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (1, S)).astype(np.int32))
    idx8 = jnp.asarray(rng.integers(0, 128, (8, S)).astype(np.int32))

    if "concat" in which:
        def k_concat(x_ref, y_ref, o_ref):
            w = jnp.concatenate([x_ref[:], y_ref[:]], axis=0)
            o_ref[:] = w[:TB] + w[TB:]
        run("concat-axis0", k_concat,
            jax.ShapeDtypeStruct((TB, LANES), jnp.float32), a, b)

    if "dg10" in which:
        def k_dg10(x_ref, y_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], y_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        run("dot_general (1,0) standard", k_dg10,
            jax.ShapeDtypeStruct((TB, LANES), jnp.float32), a, b)

    if "dg11" in which:
        def k_dg11(x_ref, y_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], y_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        run("dot_general (1,1) rhs-T", k_dg11,
            jax.ShapeDtypeStruct((TB, LANES), jnp.float32), a, b)

    if "onehot" in which:
        def k_onehot(i_ref, o_ref):
            e = (jax.lax.broadcasted_iota(jnp.int32, (TB, S), 0)
                 == i_ref[:]).astype(jnp.float32)
            o_ref[:] = e
        run("iota==broadcast one-hot", k_onehot,
            jax.ShapeDtypeStruct((TB, S), jnp.float32), idx)

    if "slice8" in which:
        def k_slice8(i_ref, o_ref):
            x = i_ref[:]
            o_ref[:] = (x[0:1] + x[3:4]).astype(jnp.float32)
        run("(8,S) sublane slice", k_slice8,
            jax.ShapeDtypeStruct((1, S), jnp.float32), idx8)

    if "sum0" in which:
        def k_sum0(x_ref, o_ref):
            o_ref[:] = jnp.sum(x_ref[:], axis=0, keepdims=True)
        run("sum axis0 keepdims", k_sum0,
            jax.ShapeDtypeStruct((1, LANES), jnp.float32), a)

    if "all" in which:
        # the full _spill_corr composition on one tile
        from ogl_tpu.kernels.xell import _spill_corr

        wn = jnp.asarray(rng.random((C * TB, LANES)).astype(np.float32))
        sidx = jnp.asarray(rng.integers(0, 128, (1, 8, S)).astype(np.int32))
        sval = jnp.asarray(rng.random((1, 8, S)).astype(np.float32))

        def k_all(w_ref, i_ref, v_ref, o_ref):
            o_ref[:] = _spill_corr(w_ref[:], i_ref, v_ref, C)
        run("full _spill_corr", k_all,
            jax.ShapeDtypeStruct((TB, LANES), jnp.float32), wn, sidx, sval)

    print("probe complete", flush=True)


if __name__ == "__main__":
    main()
