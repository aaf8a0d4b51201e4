"""Round 2 of Mosaic probes: fixed int32 discipline; narrow the
dyn-sublane failure (store vs RMW vs fori_loop)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

I32 = jnp.int32


def probe_smem_input():
    rb, hb = 16, 2048
    x = jnp.asarray(np.arange(4 * rb * hb, dtype=np.int32).reshape(4 * rb, hb))

    def kern(x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[i, i & I32(1023)]
        o_ref[0] = jax.lax.fori_loop(I32(0), I32(rb), body, I32(0))

    try:
        out = pl.pallas_call(
            kern,
            grid=(4,),
            in_specs=[pl.BlockSpec((rb, hb), lambda i: (jnp.int32(i), jnp.int32(0)),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1,), lambda i: (jnp.int32(0),),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        )(x)
        jax.block_until_ready(out)
        print(f"SMEM input block ({rb},{hb}): OK val={out[0]}")
    except Exception as e:
        print(f"SMEM input block: FAIL {str(e)[:300]}")


def _try(name, kern, grid, in_specs, out_specs, out_shape, args):
    try:
        f = pl.pallas_call(kern, grid=grid, in_specs=in_specs,
                           out_specs=out_specs, out_shape=out_shape)
        out = f(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name}: OK  {sorted(ts)[1]*1e6:.0f} us")
        return True
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:250]}")
        return False


def probe_dyn_variants():
    tile, d, rb, nh = 512, 1024, 256, 4096
    q = jnp.asarray(np.random.default_rng(0).normal(size=(tile, d)).astype(np.float32))
    idxs = jnp.asarray(np.random.default_rng(1).integers(0, tile, nh, dtype=np.int32))
    rows = jnp.asarray(np.random.default_rng(2).integers(0, rb, nh, dtype=np.int32))

    q_spec = pl.BlockSpec((tile, d), lambda i: (jnp.int32(0), jnp.int32(0)),
                          memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((rb, d), lambda i: (jnp.int32(0), jnp.int32(0)),
                          memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    # variant A: dynamic-sublane LOAD only, accumulate into fixed row
    def kern_a(idx_ref, row_ref, q_ref, e_ref):
        e_ref[...] = jnp.zeros_like(e_ref)

        def body(i, _):
            v = q_ref[pl.ds(idx_ref[i], 1), :]
            e_ref[pl.ds(I32(0), 1), :] += v
            return I32(0)

        jax.lax.fori_loop(I32(0), I32(nh), body, I32(0))

    _try("A: dyn-load + fixed-row RMW", kern_a, (1,),
         [smem, smem, q_spec], e_spec,
         jax.ShapeDtypeStruct((rb, d), jnp.float32), (idxs, rows, q))

    # variant B: fixed-row load, dynamic-sublane STORE (no read)
    def kern_b(idx_ref, row_ref, q_ref, e_ref):
        e_ref[...] = jnp.zeros_like(e_ref)

        def body(i, _):
            v = q_ref[pl.ds(I32(0), 1), :]
            e_ref[pl.ds(row_ref[i], 1), :] = v
            return I32(0)

        jax.lax.fori_loop(I32(0), I32(nh), body, I32(0))

    _try("B: dyn-row store", kern_b, (1,),
         [smem, smem, q_spec], e_spec,
         jax.ShapeDtypeStruct((rb, d), jnp.float32), (idxs, rows, q))

    # variant C: full dyn RMW (the one that failed inside grid/when)
    def kern_c(idx_ref, row_ref, q_ref, e_ref):
        e_ref[...] = jnp.zeros_like(e_ref)

        def body(i, _):
            v = q_ref[pl.ds(idx_ref[i], 1), :]
            e_ref[pl.ds(row_ref[i], 1), :] += v
            return I32(0)

        jax.lax.fori_loop(I32(0), I32(nh), body, I32(0))

    _try("C: dyn-load + dyn-row RMW", kern_c, (1,),
         [smem, smem, q_spec], e_spec,
         jax.ShapeDtypeStruct((rb, d), jnp.float32), (idxs, rows, q))


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    probe_dyn_variants()
