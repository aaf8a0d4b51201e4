"""One-off Mosaic capability probes for the fused-kernel redesign.

Answers, on the real chip:
  1. how much SMEM scratch a kernel can allocate
  2. whether an input BlockSpec can place a (rb, hb) block in SMEM
  3. whether dynamic-sublane vector load (q_ref[pl.ds(i,1), :]) +
     dynamic-sublane RMW store (e_ref[pl.ds(r,1), :] += v) compile
  4. scalar while-loop (binary search over SMEM) throughput
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)  # match package config


def probe_smem_scratch():
    for n in (1 << 12, 1 << 14, 1 << 15, 1 << 16, 1 << 17, 1 << 18):
        def kern(o_ref, s_ref):
            s_ref[0] = jnp.int32(n)
            o_ref[0, 0] = s_ref[0]

        try:
            out = pl.pallas_call(
                kern,
                out_specs=pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                scratch_shapes=[pltpu.SMEM((n,), jnp.int32)],
            )()
            jax.block_until_ready(out)
            print(f"SMEM scratch {n*4//1024:6d} KB: OK")
        except Exception as e:
            print(f"SMEM scratch {n*4//1024:6d} KB: FAIL {str(e)[:120]}")
            break


def probe_smem_input():
    rb, hb = 16, 2048
    x = jnp.asarray(np.arange(4 * rb * hb, dtype=np.int32).reshape(4 * rb, hb))

    def kern(x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[i, i & 1023]
        o_ref[0] = jax.lax.fori_loop(0, rb, body, jnp.int32(0))

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
        print(f"SMEM input block ({rb},{hb}) = {rb*hb*4//1024} KB: OK  val={out[0]}")
    except Exception as e:
        print(f"SMEM input block: FAIL {str(e)[:200]}")


def probe_dyn_sublane():
    tile, d = 512, 1024
    rb = 256
    q = jnp.asarray(np.random.default_rng(0).normal(size=(tile, d)).astype(np.float32))
    idxs = jnp.asarray(np.random.default_rng(1).integers(0, tile, 4096, dtype=np.int32))
    rows = jnp.asarray(np.random.default_rng(2).integers(0, rb, 4096, dtype=np.int32))

    def kern(idx_ref, row_ref, q_ref, e_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            e_ref[...] = jnp.zeros_like(e_ref)

        def body(i, _):
            p = idx_ref[i]
            r = row_ref[i]
            v = q_ref[pl.ds(p, 1), :]
            e_ref[pl.ds(r, 1), :] += v
            return jnp.int32(0)

        jax.lax.fori_loop(0, 4096, body, jnp.int32(0))

    try:
        f = pl.pallas_call(
            kern,
            grid=(2,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, d), lambda i: (jnp.int32(0), jnp.int32(0)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rb, d), lambda i: (jnp.int32(0), jnp.int32(0)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rb, d), jnp.float32),
        )
        out = f(idxs, rows, q)
        jax.block_until_ready(out)
        # timing: 2 grid steps x 4096 RMW = 8192 dynamic-row accumulates
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(idxs, rows, q))
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[2]
        print(f"dyn-sublane RMW: OK  {med*1e6:.0f} us for 8192 RMW "
              f"({med/8192*1e9:.0f} ns each)")
    except Exception as e:
        print(f"dyn-sublane RMW: FAIL {str(e)[:300]}")


def probe_scalar_bsearch():
    n = 1 << 13  # 8192-entry SMEM table
    nq = 1 << 14
    table = jnp.asarray(np.sort(np.random.default_rng(0).integers(
        0, 1 << 30, n, dtype=np.int32)))
    qs = jnp.asarray(np.random.default_rng(1).integers(
        0, 1 << 30, nq, dtype=np.int32))

    def kern(t_ref, q_ref, o_ref):
        def body(i, acc):
            q = q_ref[i]

            def bs(s):
                lo, hi = s
                mid = (lo + hi) >> jnp.int32(1)
                go = t_ref[mid] < q
                return (jax.lax.select(go, mid + jnp.int32(1), lo),
                        jax.lax.select(go, hi, mid))

            lo, _ = jax.lax.while_loop(lambda s: s[0] < s[1], bs,
                                       (jnp.int32(0), jnp.int32(n)))
            return acc + lo

        o_ref[0] = jax.lax.fori_loop(0, nq, body, jnp.int32(0))

    try:
        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1,), memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        )
        out = f(table, qs)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(table, qs))
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[2]
        print(f"scalar bsearch (13 steps): OK  {med*1e3:.2f} ms for {nq} queries "
              f"({med/nq*1e9:.0f} ns/query)")
    except Exception as e:
        print(f"scalar bsearch: FAIL {str(e)[:300]}")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("smem", "all"):
        probe_smem_scratch()
    if which in ("input", "all"):
        probe_smem_input()
    if which in ("dyn", "all"):
        probe_dyn_sublane()
    if which in ("bsearch", "all"):
        probe_scalar_bsearch()
