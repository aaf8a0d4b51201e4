"""Staging-sort alternatives, measured head-to-head at the real rung shapes.

The round-3 profile shows `stage` dominating dmel (60.8 s of 83.5 s): the
candidate stage sorts the FULL (R, W) window planes though only ~p*W slots
survive the sampling mask (hit_buffer 512 vs W 65536 at dmel = 128x waste).
This bench measures candidate-selection strategies that sort/search only
what survives:

  A. current: full-width lax.sort of the masked planes, slice HB
  B. blocked: reshape to (R*G, B) blocks, short per-block sort, slice C
     per block, reshape to (R, G*C), narrow sort, slice HB
  C. compact_rows (cumsum + lower_bound binary-search gathers) to HB,
     then narrow sort
  D. lax.top_k on a packed selection key -> candidate columns, gather
     planes, narrow sort

Run serially on the real chip:  python bench/micro_stage.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaves = jax.tree.leaves(x)
    # block_until_ready is a no-op on this tunnel; force a real D2H
    for l in leaves:
        np.asarray(jax.device_get(l.ravel()[:1]))


def t(name, fn, *args, n=3):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"  {name:52s} {med*1e3:9.2f} ms", flush=True)
    return med


def block_cap(b: int, p: float) -> int:
    mean = p * b
    return max(8, int(mean + 6.0 * mean**0.5) + 1)


def run_shape(tag, R, W, p, HB, planes_n):
    print(f"{tag}: R={R} W={W} p={p} HB={HB} planes={planes_n}", flush=True)
    rng = np.random.default_rng(0)
    planes = tuple(
        jnp.asarray(rng.integers(0, 1 << 31, (R, W), dtype=np.uint32))
        for _ in range(planes_n)
    )
    mask = jnp.asarray(rng.random((R, W)) < p)
    SENT = jnp.uint32(0xFFFFFFFF)

    def masked(ps, m):
        return tuple(jnp.where(m, x, SENT) for x in ps)

    # A. current full sort
    def full_sort(ps, m):
        mp = masked(ps, m)
        if len(mp) == 1:
            s = (jnp.sort(mp[0], axis=1),)
        else:
            s = tuple(jax.lax.sort(mp, dimension=1, num_keys=len(mp)))
        return tuple(x[:, :HB] for x in s)

    t("A full-width sort + slice", jax.jit(full_sort), planes, mask)

    # B. blocked selection + narrow sort
    for B in (512, 1024, 2048):
        if W % B:
            continue
        G = W // B
        C = block_cap(B, p)
        if G * C < HB:
            continue

        def blocked(ps, m, B=B, G=G, C=C):
            mp = masked(ps, m)
            blk = tuple(x.reshape(R * G, B) for x in mp)
            if len(blk) == 1:
                s = (jnp.sort(blk[0], axis=1),)
            else:
                # selection only: plane0 (has the sentinel) is the key,
                # the rest ride as payload
                s = tuple(jax.lax.sort(blk, dimension=1, num_keys=1))
            nar = tuple(x[:, :C].reshape(R, G * C) for x in s)
            if len(nar) == 1:
                s2 = (jnp.sort(nar[0], axis=1),)
            else:
                s2 = tuple(jax.lax.sort(nar, dimension=1, num_keys=len(nar)))
            return tuple(x[:, :HB] for x in s2)

        t(f"B blocked B={B} C={C} (GC={G*C}) + narrow sort",
          jax.jit(blocked), planes, mask)

    # C. compact_rows + narrow sort
    from fedrann_tpu.ops import compact_rows

    def compacted(ps, m):
        outs, _, _ = compact_rows(m, ps, HB, (SENT,) * len(ps))
        if len(outs) == 1:
            return (jnp.sort(outs[0], axis=1),)
        return tuple(jax.lax.sort(outs, dimension=1, num_keys=len(outs)))

    t("C compact_rows + narrow sort", jax.jit(compacted), planes, mask)

    # D. top_k selection + gather + narrow sort
    def topk_sel(ps, m):
        col = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        key = jnp.where(m, -col, jnp.int32(-W - 1))
        _, pos = jax.lax.top_k(key, HB)   # candidate columns, ascending col
        outs = tuple(
            jnp.where(
                jnp.take_along_axis(m, pos, axis=1),
                jnp.take_along_axis(x, pos, axis=1),
                SENT,
            )
            for x in ps
        )
        if len(outs) == 1:
            return (jnp.sort(outs[0], axis=1),)
        return tuple(jax.lax.sort(outs, dimension=1, num_keys=len(outs)))

    t("D top_k select + gather + narrow sort", jax.jit(topk_sel), planes, mask)

    # floor: the codec that produces the planes
    bases = jnp.asarray(rng.integers(0, 4, (R, W + 20), dtype=np.uint8))
    from fedrann_tpu.kmers.codec import canonical_window_codes

    k = 15 if planes_n == 1 else 21
    t(f"codec canonical_window_codes k={k}",
      jax.jit(lambda b: canonical_window_codes(b, k)), bases)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    # dmel-like: 65536 bucket, k=21 (2 planes), p=0.005
    run_shape("dmel", 512, 65536, 0.005, 512, 2)
    # chr1-like: 16384 bucket, k=15 (1 plane), p=0.005
    run_shape("chr1", 2048, 16384, 0.005, 512, 1)
    # driver-bench-like: 16384 bucket, k=15, p=0.05
    run_shape("driver", 2048, 16384, 0.05, 1024, 1)


if __name__ == "__main__":
    main()
