"""Micro-benchmark: the embed stage's projection-row gather rate.

The driver bench shows embed at ~20 GB/s effective (2.6% HBM util) and it
is the largest stage there. This isolates embed_hits_pair_mirror at the
driver shape to find where the rate goes: (a) the paired-row gather
itself, (b) a raw jnp.take of the same volume (XLA gather ceiling), and
(c) a contiguous-copy control (HBM ceiling for this access size).

Run on the real chip: python bench/micro_embed.py
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fedrann_tpu.project.embed import embed_hits_pair_mirror


def _sync(out):
    """block_until_ready is a no-op on the tunneled axon platform
    (measured 61 TB/s 'gathers' — impossible); a 1-row device->host copy
    is the only reliable completion barrier here."""
    x = out[0] if isinstance(out, tuple) else out
    np.asarray(x[:1])


def timeit(fn, *args, reps=6):
    _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    # driver-bench shape: 7.5k reads -> 4 chunks x 2048 rows, width 1024,
    # library 310k (p_ext 620k+1 rows), d=512 bf16
    r, w, lib, d = 2048, 1024, 310_000, 512
    rng = np.random.default_rng(0)
    p_ext = jnp.asarray(
        rng.standard_normal((2 * lib + 1, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    hits = jnp.asarray(
        rng.integers(0, 2 * lib, size=(r, w), dtype=np.int64).astype(np.int32))
    # ~30% sentinel holes like real staged rows
    mask = rng.random((r, w)) < 0.3
    hits = jnp.where(jnp.asarray(mask), 2 * lib, hits)

    t = timeit(lambda h: embed_hits_pair_mirror(h, p_ext, lib), hits)
    bytes_moved = 2 * r * w * d * 2  # fwd+rev rows, bf16
    print(f"embed_hits_pair_mirror: {t*1e3:.1f} ms -> "
          f"{bytes_moved/t/1e9:.1f} GB/s effective")

    take = jax.jit(lambda h: jnp.take(p_ext, h, axis=0).sum(axis=1))
    t2 = timeit(take, hits)
    print(f"raw take+sum (1 gather/slot): {t2*1e3:.1f} ms -> "
          f"{r*w*d*2/t2/1e9:.1f} GB/s")

    # gather granularity ladder: same volume, varying rows-per-index
    for cols in (128, 512, 1024):
        tab = p_ext[:, :cols]
        n_idx = r * w * d // cols // 2
        idx2 = jnp.asarray(
            rng.integers(0, 2 * lib, size=(n_idx,), dtype=np.int64)
            .astype(np.int32))
        g = jax.jit(lambda i, tb: jnp.take(tb, i, axis=0).sum(axis=0))
        t3 = timeit(g, idx2, tab)
        print(f"take {cols}-col rows x {n_idx}: {t3*1e3:.1f} ms -> "
              f"{n_idx*cols*2/t3/1e9:.1f} GB/s")

    copy = jax.jit(lambda x: x * 1.0000001)
    t4 = timeit(copy, p_ext)
    print(f"contiguous r+w control: {t4*1e3:.2f} ms -> "
          f"{2*p_ext.nbytes/t4/1e9:.1f} GB/s")

    # sorted-index variant: does locality change the gather rate?
    hits_sorted = jnp.sort(hits, axis=1)
    t5 = timeit(lambda h: embed_hits_pair_mirror(h, p_ext, lib), hits_sorted)
    print(f"embed (row-sorted hits): {t5*1e3:.1f} ms -> "
          f"{bytes_moved/t5/1e9:.1f} GB/s")


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# Round-5 record (VERDICT r4 item 7): one-hot-matmul embed vs row gather.
#
# The one-hot formulation E = A @ P (A = scatter of ones over the feature
# axis, tiled) pays 2*R*F*2d FLOPs per chunk regardless of sparsity:
#   driver (F=620k):  2*2048*620k*1024 ~ 2.6e12 FLOP/chunk ~ 13 ms at peak
#                     -> competitive with the measured ~54 ms gather.
#   chr1  (F=4.5M):   2*2048*4.5M*1024 ~ 1.9e13 FLOP/chunk ~ 96 ms at peak
#                     -> WORSE than the gather it replaces, before adding
#                     the scatter to build A and the P re-read per chunk.
# It loses exactly where the embed cost matters (large libraries), so the
# shipped round-5 answer attacks the GATHERED BYTES instead: the projection
# factorizes into per-row magnitude x ternary signs, stored 2-bit-packed
# (srp.build_precompute_signs) — 8x smaller rows (260 B vs 2 KB) at
# bitwise-f32 accuracy. Gathers stay per-row-bound (the ladder above), so
# the row-rate is unchanged, but the table fits where the dense one OOM'd
# (human rung: 0.68 GB vs 5.4 GB) and HBM pressure during embed drops 8x.
# An in-chip one-hot micro at the driver shape hit the round-5 compile-
# server stalls (>15 min for the tile loop) and was abandoned; the
# arithmetic above bounds it either way.
