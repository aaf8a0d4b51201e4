"""Per-kernel device microbenchmarks at driver-bench shapes.

Times each hot jitted stage in isolation on the real chip (median of 5
after warm-up) so implementation changes can be compared without the
5-10x host-VM noise of the end-to-end bench. Run serially (nothing else
on the box):

    python bench/micro.py [stage|membership|embed|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


R, L, K = 256, 16384, 15
FRACTION = 0.05
SEED = 602
HIT_BUFFER = 2048
MAX_HITS = 2048
D = 512
N_CHUNKS = 30  # bench.py: 7500 reads / 256


def _time(fn, *args, n=5):
    fn(*args)  # warm-up / compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def make_bases(seed=0):
    rng = np.random.default_rng(seed)
    lens = np.clip(rng.normal(8000, 2000, R).astype(int), 200, L)
    b = np.full((R, L), 4, np.uint8)
    for i, n in enumerate(lens):
        b[i, :n] = rng.integers(0, 4, n, dtype=np.uint8)
    return jnp.asarray(b)


def bench_stage(bases):
    from fedrann_tpu.kmers.membership import stage_candidates

    seed32 = jnp.uint32(SEED)
    thr = jnp.uint32(int(FRACTION * 2**32))

    t = _time(lambda b: stage_candidates(b, K, HIT_BUFFER, False, seed32, thr),
              bases)
    print(f"stage_candidates         {t*1e3:8.1f} ms/chunk  "
          f"({t*N_CHUNKS:.2f} s bench-total)")
    return stage_candidates(bases, K, HIT_BUFFER, False, seed32, thr)


def bench_membership(staged, lib):
    from fedrann_tpu.kmers.membership import read_hits_staged

    t = _time(lambda s: read_hits_staged(s, lib, K, MAX_HITS), staged)
    print(f"read_hits_staged         {t*1e3:8.1f} ms/chunk  "
          f"({t*N_CHUNKS:.2f} s bench-total)")
    return read_hits_staged(staged, lib, K, MAX_HITS)


def bench_embed(hits, p_ext, p_swapped):
    from fedrann_tpu.project.embed import embed_hits_pair

    t = _time(lambda h: embed_hits_pair(h, p_ext, p_swapped), hits)
    print(f"embed_hits_pair          {t*1e3:8.1f} ms/chunk  "
          f"({t*N_CHUNKS:.2f} s bench-total)")


def bench_fused(staged, codes, p_ext):
    from pallas_embed import (  # bench/pallas_embed.py (bench-only kernel)
        build_q_cat,
        merge_embed,
        prepare_library,
    )

    lib_flat = prepare_library(codes, K)
    q = build_q_cat(p_ext, len(codes), tile=512)
    planes = staged[0]
    t = _time(
        lambda s: merge_embed(s, lib_flat, q, k=K,
                              lib_size=len(codes), tile=512,
                              block_rows=32),
        planes)
    print(f"merge_embed (fused)      {t*1e3:8.1f} ms/chunk  "
          f"({t*N_CHUNKS:.2f} s bench-total)")
    return merge_embed(planes, lib_flat, q, k=K, lib_size=len(codes),
                       tile=512, block_rows=32)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", file=sys.stderr)
    bases = make_bases()

    from fedrann_tpu.kmers.membership import build_library_index
    from fedrann_tpu.oracle import KmerLibrary

    # synthetic sampled library: ~FRACTION of the 4^K code space that would
    # appear; draw codes then keep the sampled ones so the prefilter passes
    rng = np.random.default_rng(1)
    n_lib = 1 << 18
    codes = np.sort(rng.choice(1 << (2 * K), n_lib, replace=False)
                    .astype(np.uint64))
    from fedrann_tpu.oracle import sample_mask
    codes = codes[sample_mask(codes, FRACTION, SEED)]
    print(f"library: {len(codes)} codes", file=sys.stderr)
    lib = build_library_index(codes, K)

    staged = bench_stage(bases) if which in ("stage", "all") else None
    if which == "fused":
        from fedrann_tpu.kmers.membership import stage_candidates
        staged = stage_candidates(
            bases, K, HIT_BUFFER, False, jnp.uint32(SEED),
            jnp.uint32(int(FRACTION * 2**32)))
        p_ext = jnp.asarray(
            np.random.default_rng(2).normal(size=(2 * len(codes) + 1, D))
            .astype(np.float32))
        _, _, nh = bench_fused(staged, codes, p_ext)
        print(f"  mean hits/read: {float(jnp.mean(nh)):.0f}",
              file=sys.stderr)
        return
    if which in ("membership", "embed", "all"):
        if staged is None:
            from fedrann_tpu.kmers.membership import stage_candidates
            staged = stage_candidates(
                bases, K, HIT_BUFFER, False, jnp.uint32(SEED),
                jnp.uint32(int(FRACTION * 2**32)))
        hits, n_hits, _ = bench_membership(staged, lib)
        print(f"  mean hits/read: {float(jnp.mean(n_hits)):.0f}",
              file=sys.stderr)
        if which in ("embed", "all"):
            from fedrann_tpu.project.embed import swap_halves
            p_ext = jnp.asarray(
                np.random.default_rng(2).normal(size=(2 * len(codes) + 1, D))
                .astype(np.float32))
            p_sw = swap_halves(p_ext, len(codes))
            bench_embed(hits, p_ext, p_sw)


if __name__ == "__main__":
    main()
