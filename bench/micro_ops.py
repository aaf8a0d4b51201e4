"""Sub-op device microbenchmarks: isolate WHERE inside the hot stages the
time goes (codec math vs cumsum vs take_along_axis gathers vs sort vs
table-lookup gathers vs P-row gathers). Drives kernel-writing decisions.

Run serially on the real chip:  python bench/micro_ops.py
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
W = L - K + 1
HB = 2048          # hit_buffer / staged width
D = 512
LIB = 1 << 19      # library size


def t(name, fn, *args, n=5):
    fn(*args)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:44s} {med*1e3:9.2f} ms")
    return med


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    bases = jnp.asarray(rng.integers(0, 4, (R, L), dtype=np.uint8))
    canon32 = jnp.asarray(rng.integers(0, 1 << 30, (R, L), dtype=np.uint32))
    keep = jnp.asarray(rng.random((R, L)) < 0.05)
    staged = jnp.asarray(rng.integers(0, 1 << 30, (R, HB), dtype=np.uint32))
    feat = jnp.asarray(rng.integers(0, 2 * LIB, (R, HB), dtype=np.int32))
    # generate P on device: a host upload of (2L+1, D) f32 is ~2 GB at the
    # platform's ~20 MB/s H2D — hours, not seconds
    p_ext = jax.random.normal(
        jax.random.PRNGKey(0), (2 * LIB + 1, D), dtype=jnp.float32)
    p_ext.block_until_ready()
    table = jnp.asarray(
        np.sort(rng.integers(0, LIB, (1 << 20) + 1)).astype(np.int32))
    lib_words = (jnp.asarray(
        np.sort(rng.integers(0, 1 << 30, LIB, dtype=np.uint32))),)

    from fedrann_tpu.kmers.codec import canonical_window_codes, sample_hash32
    from fedrann_tpu.ops import compact_rows, lower_bound_rows

    # 1. pure codec
    f = jax.jit(lambda b: canonical_window_codes(b, K))
    t("codec canonical_window_codes (R,L)", f, bases)

    # 2. pallas fused codec
    from pallas_kernels import canonical_and_sample  # bench-only kernel
    f = jax.jit(lambda b: canonical_and_sample(b, K, 602, int(0.05 * 2**32)))
    t("pallas canonical_and_sample (R,L)", f, bases)

    # 3. sampling hash alone
    f = jax.jit(lambda c: sample_hash32((c,), 602))
    t("sample_hash32 (R,L)", f, canon32)

    # 4. cumsum along lanes
    f = jax.jit(lambda m: jnp.cumsum(m, axis=1).astype(jnp.int32))
    t("cumsum bool (R,L)", f, keep)

    # 5. lower_bound_rows (binary search gathers)
    csum = jnp.cumsum(keep, axis=1).astype(jnp.int32)
    tg = jnp.arange(1, HB + 1, dtype=jnp.int32)
    f = jax.jit(lambda c: lower_bound_rows(c, tg))
    t("lower_bound_rows (R,L)->(R,HB)", f, csum)

    # 6. one take_along_axis gather (R,L)->(R,HB)
    idx = jnp.asarray(rng.integers(0, L, (R, HB), dtype=np.int32))
    f = jax.jit(lambda v, i: jnp.take_along_axis(v, i, axis=1))
    t("take_along_axis (R,L)->(R,HB) x1", f, canon32, idx)

    # 7. full compact_rows (2 value planes)
    f = jax.jit(lambda m, c: compact_rows(
        m, (c, m), HB, (jnp.uint32(0xFFFFFFFF), False)))
    t("compact_rows (R,L)->(R,HB) 2 planes", f, keep, canon32)

    # 8. scatter formulation of the same compaction (round-1 path)
    def scatter_compact(m, c):
        occ = jnp.cumsum(m, axis=1) - 1
        tgt = jnp.where(m & (occ < HB), occ, HB)
        rows_w = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
        out = (jnp.full((R, HB), 0xFFFFFFFF, dtype=jnp.uint32)
               .at[rows_w, tgt].set(c, mode="drop"))
        return out
    t("scatter compact (R,L)->(R,HB) 1 plane", jax.jit(scatter_compact),
      keep, canon32)

    # 9. sort of staged width
    f = jax.jit(lambda x: jnp.sort(x, axis=1))
    t("sort u32 (R,HB)", f, staged)
    t("sort i32 (R,HB) feat", f, feat)

    # 10. sort full width
    t("sort u32 (R,L)", f, canon32)

    # 11. table lookup: prefix gather + 2-step refine
    def lookup(c):
        pfx = (c >> jnp.uint32(10))
        lo = table[pfx]
        hi = table[pfx + 1]
        for _ in range(3):
            mid = jnp.clip((lo + hi) >> 1, 0, LIB - 1)
            mw = lib_words[0][mid]
            less = mw < c
            lo = jnp.where(less, mid + 1, lo)
            hi = jnp.where(less, hi, mid)
        return lo
    t("table lookup (R,HB) 3 refine steps", jax.jit(lookup), staged)

    # 12. embed gather: take P rows, (R,HB) indices, sum -> (R,D)
    # (p as an ARGUMENT — a closed-over device array becomes a 2 GB jit
    # constant and stalls lowering)
    def embed(h, p):
        blocks = h.reshape(R, HB // 128, 128).transpose(1, 0, 2)
        def body(acc, blk):
            return acc + jnp.take(p, blk, axis=0).sum(axis=1), None
        acc, _ = jax.lax.scan(body, jnp.zeros((R, D), jnp.float32), blocks)
        return acc
    hitsc = jnp.clip(feat, 0, 2 * LIB)
    t("embed gather scan (R,HB)x(2L+1,D)", jax.jit(embed), hitsc, p_ext)

    # 13. embed via one giant take (no scan)
    def embed2(h, p):
        return jnp.take(p, h, axis=0).sum(axis=1)
    t("embed gather flat take (R,HB,D).sum", jax.jit(embed2), hitsc, p_ext)

    # 14. one-hot matmul MXU alternative at small lib tile:
    # (R, HB) one-hot against 2048-wide feature tile x (2048, D)
    ptile = p_ext[:2048]
    def embed_mxu(h, p):
        oh = jax.nn.one_hot(h % 2048, 2048, dtype=jnp.bfloat16)
        return jnp.einsum("rhf,fd->rd", oh, p.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    t("embed one-hot MXU (R,HB)x2048 tile", jax.jit(embed_mxu), hitsc, ptile)

    # 15. sort PAIRS (key + payload plane) at full width
    def sort_pairs(c, v):
        return jax.lax.sort((c, v), num_keys=1)
    val = jnp.asarray(rng.integers(0, 256, (R, L), dtype=np.uint32))
    t("lax.sort pairs (R,L) key+payload", jax.jit(sort_pairs), canon32, val)

    # 16. 1D sort of chunk-flat candidates + library
    flat = jnp.asarray(
        rng.integers(0, 1 << 30, (R * HB + LIB,), dtype=np.uint32))
    payload = jnp.asarray(
        rng.integers(0, R, (R * HB + LIB,), dtype=np.uint32))
    t("lax.sort 1D 1M key+payload", jax.jit(sort_pairs), flat, payload)

    # 17. XLA searchsorted: 1D library, (R,HB) queries
    def ss(lib, q):
        return jnp.searchsorted(lib, q).astype(jnp.int32)
    t("searchsorted lib(512k) x (R,HB)", jax.jit(ss), lib_words[0], staged)

    # 18. associative scans at (R,L) and 1D-1M (the sort-join building block)
    t("cummax u32 (R,L)", jax.jit(
        lambda x: jax.lax.cummax(x, axis=1)), canon32)
    t("cumsum 1D 1M", jax.jit(
        lambda x: jnp.cumsum(x)), payload)


if __name__ == "__main__":
    main()
