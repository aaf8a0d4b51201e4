"""Per-read library membership: window codes -> padded unique feature rows.

TPU-native replacement for the reference's hash-probe hot loop
(kmer_searcher.cpp:308-349): the sampled library is a sorted vector of
uint32 code words, membership is a vectorized binary search, and the
per-read presence *set* (robin_hood::unordered_set there) becomes
sort + first-occurrence mask + scatter-compaction into a fixed-width
(R, max_hits) index matrix.

Feature index contract (SURVEY.md §2.5, made deterministic):
  f in [0, L)     read-strand k-mer == canonical library code ("forward half")
  f in [L, 2L)    read-strand k-mer was the reverse complement
  sentinel = 2L   padding / miss (maps to an all-zero projection row)
The reverse-complement row of a read is pure index arithmetic
(mirror_hits), exactly the reference's i <-> i+L flip
(feature_extraction.py:137-140) without a second scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fedrann_tpu.kmers.codec import (
    canonical_window_codes,
    u64_to_words,
    words_eq,
    words_less,
)


def library_device_words(lib_codes_u64: np.ndarray, k: int) -> tuple[jax.Array, ...]:
    """Host uint64 library codes -> device uint32 word planes for read_hits."""
    return tuple(jnp.asarray(w) for w in u64_to_words(lib_codes_u64, k))


def _searchsorted_words(lib_words: tuple, q_words: tuple) -> jax.Array:
    """Lower-bound index of each query in the lexicographically sorted
    word-tuple library. Single-word: native searchsorted; two-word: fixed
    log2(L)-step vectorized binary search."""
    lib_size = lib_words[0].shape[0]
    if len(lib_words) == 1:
        return jnp.searchsorted(lib_words[0], q_words[0]).astype(jnp.int32)
    lo = jnp.zeros(q_words[0].shape, jnp.int32)
    hi = jnp.full(q_words[0].shape, lib_size, jnp.int32)
    for _ in range(max(1, int(lib_size).bit_length() + 1)):
        active = lo < hi
        mid = jnp.clip((lo + hi) >> 1, 0, lib_size - 1)
        mid_words = tuple(w[mid] for w in lib_words)
        less = words_less(mid_words, q_words) & active
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where((~less) & active, mid, hi)
    return lo


@functools.partial(jax.jit, static_argnames=("k", "max_hits"))
def read_hits(
    bases: jax.Array,            # (R, L_read) uint8
    lib_words: tuple,            # uint32 word planes, sorted lexicographically
    k: int,
    max_hits: int,
):
    """Forward-scan feature rows for a bucket of reads.

    Returns:
      hits      (R, max_hits) int32, sorted ascending, padded with 2L
      n_hits    (R,) int32 number of real entries (<= max_hits)
      n_dropped (R,) int32 distinct hits dropped by the max_hits cap
    """
    r = bases.shape[0]
    lib_size = lib_words[0].shape[0]
    sentinel = 2 * lib_size
    canon, is_fwd, valid = canonical_window_codes(bases, k)

    if lib_size == 0:
        found = jnp.zeros(valid.shape, dtype=bool)
        pos_c = jnp.zeros(valid.shape, dtype=jnp.int32)
    else:
        pos = _searchsorted_words(lib_words, canon)
        pos_c = jnp.clip(pos, 0, lib_size - 1)
        lib_at = tuple(w[pos_c] for w in lib_words)
        found = valid & (pos < lib_size) & words_eq(lib_at, canon)
    feat = jnp.where(
        found,
        jnp.where(is_fwd, pos_c, pos_c + lib_size),
        sentinel,
    ).astype(jnp.int32)

    # presence-set semantics: sort row, keep first occurrences
    feat_sorted = jnp.sort(feat, axis=1)
    first = jnp.concatenate(
        [jnp.ones((r, 1), dtype=bool), feat_sorted[:, 1:] != feat_sorted[:, :-1]],
        axis=1,
    )
    uniq = first & (feat_sorted != sentinel)

    out_pos = jnp.cumsum(uniq, axis=1) - 1
    rows = jax.lax.broadcasted_iota(jnp.int32, feat_sorted.shape, 0)
    target = jnp.where(uniq & (out_pos < max_hits), out_pos, max_hits)
    hits = jnp.full((r, max_hits), sentinel, dtype=jnp.int32)
    hits = hits.at[rows, target].set(feat_sorted, mode="drop")

    n_uniq = jnp.sum(uniq, axis=1).astype(jnp.int32)
    n_hits = jnp.minimum(n_uniq, max_hits)
    return hits, n_hits, n_uniq - n_hits


@functools.partial(jax.jit, static_argnames=("lib_size",))
def mirror_hits(hits: jax.Array, lib_size: int) -> jax.Array:
    """Reverse-complement row via the i <-> i+L index mirror; padding
    (sentinel 2L) is preserved. Output re-sorted ascending."""
    sentinel = 2 * lib_size
    mirrored = jnp.where(
        hits >= sentinel,
        sentinel,
        jnp.where(hits < lib_size, hits + lib_size, hits - lib_size),
    )
    return jnp.sort(mirrored, axis=1)
