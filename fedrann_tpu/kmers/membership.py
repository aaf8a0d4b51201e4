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
from fedrann_tpu.ops import compact_rows


def library_device_words(lib_codes_u64: np.ndarray, k: int) -> tuple[jax.Array, ...]:
    """Host uint64 library codes -> device uint32 word planes for read_hits."""
    return tuple(jnp.asarray(w) for w in u64_to_words(lib_codes_u64, k))


def _code_prefix(words: tuple, k: int, bits: int) -> jax.Array:
    """Top `bits` bits of the 2k-bit code as uint32 (monotone in code order)."""
    shift = max(2 * k, bits) - bits
    if len(words) == 1:
        return (words[0] >> jnp.uint32(shift)) & jnp.uint32((1 << bits) - 1)
    hi, lo = words
    if shift >= 32:
        out = hi >> jnp.uint32(shift - 32)
    else:
        # shift < 32: prefix straddles the word boundary
        out = (hi << jnp.uint32(32 - shift)) | (lo >> jnp.uint32(shift))
    # mask so the all-ones invalid-window sentinel wraps into a valid bucket
    # (it can never compare equal to a library code, so found stays False)
    return out & jnp.uint32((1 << bits) - 1)


class LibraryIndex:
    """Two-level membership index: a dense prefix table (start offset of
    every `bits`-bit code prefix in the sorted library) plus the word planes.
    Lookup = one table gather + `steps` binary-search refinements — ~5x
    fewer passes over HBM than a from-scratch binary search, because the
    prefix gather lands each query in a tiny bucket."""

    def __init__(self, words: tuple, table: jax.Array, k: int, bits: int,
                 steps: int):
        self.words = words
        self.table = table
        self.k = k
        self.bits = bits
        self.steps = steps


def build_library_index(lib_codes_u64: np.ndarray, k: int,
                        bits: int | None = None) -> LibraryIndex:
    """Build the device index for a sorted host library."""
    words = library_device_words(lib_codes_u64, k)
    size = len(lib_codes_u64)
    if bits is None:
        # ~2 entries per bucket on average, capped at a 4M-entry table
        bits = min(22, max(8, int(size).bit_length()))
    bits = min(bits, 2 * k)
    lib_prefix = _code_prefix(words, k, bits)
    table = jnp.searchsorted(
        lib_prefix, jnp.arange((1 << bits) + 1, dtype=jnp.uint32)
    ).astype(jnp.int32)
    max_bucket = int(jnp.max(table[1:] - table[:-1])) if size else 0
    steps = max(1, int(max_bucket).bit_length())
    return LibraryIndex(words, table, k, bits, steps)


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


def _table_lookup(lib_words: tuple, table: jax.Array, canon: tuple,
                  k: int, bits: int, steps: int) -> jax.Array:
    """Prefix-table gather + fixed-step in-bucket binary search."""
    lib_size = lib_words[0].shape[0]
    q_prefix = _code_prefix(canon, k, bits)
    lo = table[q_prefix]
    hi = table[q_prefix + jnp.uint32(1)]
    for _ in range(steps):
        active = lo < hi
        mid = jnp.clip((lo + hi) >> 1, 0, lib_size - 1)
        mid_words = tuple(w[mid] for w in lib_words)
        less = words_less(mid_words, canon) & active
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where((~less) & active, mid, hi)
    return lo


def _hits_from_positions(pos, lib_words, canon, is_fwd, valid, max_hits,
                         hit_buffer):
    """Shared tail: positions -> found/feature indices -> per-read unique
    compacted hit rows (presence-set semantics).

    Hit windows are first compacted (gather-based, ops.compact_rows) into a
    (R, hit_buffer) staging buffer so the per-row dedup sort runs over
    ~sample_fraction of the windows instead of all of them."""
    r, w = valid.shape
    lib_size = lib_words[0].shape[0]
    sentinel = 2 * lib_size
    pos_c = jnp.clip(pos, 0, max(lib_size - 1, 0))
    lib_at = tuple(wd[pos_c] for wd in lib_words)
    found = valid & (pos < lib_size) & words_eq(lib_at, canon)
    feat = jnp.where(
        found,
        jnp.where(is_fwd, pos_c, pos_c + lib_size),
        sentinel,
    ).astype(jnp.int32)

    occ_dropped = jnp.zeros((r,), jnp.int32)
    if hit_buffer < w:
        # stage 1: compact hit occurrences (duplicates included, window
        # order preserved) into the smaller buffer — gather-based (ops.py);
        # the scatter formulation serialized on TPU
        (feat,), _, occ_dropped = compact_rows(
            feat != sentinel, (feat,), hit_buffer, (sentinel,)
        )

    # presence-set semantics: sort row, keep first occurrences
    feat_sorted = jnp.sort(feat, axis=1)
    first = jnp.concatenate(
        [jnp.ones((r, 1), dtype=bool), feat_sorted[:, 1:] != feat_sorted[:, :-1]],
        axis=1,
    )
    uniq = first & (feat_sorted != sentinel)

    (hits,), n_hits, over = compact_rows(
        uniq, (feat_sorted,), max_hits, (sentinel,)
    )
    return hits, n_hits, over + occ_dropped


@functools.partial(jax.jit,
                   static_argnames=("k", "max_hits", "hit_buffer"))
def _read_hits_plain(bases, lib_words, k, max_hits, hit_buffer):
    canon, is_fwd, valid = canonical_window_codes(bases, k)
    if lib_words[0].shape[0] == 0:
        pos = jnp.zeros(valid.shape, dtype=jnp.int32)
        valid = jnp.zeros(valid.shape, dtype=bool)
    else:
        pos = _searchsorted_words(lib_words, canon)
    return _hits_from_positions(pos, lib_words, canon, is_fwd, valid,
                                max_hits, hit_buffer)


@functools.partial(
    jax.jit, static_argnames=("k", "hit_buffer", "keep_all")
)
def stage_candidates(bases, k, hit_buffer, keep_all, seed32, threshold):
    """Shared candidate-extraction stage: canonical windows + sampling-hash
    filter + per-read compaction, computed ONCE and consumed by both the
    count and the embed stages (they each re-derived it before).

    Returns (staged_words (R, hit_buffer) uint32 tuple — all-ones sentinel
    padding, is_fwd (R, hit_buffer) bool, n_dropped (R,) int32 candidate
    occurrences beyond the buffer)."""
    from fedrann_tpu.kmers.codec import sample_hash32

    canon, is_fwd, valid = canonical_window_codes(bases, k)
    r, w = valid.shape
    if keep_all:
        cand = valid
    else:
        cand = valid & (sample_hash32(canon, seed32) < threshold)
    if hit_buffer >= w:
        sent = tuple(
            jnp.where(cand, wd, jnp.uint32(0xFFFFFFFF)) for wd in canon
        )
        return sent, is_fwd, jnp.zeros((r,), jnp.int32)
    # gather-based compaction (ops.py) — the scatter formulation serialized
    # on TPU (~75M updates/s); this is the round-1 bench's top hotspot
    outs, _, n_over = compact_rows(
        cand, (*canon, is_fwd), hit_buffer,
        (*(jnp.uint32(0xFFFFFFFF),) * len(canon), False),
    )
    return outs[:-1], outs[-1], n_over


@functools.partial(
    jax.jit, static_argnames=("k", "max_hits", "bits", "steps")
)
def _read_hits_staged(staged_words, staged_fwd, lib_words, table, k,
                      max_hits, bits, steps):
    """Membership over pre-staged candidates (stage_candidates output)."""
    valid = staged_words[0] != jnp.uint32(0xFFFFFFFF)
    pos = _table_lookup(lib_words, table, staged_words, k, bits, steps)
    return _hits_from_positions(
        pos, lib_words, staged_words, staged_fwd, valid, max_hits,
        staged_words[0].shape[1],
    )


def read_hits_staged(staged, lib: "LibraryIndex", k: int, max_hits: int):
    """Forward-scan feature rows from staged candidates; staged is the
    (words, is_fwd, dropped) triple from stage_candidates. The output width
    is capped by the staged width (unique hits cannot exceed candidate
    occurrences), keeping downstream embedding gathers tight."""
    staged_words, staged_fwd, pre_dropped = staged
    max_hits = min(max_hits, staged_words[0].shape[1])
    if lib.words[0].shape[0] == 0:
        r = staged_words[0].shape[0]
        # sentinel for an empty library is 2*0 = 0; rows embed as zeros
        return (jnp.zeros((r, max_hits), jnp.int32),
                jnp.zeros((r,), jnp.int32), pre_dropped)
    hits, n_hits, dropped = _read_hits_staged(
        staged_words, staged_fwd, lib.words, lib.table, k, max_hits,
        lib.bits, lib.steps,
    )
    return hits, n_hits, dropped + pre_dropped


@functools.partial(
    jax.jit,
    static_argnames=("k", "max_hits", "bits", "steps", "hit_buffer",
                     "prefilter"),
)
def _read_hits_indexed(bases, lib_words, table, k, max_hits, bits, steps,
                       hit_buffer, prefilter, seed32, threshold):
    canon, is_fwd, valid = canonical_window_codes(bases, k)
    r, w = valid.shape
    pre_dropped = jnp.zeros((r,), jnp.int32)
    if prefilter and hit_buffer < w:
        # every library code passes the sampling hash (the library was
        # built with the same seed/threshold), so windows that fail it can
        # never hit — compact candidates BEFORE the gather-heavy lookup.
        # Gather volume drops by ~1/sample_fraction.
        from fedrann_tpu.kmers.codec import sample_hash32

        cand = valid & (sample_hash32(canon, seed32) < threshold)
        outs, _, pre_dropped = compact_rows(
            cand, (*canon, is_fwd), hit_buffer,
            (*(jnp.uint32(0xFFFFFFFF),) * len(canon), False),
        )
        canon, is_fwd = outs[:-1], outs[-1]
        # the all-ones sentinel word is unreachable by real canonical codes
        valid = canon[0] != jnp.uint32(0xFFFFFFFF)
    pos = _table_lookup(lib_words, table, canon, k, bits, steps)
    hits, n_hits, dropped = _hits_from_positions(
        pos, lib_words, canon, is_fwd, valid, max_hits, hit_buffer
    )
    return hits, n_hits, dropped + pre_dropped


def read_hits(
    bases: jax.Array,            # (R, L_read) uint8
    lib,                         # word-plane tuple OR LibraryIndex
    k: int,
    max_hits: int,
    hit_buffer: int | None = None,
    sampling: tuple | None = None,
):
    """Forward-scan feature rows for a bucket of reads.

    `lib` is either the uint32 word-plane tuple (plain binary search) or a
    LibraryIndex (prefix-table fast path). `sampling=(seed, fraction)`
    enables the hash prefilter — ONLY valid when the library was sampled
    with exactly that seed/fraction (fedrann_tpu sampling contract); it is
    an exact optimization in that case and wrong otherwise.

    Returns:
      hits      (R, max_hits) int32, sorted ascending, padded with 2L
      n_hits    (R,) int32 number of real entries (<= max_hits)
      n_dropped (R,) int32 distinct hits dropped by the max_hits cap
    """
    w = bases.shape[1] - k + 1
    if hit_buffer is None:
        hit_buffer = w
    hit_buffer = min(w, 1 << (int(hit_buffer) - 1).bit_length())
    if isinstance(lib, LibraryIndex):
        if lib.words[0].shape[0] == 0:
            return _read_hits_plain(bases, lib.words, k, max_hits, hit_buffer)
        prefilter = sampling is not None and sampling[1] < 1.0
        if prefilter:
            seed32 = jnp.uint32(np.uint32(int(sampling[0]) & 0xFFFFFFFF))
            threshold = jnp.uint32(
                min(int(float(sampling[1]) * 2.0**32), 2**32 - 1)
            )
        else:
            seed32 = jnp.uint32(0)
            threshold = jnp.uint32(0)
        return _read_hits_indexed(
            bases, lib.words, lib.table, k, max_hits, lib.bits, lib.steps,
            hit_buffer, prefilter, seed32, threshold,
        )
    return _read_hits_plain(bases, lib, k, max_hits, hit_buffer)


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
