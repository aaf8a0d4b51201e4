"""Canonical k-mer counting: device sort + host run-length merge.

Replaces jellyfish count -C / dump -L (reference count_kmers.py:80-123).
Strategy (SURVEY.md §7.1): deterministic sort-based counting — all valid
canonical window codes are sorted on device (invalid windows carry the
all-ones sentinel and sort to the top, where they are cut off), then unique
codes and multiplicities fall out of one vectorized boundary pass. Chunked:
each device batch yields a sorted (codes, counts) run; runs are merged
host-side (the unique-code stream is orders of magnitude smaller than the
window stream).

Codes are uint32 word tuples on device (see codec.py — 64-bit emulation is
a compile-time disaster on TPU); single-word sorts use jnp.sort, two-word
sorts use jax.lax.sort with num_keys=2 (lexicographic). Host-side the words
recombine into uint64.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fedrann_tpu.kmers.codec import canonical_window_codes, words_to_u64

_SENTINEL_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


@jax.jit
def _sort_words(words):
    flat = tuple(w.ravel() for w in words)
    if len(flat) == 1:
        return (jnp.sort(flat[0]),)
    return tuple(jax.lax.sort(flat, num_keys=2))


def _runlength(sorted_codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unique codes + counts of a sorted array (vectorized host pass)."""
    if len(sorted_codes) == 0:
        return sorted_codes, np.zeros(0, dtype=np.int64)
    boundary = np.empty(len(sorted_codes), dtype=bool)
    boundary[0] = True
    np.not_equal(sorted_codes[1:], sorted_codes[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    counts = np.diff(np.append(starts, len(sorted_codes)))
    return sorted_codes[starts], counts.astype(np.int64)


def count_canonical_kmers(
    base_batches: Iterable[np.ndarray] | Sequence[np.ndarray],
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Count canonical k-mers over an iterable of (R, L) uint8 base batches.

    Returns (codes, counts): sorted unique uint64 canonical codes and int64
    multiplicities, merged across batches.
    """
    partial_codes: list[np.ndarray] = []
    partial_counts: list[np.ndarray] = []
    for bases in base_batches:
        canon, _, _ = canonical_window_codes(jnp.asarray(bases), k)
        sorted_words = _sort_words(canon)
        flat = words_to_u64(tuple(np.asarray(w) for w in sorted_words))
        # cut the all-ones invalid-window sentinel block off the top
        if k <= 16:
            limit = np.uint64(0xFFFFFFFF)
        else:
            limit = _SENTINEL_U64
        n_valid = int(np.searchsorted(flat, limit))
        codes, counts = _runlength(flat[:n_valid])
        if len(codes):
            partial_codes.append(codes)
            partial_counts.append(counts)

    if not partial_codes:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    if len(partial_codes) == 1:
        return partial_codes[0], partial_counts[0]

    # merge runs: re-sort the concatenated unique streams, segment-sum counts
    all_codes = np.concatenate(partial_codes)
    all_counts = np.concatenate(partial_counts)
    order = np.argsort(all_codes, kind="stable")
    all_codes, all_counts = all_codes[order], all_counts[order]
    uniq, _ = _runlength(all_codes)
    boundary = np.empty(len(all_codes), dtype=bool)
    boundary[0] = True
    np.not_equal(all_codes[1:], all_codes[:-1], out=boundary[1:])
    seg_id = np.cumsum(boundary) - 1
    merged = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(merged, seg_id, all_counts)
    return uniq, merged
