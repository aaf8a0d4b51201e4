"""Library construction: multiplicity filter + seeded-hash threshold sampling.

Replaces the reference's jellyfish dump -L <min> | awk 'rand() < p' stream
(count_kmers.py:104-123). The awk stream is order-dependent; the hash
threshold (keep iff sample_hash32(code, seed) < p * 2^32, a murmur3-style
uint32 mix over the code words — see oracle.sample_hash32) is order-free
and deterministic, so every host/chip reconstructs the identical library
with zero communication (SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

import numpy as np

from fedrann_tpu.oracle import KmerLibrary, sample_mask


def build_library_device(
    codes: np.ndarray,
    counts: np.ndarray,
    min_multiplicity: int,
    sample_fraction: float,
    seed: int,
) -> KmerLibrary:
    """Filter counted canonical k-mers and sample the library.

    Input codes must be sorted unique (output of count_canonical_kmers);
    output library codes stay sorted, which membership search relies on.
    Reuses the oracle's sample_mask so device and oracle libraries are
    bitwise identical by construction.
    """
    keep = counts >= min_multiplicity
    codes, counts = codes[keep], counts[keep]
    mask = sample_mask(codes, sample_fraction, seed)
    return KmerLibrary(codes=codes[mask], counts=counts[mask].astype(np.int64))
