"""Reference-artifact interop: load FEDRANN intermediates for golden tests.

The recall metric compares against the reference's outputs; when a
reference run's intermediates are available (--keep-intermediates there),
these loaders let our pipeline consume them directly so embedding-level
parity can be isolated from library-sampling differences (SURVEY.md §7.3
"import reference P" path):

- jellyfish-dump k-mer library FASTA: header `>count`, sequence = k-mer
  (reference count_kmers.py:104-123, parsed by precompute.py:44-55)
- scipy sparse precompute matrix .npz (reference precompute.py:109-115)
"""

from __future__ import annotations

import numpy as np

from fedrann_tpu.io.fastx import read_fastx
from fedrann_tpu.io.packing import encode_bases
from fedrann_tpu.oracle import KmerLibrary, kmer_code


def load_reference_library(fasta_path: str, k: int) -> KmerLibrary:
    """Read a jellyfish-dump-format library (`>count\\nKMER`), returning a
    KmerLibrary sorted by code. K-mers in the file are already canonical
    (jellyfish -C); tokens of the wrong length are skipped, mirroring the
    reference scanner's tolerance (kmer_searcher.cpp:262-273)."""
    codes = []
    counts = []
    for rec in read_fastx(fasta_path):
        seq = rec.sequence
        if len(seq) != k:
            continue
        code = kmer_code(encode_bases(seq), k)
        if len(code) != 1 or code[0] == np.uint64(0xFFFFFFFFFFFFFFFF):
            continue
        codes.append(code[0])
        try:
            counts.append(int(rec.name))
        except ValueError:
            counts.append(1)
    codes_arr = np.asarray(codes, dtype=np.uint64)
    counts_arr = np.asarray(counts, dtype=np.int64)
    order = np.argsort(codes_arr, kind="stable")
    codes_arr, counts_arr = codes_arr[order], counts_arr[order]
    # de-duplicate (palindrome/cross-listing tolerance, SURVEY.md §2.5.3)
    if len(codes_arr):
        keep = np.concatenate([[True], codes_arr[1:] != codes_arr[:-1]])
        codes_arr, counts_arr = codes_arr[keep], counts_arr[keep]
    return KmerLibrary(codes=codes_arr, counts=counts_arr)


def load_reference_precompute(npz_path: str) -> np.ndarray:
    """Load a scipy-sparse CSR .npz of the reference precompute matrix
    P (n_features, n_components) as dense float32 with the trailing zero
    sentinel row appended (our embed_hits contract)."""
    import scipy.sparse as sp

    p = sp.load_npz(npz_path).toarray().astype(np.float32)
    return np.concatenate([p, np.zeros((1, p.shape[1]), np.float32)])
