"""FEDRANN-TPU: a TPU-native read-overlap detection engine.

Reimplements the capabilities of the FEDRANN pipeline (reference:
/root/reference, v0.5.4 — Feature Extraction, Dimensionality Reduction,
Approximate Nearest Neighbor search for long-read overlap candidates) as a
single JAX/XLA/Pallas framework:

- k-mer counting/sampling/membership on-device (replaces jellyfish + awk +
  seqkit + the C++ kmer_searcher; reference fedrann/count_kmers.py,
  kmer_searcher/kmer_searcher.cpp),
- sparse-random-projection x ICF embedding as device matmuls (reference
  fedrann/precompute.py, fedrann/feature_extraction.py),
- exact tiled brute-force cosine top-k on the MXU with sharded/ring variants
  over a jax.sharding.Mesh (replaces pynndescent; reference
  fedrann/nearest_neighbors.py),
- the same CLI surface and overlaps.tsv output contract (reference
  fedrann/__main__.py).
"""

import os as _os

# This platform's VMs fault in fresh pages at ~30 MB/s (measured: first
# touch of a 64 MB numpy buffer costs 2.4 s; the same buffer reused costs
# 2 ms). glibc returns every >128 KB free back to the OS (mmap threshold),
# so each large numpy/XLA host allocation re-faults from scratch — one
# 8 MB chunk pad cost ~1 s PER PIPELINE RUN. Raising the mmap threshold
# keeps big buffers on the reusable brk heap: only the process's
# high-water mark is ever faulted once.
try:
    import ctypes as _ctypes

    _libc = _ctypes.CDLL("libc.so.6", use_errno=True)
    _libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
    _libc.mallopt(-4, 0)        # M_MMAP_MAX: never mmap, always reuse heap
except OSError:  # non-glibc platforms: skip
    pass

import jax as _jax

# k-mer codes for k <= 31 need up to 62 bits; enable 64-bit types once,
# package-wide. All float compute paths request explicit float32/bfloat16.
_jax.config.update("jax_enable_x64", True)

# Compilation dominates wall-clock on remote-compile TPU platforms; cache
# compiled executables across processes. Override/disable with
# FEDRANN_TPU_COMPILE_CACHE (empty string disables).
_cache_dir = _os.environ.get(
    "FEDRANN_TPU_COMPILE_CACHE",
    _os.path.expanduser("~/.cache/fedrann_tpu/jax_compile"),
)
if _cache_dir:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

__version__ = "0.1.0"
__description__ = (
    "TPU-native long-read overlap detection via k-mer features, "
    "random-projection embeddings, and exact cosine k-NN."
)
