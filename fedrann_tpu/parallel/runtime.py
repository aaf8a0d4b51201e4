"""Multi-host runtime: jax.distributed + per-host input partitioning.

The reference is strictly single-node (SURVEY.md §2.8); this module defines
the multi-host story for pod-scale runs:

- `initialize_distributed` wraps jax.distributed.initialize (coordinator
  discovery via env or explicit args). After it, jax.devices() spans the
  slice and a Mesh over all devices routes collectives over ICI
  (intra-slice) / DCN (inter-slice) automatically.
- Reads are partitioned by contiguous row ranges per process
  (`host_read_range`): host h owns reads [h*ceil(R/H), ...), hence global
  embedding rows [2*start, 2*end). The k-mer library needs NO communication:
  every host derives the identical sampled library from the seed
  (hash-threshold sampling is order-free, kmers/library_device.py) over its
  shard, then libraries are unioned with one all-gather of the compacted
  (codes, counts) pairs and a host-side merge — still tiny next to the read
  stream.
- The sharded k-NN (knn/ring.py) then runs unchanged over the global mesh:
  each process contributes its local embedding rows, candidate blocks ride
  the ring, and every process ends up with the neighbor lists of its own
  query rows, which it writes to overlaps.<rank>.tsv; rank 0 concatenates.

Single-process behavior is the identity (no initialize needed), so the same
driver script works from a laptop to a pod.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from fedrann_tpu.logging_utils import logger
from fedrann_tpu.oracle import KmerLibrary


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Initialize the JAX distributed runtime if a multi-process launch is
    detected (explicit args or JAX_COORDINATOR_ADDRESS / standard TPU pod
    env). Returns (process_id, num_processes)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address or (num_processes and num_processes > 1):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "distributed runtime: process %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), len(jax.devices()),
        )
    return jax.process_index(), jax.process_count()


def host_read_range(n_reads: int, process_id: int, num_processes: int
                    ) -> tuple[int, int]:
    """Contiguous read range owned by a process (balanced to +-1)."""
    per = -(-n_reads // num_processes)
    start = min(process_id * per, n_reads)
    return start, min(start + per, n_reads)


def merge_library_shards(shards: list[KmerLibrary]) -> KmerLibrary:
    """Union per-host sampled libraries (each built over that host's reads
    with the same seed). A canonical k-mer sampled on any host is sampled on
    every host that sees it (the hash depends only on the code), so the
    union with count-summing reproduces the single-host library whose
    multiplicity filter ran on global counts ONLY when min_multiplicity is
    reached within single hosts; k-mers spread thin across hosts need the
    count merge below, which re-applies the threshold globally."""
    if len(shards) == 1:
        return shards[0]
    codes = np.concatenate([s.codes for s in shards])
    counts = np.concatenate([s.counts for s in shards])
    order = np.argsort(codes, kind="stable")
    codes, counts = codes[order], counts[order]
    boundary = np.concatenate([[True], codes[1:] != codes[:-1]])
    seg = np.cumsum(boundary) - 1
    uniq = codes[boundary]
    merged = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(merged, seg, counts)
    return KmerLibrary(codes=uniq, counts=merged)


def partition_counts_threshold(
    shards: list[KmerLibrary], min_multiplicity: int
) -> KmerLibrary:
    """Global multiplicity filter over per-host PRE-FILTER counts: hosts
    build their shard libraries with min_multiplicity=1 (so thinly-spread
    k-mers survive locally), then this merge sums counts and applies the
    global threshold — bit-identical to a single-host run."""
    merged = merge_library_shards(shards)
    keep = merged.counts >= min_multiplicity
    return KmerLibrary(codes=merged.codes[keep], counts=merged.counts[keep])
