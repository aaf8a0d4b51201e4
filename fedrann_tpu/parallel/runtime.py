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


def process_quota(n_reads: int, num_processes: int,
                  row_multiple: int = 1) -> int:
    """The uniform per-process read quota `per`.

    row_multiple: round the quota up so 2*per embedding rows divide evenly
    over that many local devices (the device-resident multi-host k-NN
    shards each process's 2*per-row block across its local devices —
    knn_exact_sharded_multihost). Interior processes stay full, so global
    embedding row 2g still belongs to read g and every padding row sits at
    the global tail (>= 2*n_reads)."""
    per = -(-n_reads // num_processes)
    if row_multiple > 1:
        # smallest increment keeping 2*per % row_multiple == 0
        half = (row_multiple // 2 if row_multiple % 2 == 0
                else row_multiple)
        per = -(-per // half) * half
    return per


def host_read_range(n_reads: int, process_id: int, num_processes: int,
                    row_multiple: int = 1) -> tuple[int, int]:
    """Contiguous read range owned by a process (balanced to +-1); see
    process_quota for the row_multiple rounding."""
    per = process_quota(n_reads, num_processes, row_multiple)
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


def allgather_library(local: KmerLibrary, min_multiplicity: int
                      ) -> KmerLibrary:
    """Exchange per-host shard libraries (built with min_multiplicity=1)
    over DCN and apply the global threshold. Single-process: identity plus
    threshold. Multi-process: one small all-gather — the library is the
    only k-mer artifact that ever crosses hosts."""
    import jax

    if jax.process_count() == 1:
        return partition_counts_threshold([local], min_multiplicity)

    from jax.experimental import multihost_utils

    # pad to a common static size (max over hosts) for the collective
    sizes = multihost_utils.process_allgather(
        np.asarray([local.size], np.int64)
    ).ravel()
    cap = int(sizes.max())
    codes = np.zeros(cap, np.uint64)
    counts = np.zeros(cap, np.int64)
    codes[: local.size] = local.codes
    counts[: local.size] = local.counts
    all_codes = multihost_utils.process_allgather(codes)
    all_counts = multihost_utils.process_allgather(counts)
    shards = [
        KmerLibrary(codes=all_codes[i, : int(sizes[i])],
                    counts=all_counts[i, : int(sizes[i])])
        for i in range(len(sizes))
    ]
    return partition_counts_threshold(shards, min_multiplicity)


def run_pipeline_multihost(config):
    """Multi-host driver (launch one process per host with
    JAX_COORDINATOR_ADDRESS / --num-processes set; single-process
    invocation degrades to run_pipeline exactly).

    Per process: parse the shared input, keep the process's read range,
    stage candidates and build the local library shard (min_multiplicity 1),
    exchange shards once (allgather_library — the only k-mer artifact that
    crosses hosts), derive the identical projection from the seed, embed
    the local rows, then search the local queries against the
    all-gathered global embedding matrix and write
    overlaps.rank<k>.tsv. Rank ordering of global embedding rows is
    (process read ranges are contiguous): row 2g / 2g+1 for global read g.

    The all-gather k-NN is the correctness-first DCN path; the
    ring-over-global-mesh variant (knn/ring.py, validated on virtual
    meshes) is the ICI-optimal drop-in once a pod launcher is attached.
    """
    import jax

    # distributed init MUST precede the first backend touch; importing the
    # pipeline modules creates device constants (kmers/codec.py), so those
    # imports come after
    pid, nproc = initialize_distributed(
        coordinator_address=getattr(config, "coordinator", None),
        num_processes=getattr(config, "num_processes", None),
        process_id=getattr(config, "process_id", None),
    )
    import jax.numpy as jnp

    from fedrann_tpu.pipeline import run_pipeline

    if nproc == 1:
        return run_pipeline(config)

    import os

    from jax.experimental import multihost_utils

    from fedrann_tpu.io import native as native_io
    from fedrann_tpu.io.fastx import read_fastx
    from fedrann_tpu.io.packing import PackedReads, pack_reads
    from fedrann_tpu.io.tsv import write_overlaps_path
    from fedrann_tpu.knn.topk import normalize_rows
    from fedrann_tpu.pipeline import _stage_chunks, compute_embeddings
    from fedrann_tpu.kmers.library_device import build_library_on_device
    from fedrann_tpu.project.srp import build_precompute

    # every process parses the shared input (names must be global)
    if native_io.native_available():
        packed_all = native_io.pack_reads_native(
            config.input_path, config.length_buckets
        )
    else:
        packed_all = pack_reads(
            read_fastx(config.input_path), config.length_buckets
        )
    n_reads = packed_all.n_reads
    # quota rounded so each process's 2*per-row embedding block divides
    # over its local devices (the device-resident k-NN shards it there)
    row_multiple = jax.local_device_count()
    start, end = host_read_range(n_reads, pid, nproc, row_multiple)

    # rebuild a local PackedReads over [start, end) with LOCAL indices;
    # names stay global for the output table
    local_names = packed_all.names[start:end]
    local = PackedReads(names=local_names, buckets=[])
    import numpy as _np

    for b in packed_all.buckets:
        mask = (b.read_index >= start) & (b.read_index < end)
        if not mask.any():
            continue
        rows = _np.flatnonzero(mask)
        pad = -(-len(rows) // 8) * 8
        idx = _np.full(pad, -1, dtype=_np.int32)
        idx[: len(rows)] = b.read_index[rows] - start
        lengths = _np.zeros(pad, dtype=_np.int32)
        lengths[: len(rows)] = b.lengths[rows]
        from fedrann_tpu.io.packing import PackedBucket

        if b.bases is None:
            # bit-packed bucket (pack_reads_native bit_packed=True): slice
            # the packed planes; zero-padded rows decode as invalid
            pk = _np.zeros((pad, b.packed_bases.shape[1]), dtype=_np.uint8)
            pk[: len(rows)] = b.packed_bases[rows]
            vd = _np.zeros((pad, b.valid_bits.shape[1]), dtype=_np.uint8)
            vd[: len(rows)] = b.valid_bits[rows]
            local.buckets.append(PackedBucket(
                bases=None, lengths=lengths, read_index=idx,
                packed_bases=pk, valid_bits=vd, length=b.length,
            ))
            continue
        bases = _np.full((pad, b.bases.shape[1]), 4, dtype=_np.uint8)
        bases[: len(rows)] = b.bases[rows]
        local.buckets.append(
            PackedBucket(bases=bases, lengths=lengths, read_index=idx,
                         length=b.bases.shape[1])
        )

    staged = _stage_chunks(local, config)
    # local shard with min_multiplicity=1 so thinly-spread k-mers survive;
    # the global threshold applies after the count merge
    from fedrann_tpu.kmers.membership import staged_codes

    shard_lib = build_library_on_device(
        [staged_codes(s[0], config.kmer_size) for s, _ in staged],
        config.kmer_size, 1,
        config.kmer_sample_fraction, config.seed,
        presampled=config.kmer_sample_fraction < 1.0,
    )
    library = allgather_library(shard_lib, config.kmer_min_multiplicity)
    logger.info("[rank %d] global library: %d k-mers", pid, library.size)

    p_dtype = (jnp.float32 if config.projection_dtype == "f32"
               else jnp.bfloat16)
    p_ext = build_precompute(
        jnp.asarray(library.counts), config.embedding_dimension,
        config.projection_seed, config.projection_density, dtype=p_dtype,
    )
    emb_local, _ = compute_embeddings(local, library, config, p_ext, staged)
    # embed was the last consumer: release the table before the k-NN
    # allocates (same HBM-headroom reasoning as run_pipeline)
    del p_ext

    per = process_quota(n_reads, nproc, row_multiple)

    dcn_strategy = os.environ.get(
        "FEDRANN_TPU_MULTIHOST_KNN", config.knn_shard_strategy
    )
    if dcn_strategy == "host":
        # host-gather fallback: all-gather embeddings to every host, then a
        # tiled local-queries x global-candidates top-k. O(N x d) host
        # memory and one full-matrix DCN exchange — keep only for
        # debugging / heterogeneous-device launches.
        block = np.zeros((2 * per, emb_local.shape[1]), np.float32)
        block[: emb_local.shape[0]] = np.asarray(emb_local)
        gathered = multihost_utils.process_allgather(block)
        emb_global = gathered.reshape(-1, emb_local.shape[1])
        # per-range padding rows form a contiguous global tail
        emb_global = emb_global[: 2 * n_reads]

        from fedrann_tpu.knn.topk import knn_exact_block

        en = normalize_rows(jnp.asarray(emb_global))
        idx, dist = knn_exact_block(
            en[2 * start : 2 * end], en, config.n_neighbors,
            query_tile=config.knn_query_tile,
            candidate_tile=config.knn_candidate_tile,
            precision=config.knn_precision,
            method=config.knn_topk_method,
            transfer=config.knn_transfer,
        )
        idx, dist = np.asarray(idx), np.asarray(dist)
    else:
        # device-resident global-mesh search (the default): each process
        # feeds its local rows into ONE globally-sharded array; candidate
        # blocks ride ppermute (ring) or one all_gather across ICI/DCN —
        # embeddings never round-trip through the hosts
        from fedrann_tpu.knn.ring import knn_exact_sharded_multihost

        idx, dist = knn_exact_sharded_multihost(
            np.asarray(emb_local), n_reads, per, config.n_neighbors,
            strategy=dcn_strategy, precision=config.knn_precision,
            transfer=config.knn_transfer,
        )
    k_nn = idx.shape[1]

    out_path = None
    if config.output_dir:
        os.makedirs(config.output_dir, exist_ok=True)
        out_path = os.path.join(config.output_dir, f"overlaps.rank{pid}.tsv")
        # query rows are global rows [2*start, 2*end). The writer indexes
        # query names by absolute row; foreign ranks' rows are filled with
        # their own row index so the self-filter drops them (zero output
        # rows) instead of writing garbage targets.
        self_rows = np.arange(2 * n_reads, dtype=np.int64)[:, None]
        full_idx = np.broadcast_to(self_rows, (2 * n_reads, k_nn)).copy()
        full_dist = np.zeros((2 * n_reads, k_nn), np.float32)
        full_idx[2 * start : 2 * end] = idx
        full_dist[2 * start : 2 * end] = dist
        write_overlaps_path(out_path, packed_all.names, full_idx, full_dist)
    return library, emb_local, idx, dist, out_path
