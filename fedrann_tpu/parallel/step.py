"""The fully-sharded overlap step: packed bases in, neighbor lists out.

One jitted shard_map program over the "data" mesh axis that fuses stages
3+4 of the pipeline (membership -> embedding -> exact ring top-k). Sharding
layout (SURVEY.md §2.8 TPU analogues):

- read bases: row-sharded (data parallel) — device m owns reads
  [m*B, (m+1)*B), hence embedding rows [2mB, 2(m+1)B) of the global
  fwd/rev-interleaved matrix,
- library codes + precompute matrix: replicated (seed-deterministic),
- candidates: rotated around the ICI ring (ppermute) with a running
  top-k merge per step.

This is also the program dryrun-compiled by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from fedrann_tpu.kmers.membership import mirror_hits, read_hits
from fedrann_tpu.knn.ring import _allgather_body, _ring_body
from fedrann_tpu.knn.topk import normalize_rows
from fedrann_tpu.parallel.mesh import DATA_AXIS


def make_sharded_step(
    mesh,
    k: int,
    max_hits: int,
    n_neighbors: int,
    precision: str = "bf16",
    strategy: str = "ring",
):
    """Build the jitted sharded step.

    Returned fn(bases (R, L) uint8, lib_words (uint32 word-plane tuple, see
    membership.library_device_words), p_ext (2*L_lib+1, d) f32)
    -> (distances (2R, k), indices (2R, k)).
    R must divide by the mesh size (pad with all-INVALID rows host-side).
    """
    n_dev = mesh.devices.size

    from fedrann_tpu.project.embed import embed_hits

    def body(bases_local, lib_words, p_ext):
        lib_size = lib_words[0].shape[0]
        hits, _, _ = read_hits(bases_local, lib_words, k, max_hits)
        e_fwd = embed_hits(hits, p_ext)
        e_rev = embed_hits(mirror_hits(hits, lib_size), p_ext)
        b = e_fwd.shape[0]
        e = jnp.stack([e_fwd, e_rev], axis=1).reshape(2 * b, e_fwd.shape[1])
        en = normalize_rows(e)
        n_real = 2 * b * n_dev
        ring = _ring_body if strategy == "ring" else _allgather_body
        dist, idx = ring(en, n_dev=n_dev, k=n_neighbors, n_real=n_real,
                         precision=precision)
        return dist, idx

    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(), P()),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_rep=False,
    )
    return jax.jit(mapped)


def shard_step_inputs(mesh, bases, lib_words, p_ext):
    """Place inputs with the shardings make_sharded_step expects."""
    return (
        jax.device_put(bases, NamedSharding(mesh, P(DATA_AXIS, None))),
        tuple(jax.device_put(w, NamedSharding(mesh, P())) for w in lib_words),
        jax.device_put(p_ext, NamedSharding(mesh, P())),
    )
