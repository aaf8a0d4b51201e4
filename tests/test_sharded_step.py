"""Fully-sharded fused step (8-device CPU mesh) vs the single-device
pipeline stages."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedrann_tpu import oracle
from fedrann_tpu.io.fastx import FastxRecord
from fedrann_tpu.io.packing import pack_reads
from fedrann_tpu.knn.topk import knn_exact
from fedrann_tpu.parallel.mesh import make_mesh
from fedrann_tpu.parallel.step import make_sharded_step, shard_step_inputs
from fedrann_tpu.project.srp import build_precompute_paired
from fedrann_tpu.sim import simulate_reads


@pytest.mark.parametrize("k,precision,dist_atol,min_agree", [
    (13, "fp32", 2e-4, 0.95),
    # two-word codec (k > 16) + bf16 scores: the production chr1/D. mel
    # configuration (VERDICT r1 weak 8 — one config was not enough)
    (21, "bf16", 2e-2, 0.90),
])
def test_sharded_step_matches_single_device(k, precision, dist_atol,
                                            min_agree):
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    sim = simulate_reads(genome_length=10000, coverage=5,
                         mean_read_length=1000, seed=81)
    frac, seed = 0.3, 44
    lib = oracle.build_library(sim.sequences, k, 2, frac, seed)
    packed = pack_reads(
        [FastxRecord(n, s) for n, s in zip(sim.names, sim.sequences)],
        length_buckets=(2048,), pad_rows_to=8,
    )
    bucket = packed.buckets[0]
    # rows already padded to a multiple of 8 == mesh size
    bases = jnp.asarray(bucket.bases)
    p_pair = build_precompute_paired(jnp.asarray(lib.counts), 64, 2094)

    args, index = shard_step_inputs(mesh, bases, lib.codes, k, p_pair)
    step = make_sharded_step(
        mesh, k=k, max_hits=1024, n_neighbors=6, precision=precision,
        strategy="ring", bits=index.bits, steps=index.steps,
        table_packed=index.packed,
        sampling=(seed, frac),
    )
    dist_s, idx_s = step(*args)
    dist_s, idx_s = np.asarray(dist_s), np.asarray(idx_s)

    # single-device reference: same hit rows -> embeddings -> exact knn
    rows = oracle.feature_rows(
        [sim.sequences[i] if i >= 0 else "" for i in bucket.read_index],
        k, lib,
    )
    emb = oracle.embed(rows, lib, 64, 2094)
    idx_1, dist_1 = knn_exact(jnp.asarray(emb), 6, precision="fp32")

    assert dist_s.shape == dist_1.shape
    assert np.allclose(dist_s, dist_1, atol=dist_atol)
    # index agreement only where neighbors are distance-resolved: padding
    # reads embed as zero rows whose distance to everything is exactly 1,
    # so rank order among them is an arbitrary tie-break
    real_rows = np.asarray([
        2 * i + o for i, r in enumerate(bucket.read_index) if r >= 0
        for o in (0, 1)
    ])
    agrees = []
    for q in real_rows:
        resolved = dist_1[q] < 0.99
        if resolved.sum() == 0:
            continue
        agrees.append(
            len(set(idx_s[q][resolved]) & set(idx_1[q][resolved]))
            / int(resolved.sum())
        )
    assert np.mean(agrees) > min_agree, np.mean(agrees)


def test_sharded_step_masks_padding_rows():
    """With n_reads set, host-side padding rows must never enter a real
    read's top-k (their indices would be out of range for the TSV writers
    — ADVICE r1 medium)."""
    mesh = make_mesh()
    sim = simulate_reads(genome_length=8000, coverage=5,
                         mean_read_length=1000, seed=82)
    k, frac, seed = 13, 0.5, 45
    lib = oracle.build_library(sim.sequences, k, 2, frac, seed)
    # keep only 2 reads per device shard, pad the rest
    n_real = 11
    packed = pack_reads(
        [FastxRecord(n, s) for n, s in
         zip(sim.names[:n_real], sim.sequences[:n_real])],
        length_buckets=(2048,), pad_rows_to=16,
    )
    bucket = packed.buckets[0]
    assert (bucket.read_index >= 0).sum() == n_real
    assert bucket.bases.shape[0] == 16
    bases = jnp.asarray(bucket.bases)
    p_pair = build_precompute_paired(jnp.asarray(lib.counts), 64, 2094)
    args, index = shard_step_inputs(mesh, bases, lib.codes, k, p_pair)
    n_nb = 8
    step = make_sharded_step(
        mesh, k=k, max_hits=1024, n_neighbors=n_nb, precision="fp32",
        strategy="ring", bits=index.bits, steps=index.steps,
        table_packed=index.packed,
        sampling=(seed, frac), n_reads=n_real,
    )
    dist_s, idx_s = step(*args)
    dist_s, idx_s = np.asarray(dist_s), np.asarray(idx_s)
    real = idx_s[: 2 * n_real]
    # every real row's neighbor list stays inside the real rows
    assert real.max() < 2 * n_real
    assert not np.any(np.isinf(dist_s[: 2 * n_real]))
    # allgather strategy agrees
    step_ag = make_sharded_step(
        mesh, k=k, max_hits=1024, n_neighbors=n_nb, precision="fp32",
        strategy="allgather", bits=index.bits, steps=index.steps,
        table_packed=index.packed,
        sampling=(seed, frac), n_reads=n_real,
    )
    _, idx_ag = step_ag(*args)
    assert np.asarray(idx_ag)[: 2 * n_real].max() < 2 * n_real
