"""merge_embed (fused Pallas membership+embedding, bench/pallas_embed.py)
vs the XLA twin.

The kernel is BENCH-ONLY (measured slower than the XLA pair it targeted —
see its docstring); these tests keep the measurement artifact honest.
Interpreter mode on the CPU test mesh."""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench"))

from fedrann_tpu import oracle
from fedrann_tpu.io.fastx import FastxRecord
from fedrann_tpu.io.packing import pack_reads
from fedrann_tpu.kmers.membership import (
    build_library_index,
    read_hits_staged,
    stage_candidates,
)
from fedrann_tpu.project.embed import embed_hits_pair, swap_halves
from pallas_embed import (
    build_q_cat,
    merge_embed,
    prepare_library,
)
from fedrann_tpu.sim import simulate_reads


def _setup(k, seed=21, frac=0.3, d=64, genome=6000):
    sim = simulate_reads(genome_length=genome, coverage=5,
                         mean_read_length=700, seed=seed)
    lib = oracle.build_library(sim.sequences, k, 2, frac, seed)
    packed = pack_reads(
        [FastxRecord(n, s) for n, s in zip(sim.names, sim.sequences)],
        length_buckets=(1024,),
    )
    bases = jnp.asarray(packed.buckets[0].bases)
    rng = np.random.default_rng(3)
    p_ext = jnp.asarray(
        rng.normal(size=(2 * lib.size + 1, d)).astype(np.float32))
    p_ext = p_ext.at[-1].set(0.0)
    staged = stage_candidates(
        bases, k, 512, False, jnp.uint32(seed),
        jnp.uint32(int(frac * 2**32)))
    return sim, lib, bases, p_ext, staged


@pytest.mark.parametrize("k", [13, 15, 16])
def test_merge_embed_matches_xla(k):
    sim, lib, bases, p_ext, staged = _setup(k)
    index = build_library_index(lib.codes, k)
    hits, n_hits, _ = read_hits_staged(staged, index, k)
    e_f_ref, e_r_ref = embed_hits_pair(
        hits, p_ext, swap_halves(p_ext, lib.size))

    lib2d = prepare_library(lib.codes, k)
    q = build_q_cat(p_ext, lib.size, tile=128)
    e_f, e_r, nh = merge_embed(
        staged[0], lib2d, q, k=k, lib_size=lib.size,
        tile=128, block_rows=8, interpret=True,
    )
    d = p_ext.shape[1]
    assert np.array_equal(np.asarray(nh), np.asarray(n_hits))
    assert np.allclose(np.asarray(e_f)[:, :d], np.asarray(e_f_ref),
                       rtol=1e-5, atol=1e-4)
    assert np.allclose(np.asarray(e_r)[:, :d], np.asarray(e_r_ref),
                       rtol=1e-5, atol=1e-4)
    # padded columns stay zero
    assert np.all(np.asarray(e_f)[:, d:] == 0)


def test_merge_embed_empty_rows_and_small_lib():
    k = 13
    sim, lib, bases, p_ext, staged = _setup(k, seed=5, frac=0.05,
                                            genome=2000)
    lib2d = prepare_library(lib.codes, k)
    q = build_q_cat(p_ext, lib.size, tile=128)
    e_f, e_r, nh = merge_embed(
        staged[0], lib2d, q, k=k, lib_size=lib.size,
        tile=128, block_rows=8, interpret=True,
    )
    index = build_library_index(lib.codes, k)
    hits, n_hits, _ = read_hits_staged(staged, index, k)
    assert np.array_equal(np.asarray(nh), np.asarray(n_hits))
    # zero-hit rows embed to exact zeros
    zero_rows = np.asarray(n_hits) == 0
    assert np.all(np.asarray(e_f)[zero_rows] == 0)
