"""Exact brute-force cosine top-k, tiled for the MXU.

Replaces pynndescent (reference nearest_neighbors.py:22-55) with exact
search (SURVEY.md §2.7 "TPU-native equivalent", after TPU-KNN
arxiv 2206.14286): rows are L2-normalized once, the score matrix
Q . C^T is computed in query tiles on the MXU (bf16 inputs, fp32
accumulation by default), and each tile keeps only its top-k, so the full
N x N distance matrix never materializes. Exact search strictly dominates
NNDescent's recall, so parity with the reference is bounded only by
embedding fidelity.

Self-similarity lands at rank 0 with distance ~0, mirroring pynndescent's
neighbor_graph; the output-time self filter stays in the TSV writer
(reference __main__.py:279-280).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def normalize_rows(e: jax.Array) -> jax.Array:
    """L2-normalize rows; zero rows stay zero (their cosine distance to
    everything is then exactly 1)."""
    e = e.astype(jnp.float32)
    norm = jnp.linalg.norm(e, axis=1, keepdims=True)
    return e / jnp.where(norm == 0, 1.0, norm)


@functools.partial(jax.jit, static_argnames=("n_neighbors", "query_tile", "precision"))
def _knn_tiles(en: jax.Array, n_neighbors: int, query_tile: int, precision: str):
    n, _ = en.shape
    pad = (-n) % query_tile
    q = jnp.concatenate([en, jnp.zeros((pad, en.shape[1]), en.dtype)]) if pad else en
    cand = en.astype(jnp.bfloat16) if precision == "bf16" else en
    tiles = q.reshape(-1, query_tile, en.shape[1])

    def per_tile(tile):
        tq = tile.astype(cand.dtype)
        scores = jax.lax.dot_general(
            tq, cand,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        top_scores, top_idx = jax.lax.top_k(scores, n_neighbors)
        return top_scores, top_idx.astype(jnp.int32)

    scores, idx = jax.lax.map(per_tile, tiles)
    scores = scores.reshape(-1, n_neighbors)[:n]
    idx = idx.reshape(-1, n_neighbors)[:n]
    return 1.0 - scores, idx


def knn_exact(
    embeddings: jax.Array,
    n_neighbors: int,
    query_tile: int = 1024,
    precision: str = "bf16",
) -> tuple[np.ndarray, np.ndarray]:
    """(N, d) embeddings -> (indices (N, k) int32, distances (N, k) float32),
    sorted ascending by distance, k = min(n_neighbors, N)."""
    n = embeddings.shape[0]
    k = min(n_neighbors, n)
    en = normalize_rows(jnp.asarray(embeddings))
    dist, idx = _knn_tiles(en, k, min(query_tile, max(8, n)), precision)
    return np.asarray(idx), np.asarray(dist)
