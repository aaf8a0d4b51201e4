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
import math

import jax
import jax.numpy as jnp
import numpy as np


# Cosine distances live in [0, 2]; snapping them to a uint16 grid before
# the device->host copy halves the distance payload (device->host runs at
# ~20 MB/s on tunneled hosts — docs/TPU_PLATFORM_NOTES.md) for a max
# rounding error of 1/(2*32767.5) ~ 1.5e-5, far inside every distance
# tolerance in the output contract (golden-parity MAE threshold 5e-3).
# 2.0 maps to 65535, so the clip only fires on sub-ulp bf16 overshoot.
DIST_SCALE = 32767.5


@jax.jit
def quantize_dist(dist: jax.Array) -> jax.Array:
    q = jnp.round(dist * DIST_SCALE)
    return jnp.clip(q, 0, 65535).astype(jnp.uint16)


def dequantize_dist(dist_np: np.ndarray) -> np.ndarray:
    """Host-side inverse of quantize_dist (grid step 1/DIST_SCALE ~ 3.1e-5,
    max rounding error half that, ~1.5e-5). The single home of the
    1/DIST_SCALE factor (ADVICE r2: it was duplicated in knn/ring.py)."""
    return dist_np.astype(np.float32) * np.float32(1.0 / DIST_SCALE)


def transfer_dist(dist_dev: jax.Array, transfer: str) -> np.ndarray:
    """Device->host copy of a distance matrix, optionally through the
    uint16 wire format."""
    if transfer == "u16":
        return dequantize_dist(np.asarray(quantize_dist(dist_dev)))
    return np.asarray(dist_dev)


@jax.jit
def _idx_u16(idx: jax.Array) -> jax.Array:
    return jnp.clip(idx, 0, 65535).astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("bits", "per", "words"))
def _pack_idx_dev(idx: jax.Array, bits: int, per: int, words: int):
    """(R, k_pad) non-negative ids -> (R, k_pad//per*words) uint32 with
    `bits`-bit fields, LSB-first across each per-id group."""
    r, kp = idx.shape
    g = idx.astype(jnp.uint32).reshape(r, kp // per, per)
    out = [jnp.zeros((r, kp // per), jnp.uint32) for _ in range(words)]
    for j in range(per):
        start = j * bits
        w, s = start // 32, start % 32
        out[w] = out[w] | (g[..., j] << jnp.uint32(s))
        if s + bits > 32:
            out[w + 1] = out[w + 1] | (g[..., j] >> jnp.uint32(32 - s))
    return jnp.stack(out, axis=-1).reshape(r, -1)


def _unpack_idx_np(packed: np.ndarray, k: int, bits: int, per: int,
                   words: int, sentinel: int) -> np.ndarray:
    r = packed.shape[0]
    grp = packed.reshape(r, -1, words).astype(np.uint64)
    ids = np.empty((r, grp.shape[1], per), np.uint32)
    mask = np.uint64((1 << bits) - 1)
    for j in range(per):
        start = j * bits
        w, s = start // 32, start % 32
        v = grp[..., w] >> np.uint64(s)
        if s + bits > 32:
            v |= grp[..., w + 1] << np.uint64(32 - s)
        ids[..., j] = (v & mask).astype(np.uint32)
    flat = ids.reshape(r, -1)[:, :k].astype(np.int32)
    return np.where(flat == sentinel, -1, flat)


def transfer_idx(idx_dev: jax.Array, transfer: str, n_rows: int) -> np.ndarray:
    """Device->host copy of a neighbor-index matrix. transfer='u16' rides
    the smallest exact wire: uint16 when every valid index fits
    (n_rows <= 65536), else 20- or 24-bit packed fields (37.5% / 25%
    less payload than i32 — the copy runs at ~10 MB/s on tunneled hosts
    and is the dominant term of the k-NN stage at the chr1/human rungs;
    docs/TPU_PLATFORM_NOTES.md round 5). The unset marker -1 maps to the
    in-band sentinel n_rows and back, so the result is bit-identical to
    the plain i32 copy."""
    if transfer == "u16" and n_rows <= 65536:
        return np.asarray(_idx_u16(idx_dev)).astype(np.int32)
    if transfer == "u16" and n_rows + 1 < (1 << 24):
        bits = 20 if n_rows + 1 <= (1 << 20) else 24
        per = 32 // math.gcd(bits, 32)
        words = bits * per // 32
        k = idx_dev.shape[1]
        pad = (-k) % per
        idx_s = jnp.where(idx_dev < 0, jnp.int32(n_rows), idx_dev)
        if pad:
            idx_s = jnp.concatenate(
                [idx_s, jnp.full((idx_s.shape[0], pad), n_rows,
                                 idx_s.dtype)], axis=1)
        packed = np.asarray(_pack_idx_dev(idx_s, bits, per, words))
        return _unpack_idx_np(packed, k, bits, per, words, n_rows)
    return np.asarray(idx_dev)


@jax.jit
def normalize_rows(e: jax.Array) -> jax.Array:
    """L2-normalize rows; zero rows stay zero (their cosine distance to
    everything is then exactly 1)."""
    e = e.astype(jnp.float32)
    norm = jnp.linalg.norm(e, axis=1, keepdims=True)
    return e / jnp.where(norm == 0, 1.0, norm)


def _topk_scores(scores, k, method: str):
    """Largest-k selection per row; 'approx' uses the TPU PartialReduce
    approx_max_k (TPU-KNN, arxiv 2206.14286) with a 0.99 per-call recall
    target — at peak MXU throughput the selection, not the matmul, is the
    bottleneck, and approximate selection restores it."""
    if method == "approx" and scores.shape[1] > 4 * k:
        return jax.lax.approx_max_k(scores, k, recall_target=0.99)
    return jax.lax.top_k(scores, k)


@functools.partial(
    jax.jit,
    static_argnames=("n_neighbors", "query_tile", "candidate_tile",
                     "precision", "method"),
)
def _knn_tiles_qc(eq: jax.Array, ec: jax.Array, n_neighbors: int,
                  query_tile: int, candidate_tile: int, precision: str,
                  method: str):
    """Query tiles x candidate blocks with a running top-k over SEPARATE
    query and candidate row sets (the all-vs-all path passes the same
    array twice; the multi-host path searches its local query rows against
    the global candidate matrix). The full (tile, N) score matrix never
    materializes, so the search scales to any N the embeddings fit."""
    nq, d = eq.shape
    n = ec.shape[0]
    pad_q = (-nq) % query_tile
    q = jnp.concatenate([eq, jnp.zeros((pad_q, d), eq.dtype)]) if pad_q else eq
    pad_c = (-n) % candidate_tile
    cand = jnp.concatenate([ec, jnp.zeros((pad_c, d), ec.dtype)]) if pad_c else ec
    cand = cand.astype(jnp.bfloat16) if precision == "bf16" else cand
    n_cand = cand.shape[0]
    n_blocks = n_cand // candidate_tile
    blocks = cand.reshape(n_blocks, candidate_tile, d)
    tiles = q.reshape(-1, query_tile, d)

    def per_tile(tile):
        tq = tile.astype(cand.dtype)

        def scan_block(carry, inp):
            run_scores, run_idx = carry
            block, base = inp
            scores = jax.lax.dot_general(
                tq, block,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cols = base + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1
            )
            scores = jnp.where(cols >= n, -jnp.inf, scores)
            bs, bi = _topk_scores(scores, n_neighbors, method)
            bidx = jnp.take_along_axis(cols, bi.astype(jnp.int32), axis=1)
            merged = jnp.concatenate([run_scores, bs], axis=1)
            merged_idx = jnp.concatenate([run_idx, bidx], axis=1)
            ts, ti = jax.lax.top_k(merged, n_neighbors)
            return (ts, jnp.take_along_axis(merged_idx, ti, axis=1)), None

        init = (
            jnp.full((query_tile, n_neighbors), -jnp.inf, jnp.float32),
            jnp.full((query_tile, n_neighbors), -1, jnp.int32),
        )
        bases = jnp.arange(n_blocks, dtype=jnp.int32) * candidate_tile
        (scores, idx), _ = jax.lax.scan(scan_block, init, (blocks, bases))
        return scores, idx

    scores, idx = jax.lax.map(per_tile, tiles)
    scores = scores.reshape(-1, n_neighbors)[:nq]
    idx = idx.reshape(-1, n_neighbors)[:nq]
    return 1.0 - scores, idx


def _knn_tiles(en, n_neighbors, query_tile, candidate_tile, precision,
               method):
    """All-vs-all wrapper (queries == candidates)."""
    return _knn_tiles_qc(en, en, n_neighbors, query_tile, candidate_tile,
                         precision, method)


def _fit_tile(tile: int, n: int, floor: int = 16384) -> int:
    """Clamp a block size to n, then halve it while the pad-to-multiple
    waste exceeds ~25% of a block (ADVICE r3: n just past a block boundary
    — e.g. 131073 at tile 131072 — nearly doubled the scanned columns;
    halving trades one extra compile for the wasted matmul work)."""
    t = min(tile, max(8, n))
    while t > floor and ((-n) % t) > t // 4:
        t //= 2
    return t


def _fit_stream(stream_rows: int, n: int, query_tile: int) -> int:
    """Even-size the query slabs: ceil(n / n_slabs) rounded up to the query
    tile, so a dataset just past a slab boundary runs two ~half slabs
    instead of one full slab plus one nearly-all-padding slab."""
    n_slabs = -(-n // stream_rows)
    per = -(-n // n_slabs)
    return -(-per // query_tile) * query_tile


def knn_exact(
    embeddings: jax.Array,
    n_neighbors: int,
    query_tile: int = 512,
    candidate_tile: int = 131072,
    precision: str = "bf16",
    method: str = "exact",
    transfer: str = "f32",
    stream_rows: int = 65536,
) -> tuple[np.ndarray, np.ndarray]:
    """(N, d) embeddings -> (indices (N, k) int32, distances (N, k) float32),
    sorted ascending by distance, k = min(n_neighbors, N). method='approx'
    switches block-level selection to approx_max_k (exact final merge);
    transfer='u16' halves the distance device->host payload (quantize_dist).

    The search runs in query SLABS of `stream_rows`: slab i+1's compute is
    dispatched (async) before slab i's results cross to the host, so the
    device->host copy rides under the MXU work instead of after it. This
    also bounds any single transfer to ~stream_rows*k*6 bytes — the chr1
    rung's one-shot 216 MB result copy crashed the tunneled TPU worker
    mid-transfer (bench/results notes, round 3)."""
    n = embeddings.shape[0]
    k = min(n_neighbors, n)
    en = normalize_rows(jnp.asarray(embeddings))
    qt = min(query_tile, max(8, n))
    ct = _fit_tile(candidate_tile, n)
    if n <= stream_rows:
        dist, idx = _knn_tiles(en, k, qt, ct, precision, method)
        return transfer_idx(idx, transfer, n), transfer_dist(dist, transfer)
    stream_rows = _fit_stream(stream_rows, n, qt)

    idx_out = np.empty((n, k), np.int32)
    dist_out = np.empty((n, k), np.float32)
    pending = None  # (row_start, n_rows, idx_dev, dist_dev) not yet on host

    def _drain(entry):
        s, rows, idx_dev, dist_dev = entry
        idx_out[s : s + rows] = transfer_idx(idx_dev, transfer, n)[:rows]
        dist_out[s : s + rows] = transfer_dist(dist_dev, transfer)[:rows]

    # zero-row padding keeps every slab on ONE compiled executable (the
    # remote compile server charges 20-40 s per fresh shape); padded query
    # rows produce garbage neighbors that are sliced off at drain time
    pad = (-n) % stream_rows
    en_q = jnp.concatenate([en, jnp.zeros((pad, en.shape[1]), en.dtype)]) \
        if pad else en
    for s in range(0, n, stream_rows):
        # traced start index -> one slice executable for every slab
        dist_dev, idx_dev = _knn_tiles_qc(
            jax.lax.dynamic_slice_in_dim(
                en_q, jnp.int32(s), stream_rows, axis=0
            ),
            en, k, qt, ct, precision, method,
        )
        if pending is not None:
            _drain(pending)
        pending = (s, min(stream_rows, n - s), idx_dev, dist_dev)
    _drain(pending)
    return idx_out, dist_out


def knn_exact_block(
    queries: jax.Array,
    candidates: jax.Array,
    n_neighbors: int,
    query_tile: int = 512,
    candidate_tile: int = 131072,
    precision: str = "bf16",
    method: str = "exact",
    transfer: str = "f32",
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k of each (already L2-normalized) query row against a candidate
    matrix — the multi-host DCN path: each host searches its local rows
    against the all-gathered global matrix in streamed candidate tiles
    instead of materializing a (2*per, N) score matrix (VERDICT r1 weak 5)."""
    n = candidates.shape[0]
    k = min(n_neighbors, n)
    dist, idx = _knn_tiles_qc(
        jnp.asarray(queries), jnp.asarray(candidates), k,
        min(query_tile, max(8, queries.shape[0])),
        _fit_tile(candidate_tile, n), precision, method,
    )
    return transfer_idx(idx, transfer, n), transfer_dist(dist, transfer)
