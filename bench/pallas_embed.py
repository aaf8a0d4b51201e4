"""Fused Pallas membership + embedding kernel (the per-read hot path).

Replaces the two XLA stages that dominate the embed wall time — the
prefix-table membership lookup (~98 ms/chunk) and the P-row
gather-accumulate (~84 ms/chunk), both bound by XLA's ~14M elem/s TPU
gathers (bench/micro_ops.py) — with ONE kernel that does the reference
scanner's whole job (kmer_searcher.cpp:308-349 hash probes +
feature_extraction.py:204-213 spMM) the TPU way.

Design: a single sweep over projection tiles, exploiting the fact that
staged candidate rows are CODE-SORTED (stage_candidates sorts once for
counting anyway) so each row's library positions are non-decreasing:

  grid = (row_blocks, lib_tiles); for a fixed row block, tile j streams
  Q[j*T:(j+1)*T] through VMEM (Q row p = [P[p] | P[p+L]], sequential
  HBM reads) and the library tile codes through SMEM. Each row keeps a
  persistent SMEM cursor into its sorted candidates; at tile j it
  consumes exactly the candidates whose code sorts strictly below the
  tile's upper boundary code (so equal codes always land in the tile
  that contains them). Each consumed candidate is probed by a 9-step
  scalar binary search within the 512-entry SMEM library tile,
  deduplicated against its predecessor (presence-set semantics —
  duplicates are adjacent in sort order and share a tile), and on a hit
  accumulated into both orientation rows with ONE dynamic-row
  vector read-modify-write (~33 ns measured, bench/probe_mosaic2.py):

      E[r, :d]  += strand ? Q[p].lo : Q[p].hi      (forward row)
      E[r, d:]  += strand ? Q[p].hi : Q[p].lo      (reverse row)

  — the i <-> i+L mirror contract of SURVEY.md §2.5 (reference
  feature_extraction.py:137-140) as a half-swap select. Unfound
  candidates cost only the probe; every candidate is touched exactly
  once across all tiles; there is no XLA gather anywhere.

Mosaic legality rules this design honors (measured on v5e,
bench/probe_mosaic*.py + docs/TPU_PLATFORM_NOTES.md):
  - scalar loads/stores at dynamic indices are SMEM-only -> the staged
    candidates, library tiles, and tile boundaries ride SMEM blocks
    (SMEM blocks must be SHAPED: a shapeless SMEM BlockSpec under a
    grid crashes the Mosaic pipeline outright);
  - VMEM allows vector ops at dynamic *sublane* index (q row loads,
    E-row RMW) but no dynamic lane addressing;
  - every scalar is pinned int32/uint32 (the package enables x64, and
    bare python ints trace as i64, which Mosaic cannot legalize);
  - no unsigned min/max (no `arith.minui` on this toolchain).

k <= 15 uses the strand-packed single plane ((code<<1)|strand, 31
bits); k == 16 uses the two-plane (code, strand) staging. k > 16
(two-word codes) falls back to the XLA implementation in
kmers/membership.py + project/embed.py.

BENCH-ONLY (not in the production pipeline). Measured head-to-head at
the driver-bench chunk shape, the scalar-walk kernel runs ~147 ms/chunk
vs ~60 ms for the XLA membership+gather pair it was built to replace:
the per-candidate SMEM scalar walk serializes what XLA's batched gathers
overlap, and this platform's real taxes (launch count, gather row
count) are already paid once per chunk either way. Kept under bench/
with its tests as the measurement record (VERDICT r2 next-round 9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_q_cat(p_ext: jax.Array, lib_size: int, tile: int) -> jax.Array:
    """(2L+1, d) extended projection -> (L_pad, 2d_pad) streaming layout:
    row p = [P[p] | P[p+L]]; rows padded to a tile multiple with zeros (a
    padded row is never accumulated — no candidate probes found there)."""
    d = p_ext.shape[1]
    l_pad = max(tile, -(-max(lib_size, 1) // tile) * tile)
    d_pad = -(-d // 128) * 128
    q = jnp.zeros((l_pad, 2 * d_pad), jnp.float32)
    if lib_size:
        q = q.at[:lib_size, :d].set(p_ext[:lib_size])
        q = q.at[:lib_size, d_pad : d_pad + d].set(p_ext[lib_size : 2 * lib_size])
    return q


def _kernel(staged_ref, strand_ref, lib_ref, q_ref,
            e_ref, nh_ref, ptr_ref, cnt_ref,
            *, hb, rb, tile, n_tiles, d_pad, packed_strand):
    # all scalar constants are built INSIDE the trace (module-level jnp
    # scalars would be captured constants, which pallas_call rejects)
    _I0 = jnp.int32(0)
    _I1 = jnp.int32(1)
    _U1 = jnp.uint32(1)
    _SENT = jnp.uint32(0xFFFFFFFF)
    j = pl.program_id(1)
    hb_i = jnp.int32(hb)
    tile_i = jnp.int32(tile)
    is_last = j == jnp.int32(n_tiles - 1)

    @pl.when(j == _I0)
    def init():
        e_ref[...] = jnp.zeros_like(e_ref)

        def zero_row(r, _):
            ptr_ref[r] = _I0
            cnt_ref[r] = _I0
            return _I0

        jax.lax.fori_loop(_I0, jnp.int32(rb), zero_row, _I0)

    # Tile assignment: a candidate belongs to the FIRST tile whose last
    # library code is >= its code, i.e. consume while code <= last
    # (strictly below the derived boundary). Candidates larger than
    # every library code are never consumed — they are misses and the
    # cursor simply stops on them. A sentinel-padded tile has
    # last == 0xFFFFFFFF: its boundary saturates to the sentinel, which
    # consumes every remaining REAL candidate (all misses against the
    # padded tile) but never the staged sentinels themselves.
    jrow = j & jnp.int32(7)
    last = lib_ref[jrow, jnp.int32(tile - 1)]
    if packed_strand:
        # staged words are (code << 1) | strand, monotone in code:
        # raw < (last+1)<<1  <=>  code <= last   (31-bit packed, no
        # overflow: last <= 2^30-1 for k <= 15)
        boundary = jax.lax.select(
            last == _SENT, _SENT, (last + _U1) << _U1)
    else:
        # full-width codes: last is a real code <= 0xFFFFFFFE, so
        # last+1 never wraps
        boundary = jax.lax.select(last == _SENT, _SENT, last + _U1)

    def row_body(r, _):
        def cond(state):
            p, _cnt, _pc, _ps = state
            raw = staged_ref[r, jnp.minimum(p, hb_i - _I1)]
            return (p < hb_i) & (raw < boundary)

        def step(state):
            p, cnt, prev_raw, prev_strand = state
            raw = staged_ref[r, p]
            if packed_strand:
                code = raw >> _U1
                strand = raw & _U1
                is_dup = raw == prev_raw
            else:
                code = raw
                strand = strand_ref[r, p] & _U1
                is_dup = (raw == prev_raw) & (strand == prev_strand)

            # lower bound of `code` within the SMEM library tile
            # (sentinel-padded, so lo==tile means "past every real code")
            def bs(s):
                lo_, hi_ = s
                mid = (lo_ + hi_) >> _I1
                go = lib_ref[jrow, mid] < code
                return (jax.lax.select(go, mid + _I1, lo_),
                        jax.lax.select(go, hi_, mid))

            lo, _hi = jax.lax.while_loop(
                lambda s: s[0] < s[1], bs, (_I0, tile_i))
            loc = jnp.minimum(lo, tile_i - _I1)
            found = (lo < tile_i) & (lib_ref[jrow, loc] == code) & (~is_dup)
            cnt = cnt + found.astype(jnp.int32)

            @pl.when(found)
            def accum():
                v = q_ref[pl.ds(loc, 1), :]
                h1 = v[:, :d_pad]
                h2 = v[:, d_pad:]
                fwd = strand == _U1
                a = jax.lax.select(fwd, h1, h2)
                b = jax.lax.select(fwd, h2, h1)
                e_ref[pl.ds(r, 1), :d_pad] += a
                e_ref[pl.ds(r, 1), d_pad:] += b

            return (p + _I1, cnt, raw, strand)

        p0 = ptr_ref[r]
        # seed the dup tracker from the predecessor of the first candidate
        # this tile consumes. Duplicate (code, strand) pairs are adjacent
        # after the staging sort; a predecessor consumed by an EARLIER
        # tile necessarily has a smaller code, so seeding from it can
        # never suppress a real first occurrence. The sentinel seed can
        # never match: 0xFFFFFFFF is not a canonical code (the revcomp of
        # all-T is all-A, which always sorts lower).
        pm1 = jnp.maximum(p0 - _I1, _I0)
        has_prev = p0 > _I0
        prev0 = jax.lax.select(has_prev, staged_ref[r, pm1], _SENT)
        if packed_strand:
            prev0_strand = jnp.uint32(2)
        else:
            prev0_strand = jax.lax.select(
                has_prev, strand_ref[r, pm1] & _U1, jnp.uint32(2))
        p1, cnt1, _, _ = jax.lax.while_loop(
            cond, step, (p0, cnt_ref[r], prev0, prev0_strand))
        ptr_ref[r] = p1
        cnt_ref[r] = cnt1

        @pl.when(is_last)
        def flush():
            nh_ref[r, 0] = cnt1

        return _I0

    jax.lax.fori_loop(_I0, jnp.int32(rb), row_body, _I0)


@functools.partial(
    jax.jit,
    static_argnames=("k", "lib_size", "tile", "block_rows", "interpret"),
)
def merge_embed(
    staged_planes: tuple,     # stage_candidates output planes
    lib_flat: jax.Array,      # (L_pad,) uint32 sorted, 0xFFFFFFFF pad
    q_cat: jax.Array,         # (L_pad_q, 2*d_pad) f32 from build_q_cat
    k: int,
    lib_size: int,
    tile: int = 512,
    block_rows: int = 32,
    interpret: bool = False,
):
    """Fused membership + paired embedding over staged sorted candidates.

    Returns (e_fwd (R, d_pad) f32, e_rev (R, d_pad) f32,
    n_hits (R,) int32). Requires single-word staging (k <= 16)."""
    if k > 16:
        raise ValueError("merge_embed supports k <= 16 (single-word codes)")
    packed_strand = len(staged_planes) == 1
    staged = staged_planes[0]
    strand = staged_planes[1] if not packed_strand else staged
    r, hb = staged.shape
    l_pad_q, dd = q_cat.shape
    d_pad = dd // 2
    assert l_pad_q % tile == 0
    n_tiles = l_pad_q // tile
    rb = min(block_rows, r)
    n_rblocks = pl.cdiv(r, rb)

    # library padded to the q tiling (sentinel pad; boundaries are
    # derived in-kernel from each tile's last entry)
    lp = lib_flat.shape[0]
    if lp < l_pad_q:
        lib_flat = jnp.concatenate(
            [lib_flat,
             jnp.full((l_pad_q - lp,), 0xFFFFFFFF, jnp.uint32)])
    else:
        lib_flat = lib_flat[:l_pad_q]
    # SMEM blocks need a sublane dim divisible by 8: ship library tiles
    # in groups of 8 rows and pick the row with j & 7 in-kernel
    nt8 = -(-n_tiles // 8) * 8
    if nt8 * tile > l_pad_q:
        lib_flat = jnp.concatenate(
            [lib_flat,
             jnp.full((nt8 * tile - l_pad_q,), 0xFFFFFFFF, jnp.uint32)])
    lib2d = lib_flat.reshape(nt8, tile)

    kernel = functools.partial(
        _kernel, hb=hb, rb=rb, tile=tile, n_tiles=n_tiles, d_pad=d_pad,
        packed_strand=packed_strand,
    )

    def im_i2(i, j):
        return (jnp.int32(i), jnp.int32(0))

    def im_i1(i, j):
        return (jnp.int32(i), jnp.int32(0))

    def im_j2(i, j):
        return (jnp.int32(j), jnp.int32(0))

    def im_j8(i, j):
        return (jnp.int32(j) // jnp.int32(8), jnp.int32(0))

    strand_spec = pl.BlockSpec(
        ((rb, 128) if packed_strand else (rb, hb)), im_i2,
        memory_space=pltpu.SMEM)
    e_cat, n_hits = pl.pallas_call(
        kernel,
        grid=(n_rblocks, n_tiles),
        in_specs=[
            pl.BlockSpec((rb, hb), im_i2, memory_space=pltpu.SMEM),
            strand_spec,
            pl.BlockSpec((8, tile), im_j8, memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, dd), im_j2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, dd), im_i2, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), im_i1, memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rblocks * rb, dd), jnp.float32),
            jax.ShapeDtypeStruct((n_rblocks * rb, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((rb,), jnp.int32),
            pltpu.SMEM((rb,), jnp.int32),
        ],
        **({"interpret": True} if interpret else {}),
    )(staged, strand, lib2d, q_cat)
    return (e_cat[:r, :d_pad], e_cat[:r, d_pad:], n_hits[:r, 0])


def prepare_library(lib_codes_u64: np.ndarray, k: int):
    """Host-side prep: (L_pad,) u32 device array of the sorted library
    codes, 0xFFFFFFFF-padded (codes are < 2^(2k) <= 2^32, and the all-T
    k-mer can never be canonical, so the pad never collides)."""
    size = len(lib_codes_u64)
    codes32 = (lib_codes_u64.astype(np.uint32) if size
               else np.zeros(0, np.uint32))
    l_pad = max(128, -(-max(size, 1) // 128) * 128)
    padded = np.full(l_pad, 0xFFFFFFFF, dtype=np.uint32)
    padded[:size] = codes32
    return jnp.asarray(padded)
