"""Pallas TPU kernels for the k-mer hot path.

`canonical_and_sample` fuses the rolling 2-bit window codec, canonicalization
(min(code, revcomp)), validity masking, and the uint32 sampling hash into ONE
VMEM pass over a read block: the XLA path materializes code/rc/valid/canon as
separate HBM arrays between ops, while the kernel keeps the whole rolling
state in registers/VMEM and writes only the two outputs the count stage
consumes (canonical code + keep mask).

Output windows are aligned to the input width L (the trailing k-1 columns
are invalid), so blocks stay lane-aligned regardless of k.

k <= 16 (single-word codes) — the two-word variant falls back to the XLA
codec. Grid: one program per row block; each block processes (block_rows, L)
bases entirely in VMEM.

BENCH-ONLY (not in the production pipeline): the fused staging program
(pipeline._stage_chunk_fused) already keeps the intermediate code/rc/
valid planes as jit-internal temps, so XLA fuses the same elementwise
chain this kernel hand-writes; measured per-chunk times match. Kept
under bench/ with its tests as the measurement record.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fmix32(x):
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> jnp.uint32(16))


def _kernel(bases_ref, canon_ref, keep_ref, *, k, seed, threshold, keep_all):
    # widen to uint32 once: tpu.dynamic_rotate rejects int8 vectors
    bases = bases_ref[:].astype(jnp.uint32)   # (TR, L)
    tr, length = bases.shape
    code = jnp.zeros((tr, length), jnp.uint32)
    rc = jnp.zeros((tr, length), jnp.uint32)
    valid = jnp.ones((tr, length), dtype=jnp.bool_)
    for j in range(k):  # static unroll over window offsets
        # window j consumes base column (i + j); emulate the shifted slice
        # with a left-roll ((L - j) % L: pltpu.roll requires shift >= 0)
        # so every array stays (TR, L)
        # int32 shift: the package enables x64, and a bare python int would
        # reach tpu.dynamic_rotate as i64, which Mosaic rejects
        b32 = pltpu.roll(bases, shift=jnp.int32((length - j) % length), axis=1)
        ok = b32 < jnp.uint32(4)
        # mask to 2 bits instead of where(): avoids weak-type promotion
        # inside the kernel trace (recursion bug under Mosaic lowering)
        v = jax.lax.select(ok, b32, jnp.zeros_like(b32)) & jnp.uint32(3)
        code = (code << jnp.uint32(2)) | v
        rc = rc | ((v ^ jnp.uint32(3)) << jnp.uint32(2 * j))
        valid = valid & ok
    if 2 * k < 32:
        code = code & jnp.uint32((1 << (2 * k)) - 1)
    # windows starting in the last k-1 columns wrap around: invalid.
    # (explicit int32 constant: under jax_enable_x64 a bare python int
    # promotes the comparison to i64, which this Mosaic cannot legalize)
    col = jax.lax.broadcasted_iota(jnp.int32, (tr, length), 1)
    valid = valid & (col < jnp.int32(length - k + 1))

    # select instead of jnp.minimum: Mosaic here cannot legalize arith.minui
    canon = jax.lax.select(code < rc, code, rc)
    canon = jax.lax.select(
        valid, canon, jnp.full_like(canon, jnp.uint32(0xFFFFFFFF))
    )

    s1 = _fmix32(jnp.uint32(seed & 0xFFFFFFFF))
    s2 = _fmix32(s1 ^ jnp.uint32(0x9E3779B9))
    h1 = _fmix32(canon ^ s1)
    h2 = _fmix32(jnp.uint32(0) ^ s2 ^ h1)
    hashed = _fmix32(h1 ^ h2)
    sampled = jnp.bool_(keep_all) | (hashed < jnp.uint32(threshold))
    # uint8, not bool: i1 vector stores fail to legalize on this Mosaic
    keep_ref[:] = (valid & sampled).astype(jnp.uint8)
    canon_ref[:] = canon


@functools.partial(
    jax.jit,
    static_argnames=("k", "seed", "threshold", "keep_all", "block_rows",
                     "interpret"),
)
def canonical_and_sample(
    bases: jax.Array,     # (R, L) uint8
    k: int,
    seed: int,
    threshold: int,       # uint32 sampling threshold (fraction * 2^32)
    keep_all: bool = False,
    block_rows: int = 8,
    interpret: bool = False,
):
    """Returns (canon (R, L) uint32 with the all-ones sentinel on invalid
    windows, keep (R, L) bool). Window i covers bases[i : i+k]; the last
    k-1 columns are always invalid. Bitwise-equal to
    canonical_window_codes + sample_hash32 for k <= 16."""
    if k > 16:
        raise ValueError("pallas codec kernel supports k <= 16")
    r, length = bases.shape
    block_rows = min(block_rows, r)
    grid = (pl.cdiv(r, block_rows),)
    seed_c = int(seed) & 0xFFFFFFFF
    threshold_c = int(threshold) & 0xFFFFFFFF

    # plain closure, not functools.partial(kwargs): keyword-partial kernels
    # miscompile ('func.return' legalization) on this Mosaic build
    def kernel(bases_ref, canon_ref, keep_ref):
        _kernel(bases_ref, canon_ref, keep_ref, k=k, seed=seed_c,
                threshold=threshold_c, keep_all=keep_all)

    call_kwargs = {"interpret": True} if interpret else {}

    # int32-cast index map: under jax_enable_x64 the grid indices trace as
    # i64, which this Mosaic build cannot legalize (manifests as a cryptic
    # 'func.return' error)
    def imap(i):
        return (jnp.int32(i), jnp.int32(0))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, length), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, length), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, length), imap, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, length), jnp.uint32),
            jax.ShapeDtypeStruct((r, length), jnp.uint8),
        ),
        **call_kwargs,
    )(bases)
