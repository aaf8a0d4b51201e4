"""Pallas bitonic row sort — the platform's missing fast sort.

XLA's sorts on this v5e cost ~37 ms per pass at hot shapes regardless of
width (bench/micro_ops.py: (256,2048), (256,16384) and 1M-element 1-D all
~37-40 ms — they lower to serial scalar loops), while dense row-parallel
vector ops run near VPU peak. A bitonic network is pure vector work:
log2(W)*(log2(W)+1)/2 compare-exchange substages, each one built from two
static lane rolls (pltpu.roll), an unsigned compare, and selects — no
gathers, no scalar loops, no dynamic addressing.

Sort keys are uint32 planes compared lexicographically (word-tuple codes,
docs/TPU_PLATFORM_NOTES.md: device ints are u32); non-key planes ride
along as payload. Rows are independent: the grid blocks over rows and each
block sorts its rows in VMEM registers.

Mosaic hardening: unsigned min/max are synthesized from compare+select
(`arith.minui` does not exist on this toolchain); masks come from 2-D
broadcasted_iota; all scalars are int32.

BENCH-ONLY (not in the production pipeline). Built as a candidate
replacement for jax.lax.sort on the staging hot path (kmers/membership.py
_sort_rows); measured head-to-head on the v5e it MATCHES XLA's row sort
(~0.1 ms at hot shapes — the round-1 "37 ms/sort" cost turned out to be
launch latency, not sort work), so the production path keeps the simpler
XLA sort. Kept under bench/ with its tests as the measurement record.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cmp_exchange(planes, num_keys, j, k, idx):
    """One bitonic substage at distance j inside blocks of size k."""
    low = (idx & j) == 0
    take_min = ((idx & k) == 0) == low
    width = planes[0].shape[1]
    partners = tuple(
        # roll requires non-negative shifts: -j == width - j (circular).
        # shifts are pinned int32: a python int traces as an i64
        # tpu.dynamic_rotate operand under x64, which Mosaic rejects
        jnp.where(low, pltpu.roll(p, jnp.int32(width - j), axis=1),
                  pltpu.roll(p, jnp.int32(j), axis=1))
        for p in planes
    )
    # lexicographic unsigned less-than over the key planes
    lt = planes[0] < partners[0]
    eq = planes[0] == partners[0]
    for a, b in zip(planes[1:num_keys], partners[1:num_keys]):
        lt = lt | (eq & (a < b))
        eq = eq & (a == b)
    keep_self = take_min == lt  # min wanted and self smaller, or max wanted
    # and self larger; ties keep self (both equal keys -> payload order
    # within equal keys is arbitrary, as with any unstable sort)
    keep_self = keep_self | eq
    return tuple(
        jax.lax.select(keep_self, p, q) for p, q in zip(planes, partners)
    )


def _sort_kernel(*refs, n_planes, num_keys, width):
    in_refs = refs[:n_planes]
    out_refs = refs[n_planes : 2 * n_planes]
    planes = tuple(r[...] for r in in_refs)
    rb = planes[0].shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (rb, width), 1)
    k = 2
    while k <= width:
        j = k >> 1
        while j >= 1:
            planes = _cmp_exchange(planes, num_keys, j, k, idx)
            j >>= 1
        k <<= 1
    for r, p in zip(out_refs, planes):
        r[...] = p


def _pick_block_rows(rows, width, n_planes):
    # keep the live working set (planes + partners) well under VMEM
    budget = 4 * 1024 * 1024  # bytes per plane-copy budget
    rb = max(8, budget // max(1, 4 * width))
    rb = min(rows, 1 << (rb.bit_length() - 1))
    while rb > 8 and rb * width * 4 * n_planes * 3 > 12 * 1024 * 1024:
        rb >>= 1
    return max(8, rb)


@functools.partial(
    jax.jit, static_argnames=("num_keys", "block_rows", "interpret")
)
def sort_rows_pallas(
    planes: tuple,
    num_keys: int | None = None,
    block_rows: int | None = None,
    interpret: bool = False,
) -> tuple:
    """Row-wise ascending bitonic sort of uint32 planes.

    planes: tuple of (R, W) uint32 arrays; the first `num_keys` planes are
    compared lexicographically (default: all planes are keys, matching
    jax.lax.sort(..., num_keys=len(planes))); the rest are payload. W must
    be a power of two (callers pad with 0xFFFFFFFF sentinels).
    """
    n_planes = len(planes)
    if num_keys is None:
        num_keys = n_planes
    rows, width = planes[0].shape
    if width & (width - 1):
        raise ValueError(f"width {width} must be a power of two")
    rb = block_rows or _pick_block_rows(rows, width, n_planes)
    rb = min(rb, rows)
    if rows % rb:
        raise ValueError(f"rows {rows} not a multiple of block_rows {rb}")

    kernel = functools.partial(
        _sort_kernel, n_planes=n_planes, num_keys=num_keys, width=width
    )

    def im(i):
        return (jnp.int32(i), jnp.int32(0))

    spec = pl.BlockSpec((rb, width), im, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(rows // rb,),
        in_specs=[spec] * n_planes,
        out_specs=tuple([spec] * n_planes),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, width), jnp.uint32)
            for _ in range(n_planes)
        ),
        **({"interpret": True} if interpret else {}),
    )(*planes)
    return out if isinstance(out, tuple) else (out,)
