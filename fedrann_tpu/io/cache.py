"""Packed-reads cache: reruns skip the host FASTX parse entirely.

The host VMs this pipeline runs on throttle unpredictably (measured 5-50x
swings on the identical parse — docs/TPU_PLATFORM_NOTES.md), so the robust
way to get the `load` stage off the critical path is to not do it: the
first run over an input serializes the bucketed 2-bit-packed representation
(plus names/lengths/indices) to `<output_dir>/fxcache.npz`, and every rerun
with the same input (identity = path + size + mtime, like the checkpoint
fingerprints) and bucket config loads it back with two orders of magnitude
less host work than parsing.

This replaces the reference's reliance on OS page cache + pigz re-decode on
every invocation (reference fastx_io.py:205-227): the reference re-parses
the FASTX from scratch per run; we parse once per dataset.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from fedrann_tpu.io.packing import PackedBucket, PackedReads
from fedrann_tpu.logging_utils import logger

CACHE_VERSION = 3  # v3: per-bucket prefix_valid persisted (re-deriving it
# by popcount costs ~4 s/run over a 30 MB valid-bits plane on this host)


def cache_meta(input_path: str, length_buckets: Optional[Sequence[int]],
               split_overlap: int | None = None) -> dict:
    """Identity of the cached packing; any mismatch invalidates the cache."""
    st = os.stat(input_path)
    return {
        "version": CACHE_VERSION,
        "path": os.path.abspath(input_path),
        "size": st.st_size,
        "mtime_ns": st.st_mtime_ns,
        # None = the auto ladder, which is a pure function of the input
        # file (identified by path/size/mtime above), so "auto" is a
        # stable cache identity
        "buckets": ("auto" if length_buckets is None
                    else [int(b) for b in length_buckets]),
        "split_overlap": split_overlap,
    }


def save_packed_cache(cache_path: str, packed: PackedReads, meta: dict) -> None:
    """Serialize a PackedReads (atomic write: tmp + rename)."""
    arrays: dict = {
        "meta": np.frombuffer(
            json.dumps(meta, sort_keys=True).encode(), dtype=np.uint8
        ),
        "names": np.frombuffer(
            "\x00".join(packed.names).encode("latin-1"), dtype=np.uint8
        ),
        "n_truncated": np.int64(packed.n_truncated),
        "n_buckets": np.int64(len(packed.buckets)),
    }
    if packed.split_read_ids is not None:
        arrays["split_ids"] = packed.split_read_ids
    for i, b in enumerate(packed.buckets):
        arrays[f"b{i}_lengths"] = b.lengths
        arrays[f"b{i}_read_index"] = b.read_index
        arrays[f"b{i}_length"] = np.int64(b.length)
        if b.bases is not None:
            arrays[f"b{i}_bases"] = b.bases
        else:
            arrays[f"b{i}_packed"] = b.packed_bases
            arrays[f"b{i}_valid"] = b.valid_bits
            if b.prefix_valid is not None:
                arrays[f"b{i}_prefix_valid"] = np.bool_(b.prefix_valid)
    tmp = cache_path + ".tmp"
    from fedrann_tpu.io.blockio import ChunkedWriter

    with open(tmp, "wb") as f:
        # uncompressed: load is one read + memcpy. ChunkedWriter: a single
        # big write() stalls 12-20s in this platform's dirty-page throttle
        np.savez(ChunkedWriter(f), **arrays)
    os.replace(tmp, cache_path)
    logger.info("wrote packed-reads cache %s (%.1f MB)", cache_path,
                os.path.getsize(cache_path) / 1e6)


def load_packed_cache(cache_path: str, meta: dict) -> Optional[PackedReads]:
    """Load a cache if present and its identity matches; None otherwise."""
    if not os.path.exists(cache_path):
        return None
    try:
        data = np.load(cache_path)
        stored = json.loads(bytes(data["meta"]).decode())
        if stored != json.loads(json.dumps(meta, sort_keys=True)):
            logger.info("packed-reads cache %s is stale; re-parsing",
                        cache_path)
            return None
        names = bytes(data["names"]).decode("latin-1").split("\x00")
        if names == [""]:
            names = []
        buckets = []
        for i in range(int(data["n_buckets"])):
            kw = dict(
                lengths=data[f"b{i}_lengths"],
                read_index=data[f"b{i}_read_index"],
                length=int(data[f"b{i}_length"]),
            )
            if f"b{i}_bases" in data:
                buckets.append(PackedBucket(bases=data[f"b{i}_bases"], **kw))
            else:
                buckets.append(PackedBucket(
                    bases=None, packed_bases=data[f"b{i}_packed"],
                    valid_bits=data[f"b{i}_valid"],
                    prefix_valid=(bool(data[f"b{i}_prefix_valid"])
                                  if f"b{i}_prefix_valid" in data else None),
                    **kw,
                ))
        logger.info("loaded packed-reads cache %s (%d reads)", cache_path,
                    len(names))
        return PackedReads(
            names=names, buckets=buckets,
            n_truncated=int(data["n_truncated"]),
            split_read_ids=(data["split_ids"] if "split_ids" in data
                            else None),
        )
    except (OSError, KeyError, ValueError, json.JSONDecodeError) as e:
        logger.warning("packed-reads cache %s unreadable (%s); re-parsing",
                       cache_path, e)
        return None
