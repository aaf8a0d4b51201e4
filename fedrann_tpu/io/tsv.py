"""overlaps.tsv writer.

Output contract from reference fedrann/__main__.py:261-300 and
README.md:68-90: six columns (query_name, query_orientation, target_name,
target_orientation, neighbor_rank, distance). Row r of the embedding matrix
maps to read r//2, orientation '+' if r%2==0 else '-' (reference
__main__.py:277-282). The self row (target_index == query_index) is skipped
but keeps its enumerate position, so real neighbors typically carry ranks
1..k-1 (reference __main__.py:278-288); the query's own reverse-complement
row is intentionally NOT filtered, matching the reference.
"""

from __future__ import annotations

from typing import IO, Sequence

import numpy as np

HEADER = (
    "query_name\tquery_orientation\ttarget_name\ttarget_orientation"
    "\tneighbor_rank\tdistance\n"
)


def _orientation(row: int) -> str:
    return "+" if row % 2 == 0 else "-"


def write_overlaps_tsv(
    out: IO[str],
    names: Sequence[str],
    neighbor_indices: np.ndarray,  # (2R, k) int
    neighbor_distances: np.ndarray,  # (2R, k) float
) -> int:
    """Stream the overlap table; returns number of data rows written."""
    out.write(HEADER)
    n_rows = 0
    indices = np.asarray(neighbor_indices)
    distances = np.asarray(neighbor_distances)
    for q in range(indices.shape[0]):
        q_name = names[q // 2]
        q_orient = _orientation(q)
        for rank, (t, d) in enumerate(zip(indices[q], distances[q])):
            t = int(t)
            if t == q or t < 0:
                continue
            out.write(
                f"{q_name}\t{q_orient}\t{names[t // 2]}\t{_orientation(t)}"
                f"\t{rank}\t{float(d)}\n"
            )
            n_rows += 1
    return n_rows
