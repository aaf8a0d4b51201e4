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
    """Write the overlap table (vectorized via pandas when available — at
    pod scale this is millions of rows); returns data rows written."""
    out.write(HEADER)
    indices = np.asarray(neighbor_indices)
    distances = np.asarray(neighbor_distances)
    n, k = indices.shape
    rows = np.arange(n)[:, None]
    keep = (indices != rows) & (indices >= 0)
    q_rows = np.broadcast_to(rows, indices.shape)[keep]
    t_rows = indices[keep]
    ranks = np.broadcast_to(np.arange(k)[None, :], indices.shape)[keep]
    dists = distances[keep]
    name_arr = np.asarray(names, dtype=object)
    orient = np.array(["+", "-"], dtype=object)
    try:
        import pandas as pd

        df = pd.DataFrame(
            {
                "query_name": name_arr[q_rows // 2],
                "query_orientation": orient[q_rows % 2],
                "target_name": name_arr[t_rows // 2],
                "target_orientation": orient[t_rows % 2],
                "neighbor_rank": ranks,
                "distance": dists,
            }
        )
        df.to_csv(out, sep="\t", header=False, index=False)
    except ImportError:
        for q, t, r, d in zip(q_rows, t_rows, ranks, dists):
            out.write(
                f"{name_arr[q // 2]}\t{orient[q % 2]}\t{name_arr[t // 2]}"
                f"\t{orient[t % 2]}\t{r}\t{float(d)}\n"
            )
    return int(keep.sum())
