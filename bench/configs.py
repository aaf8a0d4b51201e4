"""Named benchmark configurations mirroring BASELINE.json's ladder.

Real datasets (E. coli ONT, D. melanogaster HiFi, human chr1) are not
available in this environment, so each rung is a simulated stand-in with
the same workload *shape*: genome scale, coverage, read length, k, and
sample fraction. The CPU-oracle baseline is run at matched coverage.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class BenchConfig:
    name: str
    genome: int
    coverage: float
    read_len: int
    k: int
    sample_fraction: float
    min_multiplicity: int = 2
    dim: int = 512
    n_neighbors: int = 50
    error_rate: float = 0.05
    length_bucket: int = 16384
    topk_method: str = "exact"  # 'approx' = lax.approx_max_k block selection
    # BASELINE.json rung this models
    models: str = ""


CONFIGS = {
    "ci": BenchConfig(
        name="ci", genome=2_000_000, coverage=12, read_len=8000, k=15,
        sample_fraction=0.05,
        models="test/data/reads.fasta.gz CI workload (k=15, 5% sample)",
    ),
    "ecoli": BenchConfig(
        name="ecoli", genome=4_600_000, coverage=50, read_len=8000, k=15,
        sample_fraction=0.05,
        models="E. coli ONT ~50x, single chip, full brute-force k-NN",
    ),
    "dmel": BenchConfig(
        name="dmel", genome=30_000_000, coverage=30, read_len=15000, k=21,
        sample_fraction=0.005, error_rate=0.01, length_bucket=65536,
        topk_method="approx",
        models="D. melanogaster HiFi ~30x, k=21 (two-word code path)",
    ),
    "chr1": BenchConfig(
        name="chr1", genome=120_000_000, coverage=30, read_len=10000, k=15,
        sample_fraction=0.005, topk_method="approx",
        models="Human chr1 ONT ~30x (multi-host data-parallel rung)",
    ),
}
