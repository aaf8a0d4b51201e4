"""Benchmark harness: end-to-end overlap-detection throughput on the chip.

Prints ONE JSON line:
  {"metric": "reads_per_s", "value": N, "unit": "reads/s", "vs_baseline": R}

vs_baseline = device reads/s over the numpy-oracle reads/s on the identical
dataset/config. The oracle implements the reference pipeline's exact
semantics single-threaded on CPU (the reference itself cannot run here:
jellyfish/pynndescent are absent — BASELINE.md says the harness must
produce the CPU baseline itself). The published north-star target is >10x
over the 32-thread reference, so vs_baseline should exceed ~320x against
this single-threaded proxy on comparable workloads.

Scale knobs via env: BENCH_GENOME (bp), BENCH_COVERAGE, BENCH_READ_LEN.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time


def probe_backend(timeout_s: float = 120.0) -> tuple[bool, str]:
    """Check the accelerator backend is reachable before committing to the
    run. On this platform a dead TPU tunnel makes jax.devices() HANG (never
    error), so the probe runs in a subprocess under a hard timeout; the
    driver then gets a parseable skip marker instead of a stack trace
    (VERDICT r2: BENCH_r02 rc=1 with an unparseable traceback)."""
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"backend probe hung >{timeout_s:.0f}s (tunnel down)"
    if out.returncode != 0:
        tail = (out.stderr or "").strip().splitlines()
        return False, "backend probe failed: " + (tail[-1] if tail else "?")
    return True, out.stdout.strip()


def main() -> int:
    ok, detail = probe_backend()
    if not ok:
        print(f"[bench] SKIPPED: {detail}", file=sys.stderr)
        print(json.dumps({
            "metric": "reads_per_s", "value": 0, "unit": "reads/s",
            "vs_baseline": 0, "skipped": True, "reason": detail,
        }))
        return 0
    print(f"[bench] backend: {detail}", file=sys.stderr)
    genome = int(os.environ.get("BENCH_GENOME", 5_000_000))
    coverage = float(os.environ.get("BENCH_COVERAGE", 12))
    read_len = int(os.environ.get("BENCH_READ_LEN", 8000))
    baseline_reads = int(os.environ.get("BENCH_BASELINE_READS", 0))

    from fedrann_tpu.cli import config_from_args
    from fedrann_tpu.pipeline import run_pipeline
    from fedrann_tpu.sim import simulate_reads, write_fasta
    from fedrann_tpu import oracle

    sim = simulate_reads(
        genome_length=genome, coverage=coverage, mean_read_length=read_len,
        error_rate=0.05, seed=1234,
    )
    n_reads = len(sim.names)
    print(f"[bench] {n_reads} reads, genome {genome} bp", file=sys.stderr)

    # workdir on tmpfs when available: this VM's disk sustains ~5 MB/s
    # (writes >= 4 MB stall 12-20 s in the dirty-page throttle — see
    # docs/TPU_PLATFORM_NOTES.md "Disk"), which would make the measured
    # number mostly a disk benchmark. The CPU-oracle baseline writes no
    # output at all, so tmpfs keeps the comparison about the pipeline.
    tmp_parent = "/dev/shm" if os.path.isdir("/dev/shm") else None
    with tempfile.TemporaryDirectory(dir=tmp_parent) as tmp:
        fasta = os.path.join(tmp, "reads.fasta")
        write_fasta(fasta, sim.names, sim.sequences)
        args = [
            "-i", fasta, "-o", os.path.join(tmp, "out"),
            "-k", "15", "--kmer-sample-fraction", "0.05",
            "--kmer-min-multiplicity", "2", "-n", "512",
            "--nndescent-n-neighbors", "50", "--seed", "602", "--threads", "4",
            "--length-buckets", "auto",
            # the reference's ANN is approximate (pynndescent); approx
            # block selection with the exact final merge measured 1.0
            # neighbor agreement at 120k rows and 3-4x faster selection
            "--knn-topk-method", "approx",
        ]
        config = config_from_args(args)

        # warm-up run compiles every kernel; BEST of 4 measured runs. The
        # tunnel's per-launch latency fluctuates 0.1-60 ms with other
        # tenants' load (identical device work measures anywhere in a 30x
        # band minutes apart — bench/_tmp_dissect*.py); the minimum is the
        # only statistic that measures this code rather than the tunnel.
        run_pipeline(config)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            result = run_pipeline(config)
            times.append(time.perf_counter() - t0)
        device_s = min(times)
        device_rps = n_reads / device_s
        print(f"[bench] device: best {device_s:.2f}s of {sorted(times)} = "
              f"{device_rps:.1f} reads/s "
              f"(stages: { {k: round(v['seconds'], 2) for k, v in result.metrics.items()} })",
              file=sys.stderr)
        # roofline view (VERDICT r2 weak 3): how the hot stages relate to
        # the chip's peak, independent of the contended oracle denominator
        knn_m = result.metrics.get("knn", {})
        embed_m = result.metrics.get("embed", {})
        roofline = {}
        if "tflops_per_s" in knn_m:
            roofline["knn_tflops_per_s"] = round(knn_m["tflops_per_s"], 2)
        if "mfu_pct" in knn_m:
            roofline["knn_mfu_pct"] = knn_m["mfu_pct"]
        if "hbm_gb_per_s" in embed_m:
            roofline["embed_hbm_gb_per_s"] = round(embed_m["hbm_gb_per_s"], 2)
        if "hbm_util_pct" in embed_m:
            roofline["embed_hbm_util_pct"] = embed_m["hbm_util_pct"]
        if roofline:
            print(f"[bench] roofline: {roofline}", file=sys.stderr)

    # CPU-oracle baseline on the IDENTICAL dataset (same reads, same N).
    # Earlier rounds extrapolated from a 300-read matched-coverage subset,
    # but the oracle's per-read cost is ~N^1.14 (measured: 232 reads/s at
    # n=300, 45 at n=1500, 41 at n=3000) — the subset flattered the CPU
    # ~6x and made vs_baseline meaningless across rounds. Full-N costs
    # ~3.5 min at the default 7500 reads; BENCH_BASELINE_READS caps the
    # subset size for quick runs (0/unset = full N, with a floor so the
    # cap can't resurrect the flattering tiny-subset regime).
    if baseline_reads and baseline_reads < n_reads:
        # capped path: matched-coverage smaller genome (a raw read subset
        # would have ~1/5 the coverage and an empty min-multiplicity
        # library), floored at 1500 reads to stay out of the flattering
        # tiny-subset regime
        cap = max(baseline_reads, 1500)
        base_sim = simulate_reads(
            genome_length=max(50_000, genome * cap // max(n_reads, 1)),
            coverage=coverage, mean_read_length=read_len,
            error_rate=0.05, seed=1234,
        )
        sub = base_sim.sequences
    else:
        sub = sim.sequences
    # best-of-2: the host CPU is shared (throttle phases observed in
    # earlier rounds) — symmetric with the device best-of-4 above
    otimes = []
    for _ in range(2):
        t0 = time.perf_counter()
        oracle.run_oracle_pipeline(
            sub, k=15, sample_fraction=0.05, min_multiplicity=2,
            n_components=512, n_neighbors=50, library_seed=602,
            projection_seed=2094,
        )
        otimes.append(time.perf_counter() - t0)
    oracle_s = min(otimes)
    oracle_rps = len(sub) / oracle_s
    print(f"[bench] oracle CPU: {oracle_s:.2f}s for {len(sub)} reads = "
          f"{oracle_rps:.1f} reads/s", file=sys.stderr)

    line = {
        "metric": "reads_per_s",
        "value": round(device_rps, 2),
        "unit": "reads/s",
        "vs_baseline": round(device_rps / oracle_rps, 2),
    }
    line.update(roofline)

    # Rung-scale second metric (VERDICT r3 weak 7): the 7.5k-read primary
    # shape cannot exercise the MXU meaningfully; the dmel-shaped rung
    # (60k reads, 120k x 512 k-NN) measures the machine. Reuses the
    # persistent bench workdir (fasta + fxcache survive across runs), so
    # it costs ~1 min warm / one sim+compile pass cold. BENCH_RUNG=0
    # skips; any rung failure degrades to the primary metric only.
    if os.environ.get("BENCH_RUNG", "1") != "0":
        # subprocess + hard timeout: the remote compile server stalls
        # unpredictably under co-tenant load (observed 150 s - 14 min for
        # the same dmel stage kernel); a stalled rung must degrade to the
        # primary metric, not take the whole bench line down with it.
        try:
            rung = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench", "run.py"),
                 "dmel", "--no-recall"],
                capture_output=True, text=True,
                timeout=float(os.environ.get("BENCH_RUNG_TIMEOUT", 1500)),
            )
            rows = [json.loads(l) for l in rung.stdout.splitlines()
                    if l.startswith("{")]
            if rung.returncode == 0 and rows:
                rung_row = rows[-1]
                line["rung"] = "dmel"
                line["rung_reads_per_s"] = rung_row["reads_per_s"]
                line["rung_knn_mfu_pct"] = (
                    rung_row.get("roofline", {}).get("knn", {})
                    .get("mfu_pct"))
                print(f"[bench] rung dmel: {rung_row['reads_per_s']} "
                      f"reads/s (stages: {rung_row['stages_s']})",
                      file=sys.stderr)
            else:
                tail = (rung.stderr or "").strip().splitlines()
                print(f"[bench] rung failed rc={rung.returncode}: "
                      f"{tail[-1] if tail else '?'}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print("[bench] rung timed out (compile-server contention); "
                  "primary metric only", file=sys.stderr)
        except Exception as e:  # pragma: no cover - degrade, don't fail
            print(f"[bench] rung skipped: {e}", file=sys.stderr)

    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
