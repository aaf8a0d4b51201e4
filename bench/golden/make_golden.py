"""Generate the pinned REFERENCE-run artifact set for golden parity tests.

Runs as much of the actual reference pipeline as this environment allows
(VERDICT r1 item 3: the recall number must be measured against a real
reference output, not the in-repo oracle):

  step 1a  jellyfish count -C / dump -L   -> EMULATED exactly (binary absent):
           canonical counting under jellyfish's own base coding
           (A=0 C=1 G=3 T=2, complement = code^2, canonical = min) and
           `>count\nKMER` dump format (reference count_kmers.py:80-123).
           Dump order is lexicographic in the k-mer string — real jellyfish
           dumps in hash order, which only permutes the awk sampling stream
           (a seed-equivalent variation, not a semantic one).
  step 1b  awk Bernoulli sampling          -> the reference's OWN awk script
           text, run through real awk (count_kmers.py:104-123).
  step 1c  seqkit seq -r -p                -> emulated revcomp (header kept).
  step 1d  kmer_searcher                   -> the reference's OWN C++ source,
           compiled unmodified (robin_hood.h stand-in aliases the std
           containers; see robin_hood.h here). threads=1 => deterministic
           output.bin record order.
  step 2   get_precompute_matrix           -> the reference's OWN python
           (fedrann.precompute imported from /root/reference).
  step 3   get_feature_matrix              -> the reference's OWN python
           (fedrann.feature_extraction; unused-import stubs for
           Bio/xxhash/numba/ahocorasick/sharedmem/isal/pysam).
  step 4   pynndescent                     -> EXACT cosine top-k (pynndescent
           absent; NNDescent approximates exactly this target, so recall
           measured against exact neighbors is the stricter comparison).
  output   overlaps.tsv                    -> reference get_output_dataframe
           semantics replicated line for line (__main__.py:261-300).

Artifacts land in bench/golden/data/ (small, committed). Config mirrors the
reference CI workload shape (test/test.sh:10-18): k=15, sample 0.05,
min-mult 2, seed 602.

Usage:  python bench/golden/make_golden.py
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
GOLDEN_DIR = os.path.join(REPO, "bench", "golden")
DATA_DIR = os.path.join(GOLDEN_DIR, "data")
REFERENCE = "/root/reference"

K = 15
SAMPLE_FRACTION = 0.05
MIN_MULTIPLICITY = 2
SEED = 602
N_COMPONENTS = 500           # reference default embedding_dimension
N_NEIGHBORS = 50             # reference default
CHUNK_SIZE = 1000            # reference default
GENOME = 200_000
COVERAGE = 12
READ_LEN = 2500

# jellyfish mer_dna base coding: code = (ascii >> 1) & 3 => A0 C1 G3 T2;
# complement = code ^ 2; canonical = min(mer, revcomp) on the big-endian
# 2-bit packing. (Distinct from the scanner's A0 C1 G2 T3 coding,
# kmer_searcher.cpp:138-151 — the library FILE is strings, so only the
# canonical CHOICE depends on this.)
_JF_CODE = {"A": 0, "C": 1, "T": 2, "G": 3}
_JF_BASE = "ACTG"


def jf_canonical_counts(sequences, k):
    counts = {}
    for seq in sequences:
        s = seq.upper()
        n = len(s)
        code = 0
        rc = 0
        run = 0  # valid bases in current window
        mask = (1 << (2 * k)) - 1
        for i, ch in enumerate(s):
            v = _JF_CODE.get(ch)
            if v is None:
                run = 0
                code = rc = 0
                continue
            code = ((code << 2) | v) & mask
            rc = (rc >> 2) | ((v ^ 2) << (2 * (k - 1)))
            run += 1
            if run >= k:
                canon = min(code, rc)
                counts[canon] = counts.get(canon, 0) + 1
    return counts


def jf_decode(code, k):
    out = []
    for i in range(k):
        out.append(_JF_BASE[(code >> (2 * (k - 1 - i))) & 3])
    return "".join(out)


def revcomp(s):
    return s.translate(str.maketrans("ACGTacgt", "TGCAtgca"))[::-1]


def sha256(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def install_reference_stubs():
    """Import-time stubs for modules fedrann.feature_extraction imports but
    never uses on the code path we call (parse + get_feature_matrix)."""
    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k_, v in attrs.items():
            setattr(m, k_, v)
        sys.modules.setdefault(name, m)
        return m

    bio = mod("Bio")
    bio.SeqIO = mod("Bio.SeqIO")
    mod("xxhash", xxh64=lambda *a, **k: None)
    mod("numba", njit=lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f)))
    mod("ahocorasick", Automaton=object)
    mod("sharedmem")
    mod("isal", igzip=gzip)   # fastx_io.open_gzipped uses igzip.open
    mod("pysam")
    mod("memory_profiler", memory_usage=lambda *a, **k: [])
    mod("pynndescent", NNDescent=object)
    mod("hnswlib")


def main():
    os.makedirs(DATA_DIR, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="golden_")

    # --- input reads ------------------------------------------------------
    from fedrann_tpu.sim import simulate_reads, write_fasta

    sim = simulate_reads(
        genome_length=GENOME, coverage=COVERAGE, mean_read_length=READ_LEN,
        error_rate=0.03, seed=4711,
    )
    reads_fasta = os.path.join(tmp, "reads.fasta")
    write_fasta(reads_fasta, sim.names, sim.sequences)
    print(f"[golden] {len(sim.names)} reads")

    # --- step 1a: jellyfish count -C + dump -L (emulated) -----------------
    counts = jf_canonical_counts(sim.sequences, K)
    dump_path = os.path.join(tmp, "dump.fasta")
    kept = [(jf_decode(c, K), n) for c, n in counts.items()
            if n >= MIN_MULTIPLICITY]
    kept.sort()  # deterministic stand-in for jellyfish's hash order
    with open(dump_path, "w") as f:
        for kmer, n in kept:
            f.write(f">{n}\n{kmer}\n")
    print(f"[golden] {len(kept)} k-mers with count >= {MIN_MULTIPLICITY}")

    # --- step 1b: the reference's awk sampling (count_kmers.py:104-123) ---
    awk_script = r"""
        BEGIN {
            srand(seed);
            skip_prob = 1 - p;
        }
        {
            if (NR % 2 == 1) {
                current_pair = $0;
                next;
            } else {
                current_pair = current_pair ORS $0;
                if (rand() > skip_prob) {
                    print current_pair;
                }
            }
        }
    """
    fwd_lib = os.path.join(tmp, "fwd_kmer_library.fasta")
    with open(dump_path) as fin, open(fwd_lib, "w") as fout:
        subprocess.run(
            ["awk", "-v", f"p={SAMPLE_FRACTION}", "-v", f"seed={SEED}",
             awk_script],
            stdin=fin, stdout=fout, check=True,
        )
    with open(fwd_lib) as f:
        fwd_lines = f.read().splitlines()
    kmer_count = len(fwd_lines) // 2
    n_features = 2 * kmer_count
    print(f"[golden] sampled library: {kmer_count} k-mers")

    # --- step 1c: seqkit seq -r -p (emulated revcomp) ---------------------
    rev_lib = os.path.join(tmp, "rev_kmer_library.fasta")
    with open(rev_lib, "w") as f:
        for i in range(0, len(fwd_lines), 2):
            f.write(fwd_lines[i] + "\n")
            f.write(revcomp(fwd_lines[i + 1]) + "\n")

    # --- step 1d: the reference's own kmer_searcher (compiled) ------------
    searcher = os.path.join(tmp, "kmer_searcher")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{GOLDEN_DIR}", "-o", searcher,
         os.path.join(REFERENCE, "kmer_searcher", "kmer_searcher.cpp"),
         "-pthread"],
        check=True,
    )
    ks_out_dir = os.path.join(tmp, "kmer_searcher_out")
    combined = os.path.join(tmp, "combined_lib.txt")
    with open(combined, "w") as f:
        subprocess.run(
            f"cat {fwd_lib} {rev_lib} | grep -v '^>'",
            shell=True, stdout=f, check=True,
        )
    # threads=1 => deterministic record order in output.bin
    subprocess.run(
        [searcher, combined, reads_fasta, ks_out_dir, str(K), "1"],
        check=True,
    )
    output_bin = os.path.join(ks_out_dir, "output.bin")
    assert os.path.exists(output_bin)

    # --- steps 2+3: the reference's own python ----------------------------
    install_reference_stubs()
    sys.path.insert(0, REFERENCE)
    import fedrann.global_variables as gv

    gv.threads = 1
    gv.seed = SEED
    from fedrann.precompute import get_precompute_matrix
    from fedrann.feature_extraction import get_feature_matrix, get_metadata

    precompute_matrix, nf = get_precompute_matrix(
        n_components=N_COMPONENTS, counter_file=fwd_lib,
        n_features=n_features,
    )
    assert nf == n_features
    emb = get_feature_matrix(
        output_bin, precompute_matrix, n_features, len(sim.names), CHUNK_SIZE
    )
    read_names, strands = get_metadata(output_bin, n_features)
    print(f"[golden] reference embeddings {emb.shape}")

    # --- step 4: exact cosine top-k (pynndescent stand-in) ----------------
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    en = emb / np.where(norms == 0, 1.0, norms)
    scores = en @ en.T
    order = np.argsort(-scores, axis=1, kind="stable")[:, :N_NEIGHBORS]
    dists = 1.0 - np.take_along_axis(scores, order, axis=1)

    # --- output: reference get_output_dataframe (__main__.py:261-300) -----
    import pandas as pd

    rows = {"query_name": [], "query_orientation": [], "target_name": [],
            "target_orientation": [], "neighbor_rank": [], "distance": []}
    for qi in range(order.shape[0]):
        qo = ["+", "-"][strands[qi]]
        for rank, ti in enumerate(order[qi]):
            if ti == qi:
                continue
            rows["query_name"].append(read_names[qi])
            rows["query_orientation"].append(qo)
            rows["target_name"].append(read_names[ti])
            rows["target_orientation"].append(["+", "-"][strands[ti]])
            rows["neighbor_rank"].append(rank)
            rows["distance"].append(dists[qi][rank])
    df = pd.DataFrame(rows)
    overlaps_tsv = os.path.join(tmp, "overlaps.tsv")
    df.to_csv(overlaps_tsv, sep="\t", index=False)

    # --- persist artifacts ------------------------------------------------
    import scipy.sparse as sp

    def gz(src, name):
        dst = os.path.join(DATA_DIR, name)
        with open(src, "rb") as fi, gzip.open(dst, "wb", mtime=0) as fo:
            shutil.copyfileobj(fi, fo)
        return dst

    gz(reads_fasta, "reads.fasta.gz")
    gz(fwd_lib, "fwd_kmer_library.fasta.gz")
    gz(output_bin, "output.bin.gz")
    gz(overlaps_tsv, "overlaps.tsv.gz")
    sp.save_npz(os.path.join(DATA_DIR, "precompute.npz"),
                sp.csr_matrix(precompute_matrix))
    np.save(os.path.join(DATA_DIR, "reference_embeddings.npy"),
            emb.astype(np.float32))
    meta = {
        "config": {"k": K, "sample_fraction": SAMPLE_FRACTION,
                   "min_multiplicity": MIN_MULTIPLICITY, "seed": SEED,
                   "n_components": N_COMPONENTS, "n_neighbors": N_NEIGHBORS,
                   "projection_seed": 2094,
                   "genome": GENOME, "coverage": COVERAGE,
                   "read_len": READ_LEN, "sim_seed": 4711,
                   "n_reads": len(sim.names), "kmer_count": kmer_count},
        "substitutions": {
            "jellyfish": "emulated exactly (canonical counting under "
                         "jellyfish base coding A0 C1 G3 T2; lexicographic "
                         "dump order stands in for hash order)",
            "awk_sampling": "reference's own awk script via real awk",
            "seqkit_revcomp": "emulated",
            "kmer_searcher": "reference C++ source compiled unmodified "
                             "(std-container robin_hood.h stand-in), "
                             "threads=1 for deterministic record order",
            "precompute": "reference python (fedrann.precompute)",
            "feature_matrix": "reference python (fedrann.feature_extraction)",
            "ann": "exact cosine top-k stands in for pynndescent "
                   "(absent); exact search is NNDescent's own target",
        },
        "sha256": {name: sha256(os.path.join(DATA_DIR, name))
                   for name in sorted(os.listdir(DATA_DIR))
                   if name != "metadata.json"},
    }
    with open(os.path.join(DATA_DIR, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    total = sum(os.path.getsize(os.path.join(DATA_DIR, n))
                for n in os.listdir(DATA_DIR))
    print(f"[golden] artifacts in {DATA_DIR} ({total/1e6:.2f} MB)")
    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
