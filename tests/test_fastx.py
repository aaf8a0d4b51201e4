import gzip

import numpy as np
import pytest

from fedrann_tpu.io.fastx import read_fastx, reverse_complement
from fedrann_tpu.io.packing import INVALID, encode_bases, pack_reads
from fedrann_tpu.io.fastx import FastxRecord


def test_reverse_complement():
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("AACCGGTT") == "AACCGGTT"[::-1].translate(
        str.maketrans("ACGT", "TGCA")
    )
    assert reverse_complement("ACGTN") == "NACGT"


def test_fasta_reader(tmp_path):
    p = tmp_path / "x.fasta"
    p.write_text(">r1 some description\nACGT\nACGT\n>r2\nTTTT\n")
    recs = list(read_fastx(str(p)))
    assert [r.name for r in recs] == ["r1", "r2"]
    assert recs[0].sequence == "ACGTACGT"
    assert recs[1].sequence == "TTTT"


def test_fastq_reader_gzipped(tmp_path):
    p = tmp_path / "x.fastq.gz"
    with gzip.open(p, "wt") as f:
        f.write("@r1\nACGTA\n+\nIIIII\n@r2\nGGGC\n+\nIIII\n")
    recs = list(read_fastx(str(p)))
    assert [r.name for r in recs] == ["r1", "r2"]
    assert recs[0].sequence == "ACGTA"
    assert recs[1].sequence == "GGGC"


def test_bad_format(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("hello\n")
    with pytest.raises(ValueError):
        list(read_fastx(str(p)))


def test_encode_bases():
    codes = encode_bases("ACGTacgtNX")
    assert list(codes[:8]) == [0, 1, 2, 3, 0, 1, 2, 3]
    assert codes[8] == INVALID and codes[9] == INVALID


def test_pack_reads_buckets_and_padding():
    recs = [
        FastxRecord("a", "ACGT" * 10),     # 40 -> bucket 64
        FastxRecord("b", "A" * 100),       # 100 -> bucket 128
        FastxRecord("c", "C" * 300),       # 300 -> truncated to 128
        FastxRecord("d", "G" * 8),         # 8 -> bucket 64
    ]
    packed = pack_reads(recs, length_buckets=(64, 128), pad_rows_to=4)
    assert packed.n_reads == 4
    assert packed.n_truncated == 1
    by_len = {b.bases.shape[1]: b for b in packed.buckets}
    assert set(by_len) == {64, 128}
    b64 = by_len[64]
    assert b64.bases.shape[0] % 4 == 0
    assert set(b64.read_index[:2]) == {0, 3}
    # padding rows flagged with read_index -1 and all-INVALID bases
    pad_rows = b64.read_index == -1
    assert np.all(b64.bases[pad_rows] == INVALID)
    b128 = by_len[128]
    row_c = int(np.where(b128.read_index == 2)[0][0])
    assert b128.lengths[row_c] == 128  # truncated
