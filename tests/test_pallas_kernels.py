"""Pallas codec kernel (bench/pallas_kernels.py, BENCH-ONLY) vs the XLA
path (interpret mode on CPU)."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench"))

from fedrann_tpu.kmers.codec import canonical_window_codes, sample_hash32
from pallas_kernels import canonical_and_sample


@pytest.mark.parametrize("k", [5, 15, 16])
def test_pallas_codec_matches_xla(k):
    rng = np.random.default_rng(60)
    bases = rng.integers(0, 4, size=(16, 256)).astype(np.uint8)
    bases[rng.random(bases.shape) < 0.02] = 4
    seed, frac = 602, 0.3
    threshold = np.uint32(int(frac * 2**32))

    canon_p, keep_p = canonical_and_sample(
        jnp.asarray(bases), k, seed, int(threshold), interpret=True
    )
    canon_p, keep_p = np.asarray(canon_p), np.asarray(keep_p).astype(bool)

    canon_x, _, valid_x = canonical_window_codes(jnp.asarray(bases), k)
    canon_x = np.asarray(canon_x[0])
    valid_x = np.asarray(valid_x)
    hash_x = np.asarray(sample_hash32((jnp.asarray(canon_x),), seed))
    keep_x = valid_x & (hash_x < threshold)

    w = bases.shape[1] - k + 1
    assert np.array_equal(canon_p[:, :w], np.where(valid_x, canon_x, 0xFFFFFFFF))
    assert np.array_equal(keep_p[:, :w], keep_x)
    # trailing k-1 columns always invalid
    assert np.all(canon_p[:, w:] == 0xFFFFFFFF)
    assert not np.any(keep_p[:, w:])


def test_pallas_codec_keep_all():
    rng = np.random.default_rng(61)
    bases = rng.integers(0, 4, size=(8, 128)).astype(np.uint8)
    canon_p, keep_p = canonical_and_sample(
        jnp.asarray(bases), 11, 1, 0, keep_all=True, interpret=True
    )
    w = 128 - 11 + 1
    assert np.all(np.asarray(keep_p).astype(bool)[:, :w])


def test_pallas_codec_rejects_two_word():
    with pytest.raises(ValueError):
        canonical_and_sample(jnp.zeros((8, 64), jnp.uint8), 21, 0, 0)
