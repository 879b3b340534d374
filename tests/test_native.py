"""Native extension: k-let shuffle preserves k-let counts, matches the
Python implementation's contract; FASTQ indexer parses records."""
import collections
import ctypes

import numpy as np
import pytest

from rnaelem_tpu.native import lib, klet_shuffle_native
from rnaelem_tpu.pipeline.ushuffle import klet_shuffle


def klets(s, k):
    return collections.Counter(s[i:i + k] for i in range(len(s) - k + 1))


@pytest.mark.parametrize("k", [2, 3])
def test_native_klet_shuffle(k):
    if lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(1)
    for trial in range(5):
        s = "".join(rng.choice(list("ACGU")) for _ in range(60))
        out = klet_shuffle_native(s, k, seed=trial)
        assert out is not None and len(out) == len(s)
        assert klets(out, k) == klets(s, k), (s, out)
        assert out[0] == s[0] and out[-1] == s[-1]


@pytest.mark.parametrize("k", [1, 2, 3])
def test_python_klet_shuffle(k):
    rng = np.random.RandomState(0)
    for trial in range(5):
        s = "".join(rng.choice(list("ACGU")) for _ in range(50))
        out = klet_shuffle(s, k, np.random.RandomState(trial))
        assert sorted(out) == sorted(s)
        if k >= 2:
            assert klets(out, k) == klets(s, k)


def test_fastq_index():
    if lib() is None:
        pytest.skip("native lib unavailable")
    data = b"@r1\nACGU\n+\n!!!!\n@r2\nGG\n+\n##\n"
    out = (ctypes.c_int64 * (6 * 4))()
    n = lib().fastq_index(data, len(data), out, 4)
    assert n == 2
    assert data[out[2]:out[2] + out[3]] == b"ACGU"
    assert data[out[6 * 1 + 2]:out[6 * 1 + 2] + out[6 * 1 + 3]] == b"GG"
