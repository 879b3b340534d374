"""Native extension: build must succeed (a broken build is a failure,
not a skip); k-let shuffle preserves k-let counts and matches the Python
implementation's contract; FASTQ indexer parses records; the product
paths (negative_for, FastqReader) actually route through it."""
import collections
import ctypes

import numpy as np
import pytest

from rnaelem_tpu.native import (lib, klet_shuffle_native,
                                fastq_index_native)
from rnaelem_tpu.pipeline.ushuffle import klet_shuffle, negative_for


def klets(s, k):
    return collections.Counter(s[i:i + k] for i in range(len(s) - k + 1))


def test_native_builds():
    assert lib() is not None, "native module failed to build"


@pytest.mark.parametrize("k", [2, 3])
def test_native_klet_shuffle(k):
    assert lib() is not None
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


def test_negative_for_uses_native():
    s = "ACGUACGGUUCAGCAUGCUAGCAUCGAUGCAUGCAUGGCA"
    neg = negative_for(s, 2, 3)
    assert klets(neg, 2) == klets(s, 2)
    # determinism + routing through the native stream
    assert neg == negative_for(s, 2, 3)
    seed = (s.count(s[0]) + 3) & 0x7FFFFFFF
    assert neg == klet_shuffle_native(s, 2, seed)


def test_fastq_index():
    assert lib() is not None
    data = b"@r1\nACGU\n+\n!!!!\n@r2\nGG\n+\n##\n"
    out = (ctypes.c_int64 * (6 * 4))()
    n = lib().fastq_index(data, len(data), out, 4)
    assert n == 2
    assert data[out[2]:out[2] + out[3]] == b"ACGU"
    assert data[out[6 * 1 + 2]:out[6 * 1 + 2] + out[6 * 1 + 3]] == b"GG"


def test_fastq_index_native_wrapper(tmp_path):
    from rnaelem_tpu.io.fastq import FastqReader
    data = b"@a\nACGU\n+\n!I5!\n@b\nGGAU\n+\n!!!!\n"
    assert fastq_index_native(data) is not None
    p = tmp_path / "t.fq"
    p.write_bytes(data)
    qr = FastqReader(str(p))
    assert qr.N() == 2
    r = qr.get_read()
    assert r.id == "@a"
    assert list(r.seq) == [1, 2, 3, 4]
    assert list(r.qual) == [0, 40, 20, 0]
