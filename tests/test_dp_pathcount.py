"""Path-count oracles for the joint DP, ported from the reference
combinatorial tests (RNAelem-test/test.cpp:88-203).

With emissions pinned to 1 (no_theta), energies off (no_ene), the
structure fixed (fix_rss) and the hairpin turn disabled, the joint
partition function equals the integer number of motif-alignment parse
paths, and expected emission counts are exact integers.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnaelem_tpu.alphabet import seq_to_ints
from rnaelem_tpu.model import joint as J

LP = 16


def make_cfg(pattern):
    return J.ModelConfig(
        pattern=pattern, Lp=LP, max_span=LP, max_iloop=LP,
        min_bpp=0.0, turn=0, no_ene=True, no_theta=True, fix_rss=True,
        tau=1.0, dtype="float64")


def run_case(cfg, seq, rss):
    sd = J.make_seqdata(cfg, seq_to_ints(seq), None, rss)
    params = J.init_params(J.kernels(cfg).g, cfg, jnp.float64)
    parts = J.logZ_parts(cfg, params, sd)
    return float(np.exp(J.part_func(parts)))


CASES = [
    (".", "A", ".", 2),
    (".", "AA", "..", 4),
    (".", "CAAAG", "(...)", 7),
    (".", "ACAAAGA", ".(...).", 9),
    (".", "ACACAAAGGA", ".(.(...)).", 10),
    (".", "ACACAGACAGAAGA", ".(.(.).(.)..).", 10),
    (".", "CACAGAG", "(.(.).)", 4),
    ("(.)", "CAAAG", "(...)", 2),
    ("(.)", "CCAAAGG", "((...))", 3),
    ("(.*)", "CAAAG", "(...)", 4),
    ("(.*)", "CCAAAGG", "((...))", 7),
    (".*.", "AA", "..", 2),
    (".*.", "CAAAG", "(...)", 6),
    ("(.).(.)", "CAGACAG", "(.).(.)", 2),
    ("(.).(.)", "CCAGACAGG", "((.).(.))", 2),
    ("(.)*(.)", "CAGCAG", "(.)(.)", 2),
    ("(.)*(.)", "CCAGCAGG", "((.)(.))", 2),
]


@pytest.mark.parametrize("pattern,seq,rss,count", CASES)
def test_path_count(pattern, seq, rss, count):
    cfg = make_cfg(pattern)
    got = run_case(cfg, seq, rss)
    assert got == pytest.approx(count, rel=1e-9), (pattern, seq, rss)


EC_CASES = [
    (".", "A", ".", [[1, 0, 0, 0], [1, 0, 0, 0]]),
    (".", "CAG", "(.)", [[1, 2, 2, 0], [1, 0, 0, 0]]),
    (".", "CACGG", "(...)", [[4, 10, 11, 0], [3, 4, 3, 0]]),
    (".", "CAGAU", "(.)..", [[7, 5, 5, 3], [3, 0, 0, 2]]),
]


@pytest.mark.parametrize("seq,rss,expect", [c[1:] for c in EC_CASES])
def test_emission_counts(seq, rss, expect):
    cfg = make_cfg(".")
    sd = J.make_seqdata(cfg, seq_to_ints(seq), None, rss)
    g = J.kernels(cfg).g
    params = J.init_params(g, cfg, jnp.float64)

    def z(p):
        return J.part_func(J.logZ_parts(cfg, p, sd))

    zval, grads = jax.value_and_grad(z)(params)
    # unnormalized expected counts EN = Z * dlogZ/dtheta
    # (RNAelemDP::dp uses ZL = oneL, motif_test.hpp:23-32)
    en = np.exp(float(zval)) * np.asarray(grads.singles)
    want = np.asarray(expect, dtype=float)
    np.testing.assert_allclose(en, want, atol=1e-6)
