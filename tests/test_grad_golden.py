"""fn/gradient parity against the reference binary.

Golden values in tests/golden/eval_{0..3}.{fn,gr} were produced by the
reference's eval path (motif_eval.hpp, TR_NORMAL|TR_NO_SHUFFLE) on the
RNAelem-test fixtures 0-3.model x 0.fq — the same fixtures its own
MACHINE_DIFF_GR finite-difference test uses (test-exact.cpp:54-84), so
matching them validates inside+outside+expected-counts as the exact
gradient of the objective.
"""
import os

import numpy as np
import pytest

from rnaelem_tpu.model import io as MIO
from rnaelem_tpu.train.objective import eval_file

HERE = os.path.dirname(__file__)
FIX = os.path.join(HERE, "fixtures")
GOLD = os.path.join(HERE, "golden")

LP = 48


def load_golden(x):
    with open(os.path.join(GOLD, f"eval_{x}.fn")) as f:
        fn = float(f.read().split(":")[1])
    with open(os.path.join(GOLD, f"eval_{x}.gr")) as f:
        s = f.read()
        gr = np.array([float(v) for v in
                       s[s.find("[") + 1: s.rfind("]")].split(",")])
    return fn, gr


@pytest.mark.parametrize("x", ["0", "1", "2", "3"])
def test_fn_gr_matches_reference(x):
    fn_g, gr_g = load_golden(x)
    cfg, params = MIO.read_model(os.path.join(FIX, f"{x}.model"), Lp=LP)
    fn, gr, eff = eval_file(cfg, params, os.path.join(FIX, "0.fq"))
    assert fn == pytest.approx(fn_g, abs=1e-6), f"fn mismatch model {x}"
    np.testing.assert_allclose(gr, gr_g, atol=1e-6,
                               err_msg=f"gradient mismatch model {x}")
