"""Scanner parity vs golden scan.raw from the reference binary
(tests/golden/scan_{0,1}.raw = RNAelem scan with 0/1.model on 0.fq).

Posteriors (start/end/inner), motif region, exist prob and the Viterbi
state/structure strings must match; numeric lines are compared at the
printed precision with a small tolerance.
"""
import io
import os

import numpy as np
import pytest

from rnaelem_tpu.model import io as MIO
from rnaelem_tpu.scan.driver import Scanner

HERE = os.path.dirname(__file__)
FIX = os.path.join(HERE, "fixtures")
GOLD = os.path.join(HERE, "golden")


def parse_raw(text):
    recs = []
    lines = [l for l in text.strip().splitlines() if l.strip()]
    for k in range(0, len(lines), 10):
        rec = {}
        for line in lines[k:k + 10]:
            key, val = line.split(": ", 1) if ": " in line \
                else (line[:-1], "")
            rec[key] = val
        recs.append(rec)
    return recs


def vec(s):
    return np.array([float(v) for v in
                     s.strip()[1:-1].split(",") if v])


@pytest.mark.parametrize("x", ["0", "1", "2", "3"])
def test_scan_matches_reference(x):
    cfg, params = MIO.read_model(os.path.join(FIX, f"{x}.model"), Lp=45)
    buf = io.StringIO()
    log = io.StringIO()
    Scanner(cfg, params).scan(os.path.join(FIX, "0.fq"), buf, log=log)
    mine = parse_raw(buf.getvalue())
    with open(os.path.join(GOLD, f"scan_{x}.raw")) as f:
        gold = parse_raw(f.read())
    assert len(mine) == len(gold) == 2
    for m, g in zip(mine, gold):
        assert m["id"] == g["id"]
        for key, tol in (("start", 2e-4), ("end", 2e-4), ("inner", 2e-4)):
            a, b = vec(m[key]), vec(g[key])
            assert a.shape == b.shape, (key, m["id"])
            both = np.isfinite(a) & np.isfinite(b)
            assert (np.isfinite(a) == np.isfinite(b)).all(), key
            np.testing.assert_allclose(a[both], b[both], atol=tol,
                                       rtol=1e-3, err_msg=key)
        assert m["motif region"] == g["motif region"], m["id"]
        assert float(m["exist prob"]) == pytest.approx(
            float(g["exist prob"]), abs=1e-3)
        assert m["seq"] == g["seq"]
        if m["psihat"] != g["psihat"]:
            # tie-breaks may differ between argmax orders; both paths
            # must then score identically under the model
            sa = _chain_path_score(cfg, params, m["seq"],
                                   vecint(m["psihat"]))
            sb = _chain_path_score(cfg, params, g["seq"],
                                   vecint(g["psihat"]))
            assert sa == pytest.approx(sb, abs=1e-9), m["id"]
        assert m["rss"] == g["rss"], m["id"]
        assert m["mot"] == g["mot"], m["id"]
    assert "E[N]:" in log.getvalue()


def vecint(s):
    return [int(v) for v in s.strip()[1:-1].split(",") if v]


def _chain_path_score(cfg, params, seq, path):
    """Score a no-rss motif state path (forward chain semantics)."""
    from rnaelem_tpu.model import joint as J
    from rnaelem_tpu.alphabet import seq_to_ints
    g = J.kernels(cfg).g
    th = J.effective_theta(cfg, params)
    singles = np.asarray(th.singles)
    codes = seq_to_ints(seq)
    total = 0.0
    prev = 0
    for p, node in enumerate(path):
        node = int(node)
        tid = g.theta_id[node]
        if tid >= 0 and codes[p] > 0:
            slot = g.single_table_index[tid]
            total += singles[slot][codes[p] - 1]
        if node == prev and g.nodes[node] == ".":
            total += np.log(cfg.tau)
        prev = node
    return total
