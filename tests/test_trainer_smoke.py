"""End-to-end training smoke test on a small slice of the toy tRNA set:
two Adam iterations with shuffled negatives must run, improve the
objective direction-wise, and produce a model file the reader can load.
"""
import io
import os

import numpy as np
import pytest

from rnaelem_tpu.io.fastq import FastqReader
from rnaelem_tpu.model import io as MIO
from rnaelem_tpu.model import joint as J
from rnaelem_tpu.train.trainer import Trainer

HERE = os.path.dirname(__file__)
FIX = os.path.join(HERE, "fixtures")


@pytest.fixture(scope="module")
def small_fq(tmp_path_factory):
    # 6 toy reads with flat quality + positive sentinel
    path = tmp_path_factory.mktemp("fq") / "toy.fq"
    from rnaelem_tpu.alphabet import ints_to_seq
    seqs = []
    with open(os.path.join(FIX, "material", "positive.fa")) as f:
        cur = None
        for line in f:
            if line.startswith(">"):
                cur = ""
            else:
                seqs.append(line.strip())
            if len(seqs) >= 6:
                break
    with open(path, "w") as f:
        for i, s in enumerate(seqs[:6]):
            s = s.replace("T", "U")[:72]
            f.write(f"@r{i}\n{s}\n+\n{'+' * len(s)}!\n")
    return str(path)


def test_train_two_iters(small_fq, tmp_path):
    cfg = J.ModelConfig(pattern="(.....)", Lp=72, max_span=50,
                        max_iloop=30, min_bpp=1e-4, tau=0.1,
                        rho_theta=0.1, rho_lambda=0.1, dtype="float64")
    params = J.init_params(J.kernels(cfg).g, cfg, np.float64)
    interim = io.StringIO()
    tr = Trainer(cfg, params, max_iter=2, lambda_init=0.1, batch_size=3,
                 interim_out=interim)
    tr.set_fq(small_fq)
    out = tr.train()
    assert np.isfinite(np.asarray(out.singles)).all()
    assert np.isfinite(np.asarray(out.lam)).all()
    assert (np.asarray(out.lam) >= 0).all()

    # model file roundtrip
    mp = tmp_path / "train.model"
    MIO.write_model(str(mp), cfg, out)
    cfg2, p2 = MIO.read_model(str(mp), Lp=72)
    np.testing.assert_allclose(
        np.asarray(p2.singles), np.asarray(out.singles), rtol=2e-5)
    assert cfg2.pattern == "(.....)"
    assert "interim:" in interim.getvalue() or interim.getvalue() == ""
