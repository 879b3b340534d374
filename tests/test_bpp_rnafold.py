"""Base-pair probabilities vs ViennaRNA RNAfold.

Port of the reference BPP_RNAFOLD test (test-exact.cpp:86-138): the
motif-free pair posteriors on a real 236-nt sequence must match the
RNAfold -p --maxBPspan=50 dot plot (fixture 1.0.ps, RNAfold v2.3.1)
to 1e-5 in log space.  This pins the Turner-2004 energy model and the
McCaskill DP (here: the joint kernel with the 1-state null grammar).
"""
import os

import numpy as np

from rnaelem_tpu.io.fastq import FastqReader
from rnaelem_tpu.model import joint as J

HERE = os.path.dirname(__file__)
FIX = os.path.join(HERE, "fixtures")


def test_bpp_matches_rnafold():
    qr = FastqReader(os.path.join(FIX, "1.fq"))
    read = qr.get_read()
    L = len(read.seq)
    W, C = 50, 30
    cfg = J.ModelConfig(pattern=".", Lp=L, max_span=W, max_iloop=C,
                        min_bpp=0.0, dtype="float64")
    sd = J.make_seqdata(cfg, read.seq)
    z, post, bp0 = J.bpp_posterior(cfg, sd)
    post = np.asarray(post)

    # parse the RNAfold dot plot: lines "i j sqrt(p) ubox", 1-origin
    gold = {}
    with open(os.path.join(FIX, "1.0.ps")) as f:
        for line in f:
            a = line.split()
            if len(a) == 4 and a[3] == "ubox" and not a[0].startswith("%"):
                i, j, sp = int(a[0]), int(a[1]), float(a[2])
                gold[(i - 1, j)] = 2.0 * np.log(sp)

    checked = 0
    for (i, j), lg in gold.items():
        w = j - i
        if w > W:
            continue
        mine = np.log(max(post[j, w], 1e-300))
        assert abs(mine - lg) < 1e-5, ((i, j), mine, lg)
        checked += 1
    assert checked > 100
    # cells RNAfold omits are genuinely tiny (below its 1e-5 cutoff)
    for j in range(1, L + 1):
        for w in range(1, W + 1):
            if (j - w, j) not in gold and post[j, w] > 1e-4:
                raise AssertionError(("extra pair", j - w, j, post[j, w]))
