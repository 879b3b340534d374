"""Batch-minor CYK kernel (ops/dp_maxb.py) against the per-read
reference kernel (ops/dp_max.py, itself pinned to the C++ scanner by
the scan goldens): all 8 inside tables must agree cell-for-cell,
including -inf placement, with the Ys/Ye pin aux tensors applied."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rnaelem_tpu.model import joint as J
from rnaelem_tpu.ops import dp_maxb as DMB
from rnaelem_tpu.scan import cyk as CYK
from rnaelem_tpu.scan.scanner import state_masks
from rnaelem_tpu.alphabet import seq_to_ints

TABLE_NAMES = ("LL", "P", "E", "M", "B", "T1", "T2", "O")


def _reads(cfg, n, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        L = cfg.Lp - 2 - (i % 3)
        s = "".join("ACGU"[c] for c in rng.randint(0, 4, L))
        q = np.full(L + 1, 10)
        q[-1] = 0
        out.append(J.make_seqdata(cfg, seq_to_ints(s), q))
    return out


def _compare(cfg, sds, Ys, Ye):
    k = J.kernels(cfg)
    params = J.init_params(k.g, cfg, jnp.dtype(cfg.dtype))
    params = params._replace(
        lam=jnp.asarray([0.7, 1.3], jnp.dtype(cfg.dtype)))
    m = state_masks(cfg)
    dtype = jnp.dtype(cfg.dtype)

    # per-read reference kernel
    ref_tabs = []
    for t, sd in enumerate(sds):
        bp_ok, _ = J._effective_bp_mask_jit(cfg, sd)
        aux = CYK._pin_aux(cfg, k.g, m, Ys[t], Ye[t], sd.L, dtype)
        d, c = J.factors(cfg, params, sd, bp_ok, aux)
        ref_tabs.append([np.asarray(x)
                         for x in CYK._cyk_kernel(cfg)(d, c)])

    # batch-minor kernel on the same pins
    sd_b = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *sds)
    bp_b, _ = J._effective_bp_mask_batch_jit(cfg, sd_b)
    aux_b = jax.vmap(
        lambda ys, ye, L: CYK._pin_aux(cfg, k.g, m, ys, ye, L, dtype)
    )(jnp.asarray(Ys), jnp.asarray(Ye), sd_b.L)
    d_b, c_b = J.batch_factors(cfg, params, sd_b, bp_b, aux_b)
    tables_fn, _ = DMB.build_max_tables(k.g, k.dims, k.tab, dtype)
    new = tables_fn(d_b, c_b)

    for name, ref_i, new_t in zip(
            TABLE_NAMES, zip(*ref_tabs), new):
        got = np.moveaxis(np.asarray(new_t), -1, 0)   # [B, rows, ...]
        want = np.stack(ref_i)
        fin_g, fin_w = np.isfinite(got), np.isfinite(want)
        np.testing.assert_array_equal(fin_g, fin_w, err_msg=name)
        np.testing.assert_allclose(
            got[fin_g], want[fin_w], rtol=2e-5, atol=2e-5,
            err_msg=name)


@pytest.mark.parametrize("pattern", ["(.....)", "((..).)", "(.*)"])
def test_tables_match_per_read_kernel(pattern):
    cfg = J.ModelConfig(pattern=pattern, Lp=24, max_span=20,
                        max_iloop=8, min_bpp=1e-4, tau=0.1,
                        with_aux=True, theta_softmax=False,
                        dtype="float64")
    sds = _reads(cfg, 3)
    Ys = [2, 0, 5]
    Ye = [10, 8, int(sds[2].L)]
    _compare(cfg, sds, Ys, Ye)


def test_marks_match_host_traceback():
    """The cotangent-mark path extraction must reproduce the exact
    table-based host traceback (psihat + rss) read for read; reads the
    device flags as tied fall back to that traceback anyway."""
    cfg = J.ModelConfig(pattern="(.....)", Lp=32, max_span=28,
                        max_iloop=10, min_bpp=1e-4, tau=0.1,
                        with_aux=True, dtype="float64")
    k = J.kernels(cfg)
    rng = np.random.RandomState(7)
    params = J.init_params(k.g, cfg, jnp.float64)
    # tie-breaking noise: distinct theta everywhere
    params = params._replace(
        singles=params.singles + 0.1 * rng.randn(*params.singles.shape),
        pairs=params.pairs + 0.1 * rng.randn(*params.pairs.shape),
        lam=jnp.asarray([0.8, 1.2], jnp.float64))
    sds = _reads(cfg, 4, seed=11)
    Ys = np.array([2, 0, 5, 1])
    Ye = np.array([12, 10, int(sds[2].L), 14])
    sd_b = jax.tree.map(lambda *xs: np.stack(xs), *sds)
    res = CYK.cyk_batch_finish(
        cfg, CYK.cyk_batch_start(cfg, params, sd_b, Ys, Ye), 4)
    n_marked = 0
    for t, (path, rss) in enumerate(res):
        want_path, want_rss = CYK.viterbi_alignment(
            cfg, params, sds[t], int(Ys[t]), int(Ye[t]))
        L = int(sds[t].L)
        np.testing.assert_array_equal(path[:L], want_path[:L])
        assert rss == want_rss, t
        n_marked += 1
    assert n_marked == 4


def test_rss_from_pairs_classes():
    """Nesting classification: hairpin, bulge, internal, multiloop,
    exterior — matches the traceback's struct letters."""
    # pair span (0,10) with child (3,8): both gaps > 0 -> I
    rss = CYK.rss_from_pairs([(10, 10), (8, 5)], 12)
    assert rss == "LIILHHHRIROO"
    # child flush left (empty left gap) -> bulge
    rss = CYK.rss_from_pairs([(10, 10), (8, 7)], 10)
    assert rss == "LLHHHHHRBR"
    # two children -> M
    rss = CYK.rss_from_pairs([(12, 12), (5, 4), (10, 4)], 12)
    assert rss == "LLHHRMLHHRMR"


def test_tables_match_no_ene():
    cfg = J.ModelConfig(pattern="(...)", Lp=20, max_span=16,
                        max_iloop=6, min_bpp=0.0, tau=0.1,
                        with_aux=True, no_ene=True, dtype="float64")
    sds = _reads(cfg, 2, seed=3)
    _compare(cfg, sds, [1, 3], [9, 11])
