"""The factorized internal-loop reconstruction used by the max/CYK
kernel (ops/dp_max.py il_factorized: per-sequence misA/misB/spec_il
tables + static class size matrices) must reproduce
energy.tables.iloop_scores exactly for random sequences — including
the per-read C cap and fix_rss flank gating.  The host traceback's
numpy twin (scan/cyk._il_np) is held to the same oracle.

(The scan goldens pin this indirectly on the fixture models; this test
sweeps random sequences and the fix_rss branch the goldens don't
reach.)"""
import numpy as np
import pytest

import jax.numpy as jnp

from rnaelem_tpu.energy.tables import iloop_scores
from rnaelem_tpu.model import joint as J
from rnaelem_tpu.ops import ep_fast as EPF
from rnaelem_tpu.scan.cyk import _il_np, _tab_np


def _setup(fix_rss=False):
    cfg = J.ModelConfig(pattern="(...)", Lp=48, max_span=20,
                        max_iloop=12, min_bpp=0.0, tau=0.1,
                        dtype="float64", fix_rss=fix_rss)
    k = J.kernels(cfg)
    return cfg, k


def _reconstruct(cfg, k, seq, C, dcum=None):
    """il[w, dk, dl] per column from the factorized tables — the same
    construction as dp_max.il_factorized, in numpy."""
    Lp, Wp, Cp = cfg.Lp, cfg.Wp, cfg.Cp
    ept = {kk: np.asarray(v) for kk, v in EPF.seq_tables(
        k.tab, jnp.asarray(seq), Lp, Wp, False, jnp.float64).items()}
    energy_np = {kk: np.asarray(v) for kk, v in k.tab.items()
                 if kk in ("internal", "ninio", "bulge")}
    est = EPF.build_ep_static(k.g, Cp, energy_np, False)
    SZ, grp = np.asarray(est.SZ), est.grp
    w3 = np.arange(Wp + 1)[:, None, None]
    dk3 = np.arange(Cp + 1)[None, :, None]
    dl3 = np.arange(Cp + 1)[None, None, :]
    vc3 = np.clip(w3 - dk3 - dl3, 0, Wp)
    geom = (dk3 + dl3 >= 1) & (w3 - dk3 - dl3 >= 0)
    SPECS = ((0, 1), (1, 0), (1, 1), (1, 2), (2, 1), (2, 2))

    def one(j):
        mA = ept["misA"][:, j]
        rows = np.clip(np.arange(j - Cp, j + 1), -1, Lp)
        mB = np.where((rows >= 0)[None, :, None],
                      ept["misB"][:, np.clip(rows, 0, Lp)],
                      -np.inf)[:, ::-1]           # [4, dl, v]
        valid = geom & (dk3 + dl3 <= C) & (w3 <= j)
        if dcum is not None:
            i3 = j - w3
            hi = len(dcum) - 1
            ld = (dcum[np.clip(i3 + dk3, 0, hi)]
                  - dcum[np.clip(i3, 0, hi)]) == dk3
            rd = (dcum[j] - dcum[np.clip(j - np.arange(Cp + 1), 0, hi)]
                  ) == np.arange(Cp + 1)
            valid = valid & ld & rd[None, None, :]
        il = np.full((Wp + 1, Cp + 1, Cp + 1), -np.inf)
        flat_idx = np.broadcast_to(dl3, vc3.shape) * (Wp + 1) + vc3
        for x in range(SZ.shape[0]):
            gx = int(grp[x])
            mBv = mB[gx].reshape(-1)[flat_idx]
            il = np.maximum(il, SZ[x][None] + mA[gx][:, None, None]
                            + mBv)
        for ci, (dk0, dl0) in enumerate(SPECS):
            il[:, dk0, dl0] = ept["spec_il"][ci, j]
        return np.where(valid, il, -np.inf)

    return one


@pytest.mark.parametrize("fix_rss", [False, True])
def test_factorized_il_matches_iloop_scores(fix_rss):
    cfg, k = _setup(fix_rss)
    rng = np.random.RandomState(42)
    for trial in range(3):
        seq = rng.randint(1, 5, cfg.Lp)
        C = [12, 7, 12][trial]
        dcum = None
        if fix_rss:
            dots = rng.randint(0, 2, cfg.Lp)
            dcum = np.concatenate([[0], np.cumsum(dots)])
        recon = _reconstruct(cfg, k, seq, C, dcum)
        for j in [1, 5, 17, 30, cfg.Lp]:
            ref = np.asarray(iloop_scores(
                k.tab, jnp.asarray(seq), j, cfg.Wp, cfg.Cp, C, False,
                jnp.asarray(dcum) if dcum is not None else None))
            # iloop_scores does not gate w <= j or spec validity the
            # same way at out-of-band cells the kernel masks later;
            # compare only in-band cells
            w3 = np.arange(cfg.Wp + 1)[:, None, None]
            inband = (w3 <= j) & np.isfinite(ref)
            got = recon(j)
            np.testing.assert_allclose(
                np.where(inband, got, -np.inf),
                np.where(inband, ref, -np.inf), rtol=1e-12,
                err_msg=f"fix_rss={fix_rss} j={j} trial={trial}")
            # and cells the reconstruction keeps must be a subset of
            # the oracle's finite cells (no spurious energies)
            assert not (np.isfinite(got) & ~np.isfinite(ref)
                        & (w3 <= j)).any()


def test_il_np_matches_iloop_scores():
    cfg, k = _setup(False)
    tabn = _tab_np(cfg)
    rng = np.random.RandomState(7)
    seq = rng.randint(1, 5, cfg.Lp)
    for j in [3, 11, 29, cfg.Lp]:
        ref = np.asarray(iloop_scores(
            k.tab, jnp.asarray(seq), j, cfg.Wp, cfg.Cp, 12, False))
        got = _il_np(tabn, seq, j, cfg.Wp, cfg.Cp, 12, False)
        np.testing.assert_allclose(got, ref, rtol=1e-12)
