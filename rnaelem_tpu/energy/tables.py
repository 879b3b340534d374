"""Per-sequence energy factor tensors for the banded DP kernels.

Turns the parsed parameter arrays (params.py) plus an encoded sequence into
the [Lp+1, Wp+1] log-score tensors the kernels consume, replicating the
reference scoring functions:

* ``hairpin_scores``  <- hairpin_energy (energy_param.hpp:710-742)
* ``stack_scores``    <- loop_energy stack case for TT_P_P
  (energy_model.hpp:350-355)
* ``ext_scores`` / ``ml2_scores`` / ``mlE_scores`` <- sum_ext_m
  (energy_param.hpp:686-708) with the mlintern/mlclosing combinations of
  energy_model.hpp:371-405
* ``iloop_scores``    <- loop_energy bulge/internal cases for TT_E_P
  (energy_param.hpp:744-795), evaluated per DP column on the fly.

Cell conventions: a (j, w) cell covers the half-open span (i, j) with
i = j - w over bases i..j-1; ``pair(j, w)`` refers to the base pair
(i, j-1) (energy_model.hpp band tables _bp_ok[i][j-i]).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..alphabet import BP
from . import params as P

MAXLOOP = P.MAXLOOP
NEG = -jnp.inf


def _encode_loopstr(s: str) -> int:
    code = {"A": 1, "C": 2, "G": 3, "U": 4}
    key = 0
    for k, ch in enumerate(s):
        key += code[ch] * (5 ** k)
    return key


@functools.lru_cache(maxsize=4)
def _device_tables_cached(name: str, dtype_str: str):
    ep = P.load(name)
    return _build_device_tables(ep, jnp.dtype(dtype_str))


def _build_device_tables(ep: P.EnergyParams, dtype):
    tri = np.full(5 ** 5, -np.inf)
    for s, v in ep.triloops.items():
        tri[_encode_loopstr(s)] = v
    tetra = np.full(5 ** 6, -np.inf)
    for s, v in ep.tetraloops.items():
        tetra[_encode_loopstr(s)] = v
    hexa = np.full(5 ** 8, -np.inf)
    for s, v in ep.hexaloops.items():
        hexa[_encode_loopstr(s)] = v
    f = lambda a: jnp.asarray(a, dtype=dtype)
    return dict(
        stack=f(ep.stack), hairpin=f(ep.hairpin), bulge=f(ep.bulge),
        internal=f(ep.internal), ninio=f(ep.ninio),
        mismatch_h=f(ep.mismatch_h), mismatch_i=f(ep.mismatch_i),
        mismatch_1n=f(ep.mismatch_1n), mismatch_23=f(ep.mismatch_23),
        mismatch_m=f(ep.mismatch_m), mismatch_e=f(ep.mismatch_e),
        dangle5=f(ep.dangle5), dangle3=f(ep.dangle3),
        int11=f(ep.int11), int21=f(ep.int21), int22=f(ep.int22),
        tri=f(tri), tetra=f(tetra), hexa=f(hexa),
        term_au=jnp.asarray(ep.term_au, dtype),
        mlintern=jnp.asarray(ep.mlintern, dtype),
        mlclosing=jnp.asarray(ep.mlclosing, dtype),
        lxc=jnp.asarray(ep.lxc, dtype),
        bp=jnp.asarray(BP),
    )


def device_tables(name: str, dtype=jnp.float32):
    return _device_tables_cached(name, jnp.dtype(dtype).name)


def _pair_type(tab, a, b):
    return tab["bp"][a, b]


def _sgather(seq, idx):
    """seq[idx] with clipping (masked out-of-range reads give base N=0,
    callers gate validity separately)."""
    return seq[jnp.clip(idx, 0, seq.shape[0] - 1)]


def band_grids(Lp: int, Wp: int):
    j = jnp.arange(Lp + 1)[:, None]
    w = jnp.arange(Wp + 1)[None, :]
    return j, w


def pair_mask_jw(tab, seq, L, W, Wp: int, turn: int):
    """bp_ok from complementarity + band + hairpin turn
    (energy_model.hpp:211-218): mask[j, w] <=> pair (i=j-w, j-1)
    allowed."""
    Lp = seq.shape[0]
    j = jnp.arange(Lp + 1)[:, None]
    w = jnp.arange(Wp + 1)[None, :]
    i = j - w
    wmin = 1 if turn == 0 else turn + 2
    t = _pair_type(tab, _sgather(seq, i), _sgather(seq, j - 1))
    ok = (i >= 0) & (w >= wmin) & (j <= L) & (w <= W) & (t > 0)
    return ok


def left_pair_cum(bp_jw, Lp: int, Wp: int):
    """left_bp_ok (energy_model.hpp:203-209): in (i, w) layout, cumulative
    OR over w; returned in (j, w) layout."""
    j = jnp.arange(Lp + 1)[:, None]
    w = jnp.arange(Wp + 1)[None, :]
    i = jnp.clip(j - w, 0, Lp)
    # convert (j,w) -> (i,w): arr_iw[i, w] = bp_jw[i + w, w]
    iw_rows = jnp.clip(jnp.arange(Lp + 1)[:, None] + w, 0, Lp)
    bp_iw = bp_jw[iw_rows, w] & (jnp.arange(Lp + 1)[:, None] + w <= Lp)
    cum_iw = jnp.cumsum(bp_iw.astype(jnp.int32), axis=1) > 0
    return cum_iw[i, w] & (j - w >= 0)


def hairpin_scores(tab, seq, L, W, Wp: int, no_ene):
    """hp[j, w] = hairpin_energy(i-1, j, seq) for the E(i, j) cell:
    closing pair (i-1, j), loop bases i..j-1, d = w."""
    Lp = seq.shape[0]
    j = jnp.arange(Lp + 1)[:, None]
    w = jnp.arange(Wp + 1)[None, :]
    i = j - w
    d = w
    t = _pair_type(tab, _sgather(seq, i - 1), _sgather(seq, j))
    hp_base = jnp.where(
        d <= MAXLOOP,
        tab["hairpin"][jnp.clip(d, 0, MAXLOOP)],
        tab["hairpin"][MAXLOOP]
        - tab["lxc"] * jnp.log(jnp.maximum(d, 1) / MAXLOOP) * 10.0 / P.KT,
    )
    au = jnp.where(t > 2, tab["term_au"], 0.0)
    mish = tab["mismatch_h"][t, _sgather(seq, i), _sgather(seq, j - 1)]

    # special loops: window = bases i-1 .. j (d+2 long), little-endian key
    def window_key(nbases):
        key = jnp.zeros_like(j + w)
        for k in range(nbases):
            key = key + _sgather(seq, i - 1 + k) * (5 ** k)
        return key

    tri_v = tab["tri"][jnp.clip(window_key(5), 0, 5 ** 5 - 1)]
    tetra_v = tab["tetra"][jnp.clip(window_key(6), 0, 5 ** 6 - 1)]
    hexa_v = tab["hexa"][jnp.clip(window_key(8), 0, 5 ** 8 - 1)]

    z = hp_base
    # d == 3: triloop hit -> replace; miss -> +term_au if AU; no mismatch
    z3 = jnp.where(jnp.isfinite(tri_v), tri_v, hp_base + au)
    # d == 4: tetraloop hit -> replace; else mismatch
    z4 = jnp.where(jnp.isfinite(tetra_v), tetra_v, hp_base + mish)
    # d == 6: hexaloop hit -> replace; else mismatch
    z6 = jnp.where(jnp.isfinite(hexa_v), hexa_v, hp_base + mish)
    zother = jnp.where(d > 3, hp_base + mish, hp_base)
    hp = jnp.where(d == 3, z3,
                   jnp.where(d == 4, z4,
                             jnp.where(d == 6, z6, zother)))
    hp = jnp.where(d < 1, NEG, hp)
    if no_ene:
        hp = jnp.zeros_like(hp)
    return hp


def stack_scores(tab, seq, Wp: int, no_ene):
    """stk[j, w] = loop_energy(i, j-1, i+1, j-2): stack of pair (i, j-1)
    on inner pair (i+1, j-2), used by TT_P_P."""
    Lp = seq.shape[0]
    j = jnp.arange(Lp + 1)[:, None]
    w = jnp.arange(Wp + 1)[None, :]
    i = j - w
    t = _pair_type(tab, _sgather(seq, i), _sgather(seq, j - 1))
    t2 = _pair_type(tab, _sgather(seq, j - 2), _sgather(seq, i + 1))
    stk = tab["stack"][t, t2]
    if no_ene:
        stk = jnp.zeros_like(stk)
    return stk


def _sum_ext_m(tab, seq, L, ii, jj, ext: bool):
    """sum_ext_m(ii, jj, ext) for pair (seq[ii], seq[jj]) with dangling
    neighbors seq[ii-1] / seq[jj+1] (energy_param.hpp:686-708)."""
    t = _pair_type(tab, _sgather(seq, ii), _sgather(seq, jj))
    five_ok = ii - 1 >= 0
    three_ok = jj + 1 < L
    five = _sgather(seq, ii - 1)
    three = _sgather(seq, jj + 1)
    mm = tab["mismatch_e"] if ext else tab["mismatch_m"]
    both = mm[t, five, three]
    d5 = jnp.where(five_ok, tab["dangle5"][t, five], 0.0)
    d3 = jnp.where(three_ok, tab["dangle3"][t, three], 0.0)
    z = jnp.where(five_ok & three_ok, both, d5 + d3)
    z = z + jnp.where(t > 2, tab["term_au"], 0.0)
    return z


def exterior_scores(tab, seq, L, Wp: int, no_ene):
    """ext[j, w] for TT_O_OP: sum_ext_m(i, j-1, ext=True)."""
    Lp = seq.shape[0]
    j = jnp.arange(Lp + 1)[:, None]
    w = jnp.arange(Wp + 1)[None, :]
    i = j - w
    z = _sum_ext_m(tab, seq, L, i, j - 1, True)
    if no_ene:
        z = jnp.zeros_like(z)
    return z


def ml2_scores(tab, seq, L, Wp: int, no_ene):
    """ml2[j, w] for TT_2_P: sum_ext_m(i, j-1, False) + mlintern."""
    Lp = seq.shape[0]
    j = jnp.arange(Lp + 1)[:, None]
    w = jnp.arange(Wp + 1)[None, :]
    i = j - w
    z = _sum_ext_m(tab, seq, L, i, j - 1, False) + tab["mlintern"]
    if no_ene:
        z = jnp.zeros_like(z)
    return z


def mlE_scores(tab, seq, L, Wp: int, no_ene):
    """mlE[j, w] for TT_E_M: sum_ext_m(j, i-1, False) + mlclosing +
    mlintern — the multiloop closing pair seen from inside
    (energy_model.hpp:398-405)."""
    Lp = seq.shape[0]
    j = jnp.arange(Lp + 1)[:, None]
    w = jnp.arange(Wp + 1)[None, :]
    i = j - w
    z = (_sum_ext_m(tab, seq, L, j, i - 1, False)
         + tab["mlclosing"] + tab["mlintern"])
    if no_ene:
        z = jnp.zeros_like(z)
    return z


def iloop_scores(tab, seq, j, Wp: int, Cp: int, C, no_ene,
                 dots_cum=None):
    """il[w, dk, dl] = loop_energy(i-1, j, k, l-1) for the E(i,j) internal
    loop with left gap dk = k-i, right gap dl = j-l, at DP column j.

    Valid combos: 1 <= dk+dl <= C (and <= MAXLOOP unless no_ene), inner
    span width w-dk-dl >= 0.  With a fixed structure (dots_cum given), both
    flanks must be all dots.
    """
    w = jnp.arange(Wp + 1)[:, None, None]
    dk = jnp.arange(Cp + 1)[None, :, None]
    dl = jnp.arange(Cp + 1)[None, None, :]
    i = j - w
    k = i + dk
    l = j - dl
    u1, u2 = dk, dl
    usum = u1 + u2
    umax = jnp.maximum(u1, u2)

    valid = (usum >= 1) & (usum <= C) & (w - dk - dl >= 0) & (i >= 0)
    if dots_cum is not None:
        left_dots = _sgather(dots_cum, k) - _sgather(dots_cum, i)
        right_dots = _sgather(dots_cum, j * jnp.ones_like(l)) \
            - _sgather(dots_cum, l)
        valid = valid & (left_dots == dk) & (right_dots == dl)
    if no_ene:
        return jnp.where(valid, 0.0, NEG)

    t = _pair_type(tab, _sgather(seq, i - 1), _sgather(seq, j + 0 * w))
    t2 = _pair_type(tab, _sgather(seq, l - 1), _sgather(seq, k))
    b_i = _sgather(seq, i)          # s[i'+1]
    b_jm = _sgather(seq, (j - 1) + 0 * w)
    b_l = _sgather(seq, l)          # s[q+1]
    b_km = _sgather(seq, k - 1)     # s[p-1]

    uc = jnp.clip(umax, 0, MAXLOOP)
    usc = jnp.clip(usum, 0, MAXLOOP)
    au = jnp.where(t > 2, tab["term_au"], 0.0)
    au2 = jnp.where(t2 > 2, tab["term_au"], 0.0)

    bulge = jnp.where(
        umax == 1,
        tab["bulge"][uc] + tab["stack"][t, t2],
        tab["bulge"][uc] + au + au2,
    )

    int11 = tab["int11"][t, t2, b_i, b_jm]
    int21a = tab["int21"][t, t2, b_i, b_l, b_jm]
    int21b = tab["int21"][t2, t, b_l, b_i, b_km]
    int22 = tab["int22"][t, t2, b_i, b_km, b_l, b_jm]
    short = jnp.where(
        usum == 2, int11,
        jnp.where((u1 == 1) & (u2 == 2), int21a,
                  jnp.where((u1 == 2) & (u2 == 1), int21b, int22)))

    mis_long = jnp.where(
        (u1 == 1) | (u2 == 1),
        tab["mismatch_1n"][t, b_i, b_jm] + tab["mismatch_1n"][t2, b_l, b_km],
        jnp.where(
            usum == 5,
            tab["mismatch_23"][t, b_i, b_jm]
            + tab["mismatch_23"][t2, b_l, b_km],
            tab["mismatch_i"][t, b_i, b_jm]
            + tab["mismatch_i"][t2, b_l, b_km]))
    longi = tab["internal"][usc] + tab["ninio"][jnp.clip(
        jnp.abs(u1 - u2), 0, MAXLOOP)] + mis_long

    z = jnp.where(
        (u1 == 0) | (u2 == 0), bulge,
        jnp.where(umax <= 2, short, longi))
    z = jnp.where(usum > MAXLOOP, NEG, z)
    return jnp.where(valid, z, NEG)
