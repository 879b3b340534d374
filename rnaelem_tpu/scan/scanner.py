"""Scanner: motif-position posteriors, conditional end pass, E[N].

Replicates RNAelemScanDP (motif_scanner.hpp:186-260, 364-800):

* Pys[p] — posterior that the motif starts at base p (transitions
  crossing node 0 -> 1), Pyi[p] — inside-motif posterior, PyN — no-motif
  probability: all are gradients of logZ with respect to the auxiliary
  per-(position, target-state, source-state) log factors injected into
  the emission kinds (R right-chain, L left-chain, P pair edges).
* the end pass re-runs the DP with -inf vetoes at position Ys (only the
  0->1 crossing survives there, InsideEndFun, motif_scanner.hpp:581-665)
  and reads Pye from the M-2 -> M-1 crossing posteriors.
* E[N] expected emission counts are the theta gradients.

The Viterbi/CYK alignment lives in scan/cyk.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..model import joint as J
from ..ops.semiring import NEG, lse


class StateMasks(NamedTuple):
    r_start: jnp.ndarray   # [S,S] (T,S): right-emission crossing 0->1
    r_in: jnp.ndarray
    r_end: jnp.ndarray     # crossing M-2 -> M-1
    r_tail: jnp.ndarray    # target.r == M-2 (for Pye[L])
    l_start: jnp.ndarray
    l_in: jnp.ndarray
    l_end: jnp.ndarray
    pl_start: jnp.ndarray
    pl_in: jnp.ndarray
    pl_end: jnp.ndarray
    pr_start: jnp.ndarray
    pr_in: jnp.ndarray
    pr_end: jnp.ndarray
    pr_tail: jnp.ndarray


@functools.lru_cache(maxsize=32)
def state_masks(cfg: J.ModelConfig) -> StateMasks:
    g = J.kernels(cfg).g
    M = g.M
    Tl = g.state_l[:, None] + 0 * g.state_l[None, :]
    Tr = g.state_r[:, None] + 0 * g.state_r[None, :]
    Sl = g.state_l[None, :] + 0 * g.state_l[:, None]
    Sr = g.state_r[None, :] + 0 * g.state_r[:, None]
    j = jnp.asarray
    return StateMasks(
        r_start=j((Sr == 0) & (Tr == 1)),
        r_in=j((Tr != 0) & (Tr != M - 1)),
        r_end=j((Sr == M - 2) & (Tr == M - 1)),
        r_tail=j(Tr == M - 2),
        l_start=j((Tl == 0) & (Sl == 1)),
        l_in=j((Sl != 0) & (Sl != M - 1)),
        l_end=j((Tl == M - 2) & (Sl == M - 1)),
        pl_start=j((Tl == 0) & (Sl == 1)),
        pl_in=j((Sl != 0) & (Sl != M - 1)),
        pl_end=j((Tl == M - 2) & (Sl == M - 1)),
        pr_start=j((Sr == 0) & (Tr == 1)),
        pr_in=j((Tr != 0) & (Tr != M - 1)),
        pr_end=j((Sr == M - 2) & (Tr == M - 1)),
        pr_tail=j(Tr == M - 2),
    )


def _aux_zeros(cfg, g, dtype, B):
    return {k: jnp.zeros((B, cfg.Lp, g.S, g.S), dtype)
            for k in ("auxR", "auxL", "auxPL", "auxPR")}


def _masked_sum(G, mask):
    """Sum transition posteriors per position under a [S,S] mask;
    G has leading (B, Lp) axes."""
    return (G * mask[None, None, :, :]).sum(axis=(2, 3))


def _argmax_last(v):
    """max_index semantics: ties resolve to the LAST maximal index
    (util.hpp:232-241); batched over the leading axis."""
    n = v.shape[-1]
    return n - 1 - jnp.argmax(v[..., ::-1], axis=-1)


def scan_posteriors(cfg: J.ModelConfig, params: J.Params, sd: J.SeqData):
    """Per-read posteriors + E[N] contribution + Ys/Ye (B=1 wrapper)."""
    J.kernels(cfg)
    state_masks(cfg)
    sd_b = jax.tree.map(lambda x: jnp.asarray(x)[None], sd)
    out = _scan_posteriors_jit(cfg, params, sd_b, jnp.ones(
        (1,), jnp.dtype(cfg.dtype)))
    return {k: (v if k == "EN" else jax.tree.map(lambda x: x[0], v))
            for k, v in out.items()}


def scan_posteriors_batch(cfg: J.ModelConfig, params: J.Params,
                          sd_b: J.SeqData, valid=None):
    """Batched posterior + conditional-end passes: all reads of a
    length bucket go through the batched DP at once (the reference
    threads reads across cores instead, motif_scanner.hpp:215-260).
    EN is the batch-aggregated expected emission count; rows where
    ``valid`` is 0 (padding) contribute nothing to it."""
    J.kernels(cfg)
    state_masks(cfg)
    dtype = jnp.dtype(cfg.dtype)
    B = sd_b.L.shape[0]
    if valid is None:
        valid = jnp.ones((B,), dtype)
    return _scan_posteriors_jit(cfg, params, sd_b,
                                jnp.asarray(valid, dtype))


@functools.partial(jax.jit, static_argnums=(0,))
def _scan_posteriors_jit(cfg: J.ModelConfig, params: J.Params,
                         sd_b: J.SeqData, valid):
    assert cfg.with_aux
    k = J.kernels(cfg)
    g = k.g
    dtype = jnp.dtype(cfg.dtype)
    m = state_masks(cfg)
    B = sd_b.L.shape[0]
    bp_ok, eff = J._effective_bp_mask_batch_jit(cfg, sd_b)

    def z_all_fn(aux, p):
        parts = J._batch_logZ_parts_jit(cfg, p, sd_b, aux, bp_ok)
        return lse(parts, axis=-1), parts           # [B], [B,3]

    aux0 = _aux_zeros(cfg, g, dtype, B)
    z, vjp, parts = jax.vjp(z_all_fn, aux0, params, has_aux=True)
    # the E[N] aggregate (gparams) sums only valid rows; the per-read
    # aux posteriors are normalized per read, so scaling row b by
    # valid[b] either keeps them (1) or zeroes a padding row (0)
    (gaux, gparams) = vjp(valid)

    Pys = (_masked_sum(gaux["auxR"], m.r_start)
           + _masked_sum(gaux["auxL"], m.l_start)
           + _masked_sum(gaux["auxPL"], m.pl_start)
           + _masked_sum(gaux["auxPR"], m.pr_start))
    Pyi = (_masked_sum(gaux["auxR"], m.r_in)
           + _masked_sum(gaux["auxL"], m.l_in)
           + _masked_sum(gaux["auxPL"], m.pl_in)
           + _masked_sum(gaux["auxPR"], m.pr_in))
    PyN = jnp.exp(parts[:, 0] - z)

    inb = jnp.arange(cfg.Lp)[None, :] < sd_b.L[:, None]
    Pys = jnp.where(inb, Pys, 0.0)
    Pyi = jnp.where(inb, Pyi, 0.0)
    Ys = _argmax_last(jnp.where(inb, Pys, -1.0))    # [B]

    # conditional end pass, start pinned per read at Ys
    pos = jnp.arange(cfg.Lp)[None, :, None, None]
    at = lambda allow: jnp.where(
        pos == Ys[:, None, None, None],
        jnp.where(allow[None, None, :, :], 0.0, NEG), 0.0
    ).astype(dtype)
    aux_end = dict(auxR=at(m.r_start), auxL=at(m.l_start),
                   auxPL=at(m.pl_start), auxPR=at(m.pr_start))

    def ze_fn(aux):
        parts_e = J._batch_logZ_parts_jit(cfg, params, sd_b, aux, bp_ok)
        return lse(parts_e, axis=-1)

    ze, vjpe = jax.vjp(ze_fn, aux_end)
    (gaux_e,) = vjpe(valid)
    Pye_pos = (_masked_sum(gaux_e["auxR"], m.r_end)
               + _masked_sum(gaux_e["auxL"], m.l_end)
               + _masked_sum(gaux_e["auxPL"], m.pl_end)
               + _masked_sum(gaux_e["auxPR"], m.pr_end))
    Pye_pos = jnp.where(inb, Pye_pos, 0.0)
    lastb = jnp.clip(sd_b.L - 1, 0, cfg.Lp - 1)     # [B]
    gR = jnp.take_along_axis(
        gaux_e["auxR"], lastb[:, None, None, None], axis=1)[:, 0]
    gPR = jnp.take_along_axis(
        gaux_e["auxPR"], lastb[:, None, None, None], axis=1)[:, 0]
    pye_L = ((gR + gPR) * m.r_tail[None]).sum(axis=(1, 2))   # [B]
    Pye = jnp.concatenate(
        [Pye_pos, jnp.zeros((B, 1), dtype)], axis=1)
    Pye = Pye + (jnp.arange(cfg.Lp + 1)[None, :]
                 == sd_b.L[:, None]) * pye_L[:, None]
    Ye = _argmax_last(jnp.where(jnp.arange(cfg.Lp + 1)[None, :]
                                <= sd_b.L[:, None], Pye, -1.0))
    return dict(Pys=Pys, Pyi=Pyi, Pye=Pye, PyN=PyN, Z=z, Ze=ze,
                Ys=Ys, Ye=Ye, EN=gparams, eff=eff)
