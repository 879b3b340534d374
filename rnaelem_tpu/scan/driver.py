"""Scan driver: per-read posterior records + Viterbi alignment output.

Produces the 10-line raw record stream of the reference scanner
(motif_scanner.hpp:237-252) and the aggregated E[N] log line
(motif_scanner.hpp:947) that draw_motif consumes.
"""
from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np

from ..alphabet import ints_to_seq
from ..io.fastq import FastqReader
from ..model import io as MIO
from ..model import joint as J
from ..model.io import _g
from . import cyk as CYK
from . import scanner as SC


def _fmt_vec(v) -> str:
    return "[" + ",".join(_g(float(x)) for x in v) + "]"


def _fmt_ivec(v) -> str:
    return "[" + ",".join(str(int(x)) for x in v) + "]"


def _log_or_neg(x):
    x = float(x)
    return np.log(x) if x > 0 else -np.inf


def scan_config(cfg: J.ModelConfig, params: J.Params, Lp: int):
    """Scanner always works in plain-theta space (the reference scanner
    reads theta; E[N] accumulates per theta table)."""
    th = J.effective_theta(cfg, params)
    cfg2 = dataclasses.replace(cfg, theta_softmax=False, with_aux=True,
                               Lp=Lp)
    return cfg2, J.Params(singles=th.singles, pairs=th.pairs,
                          lam=params.lam)


def _bucket_of(L: int, lo: int = 32, step: int = 32) -> int:
    """Length bucket: round up to a multiple of `step` (min `lo`), so a
    new FASTQ reuses compiled kernels instead of specializing on the
    file's exact max length (SURVEY §7.1 'Batching')."""
    return max(lo, ((L + step - 1) // step) * step)


SCAN_BATCH = 64


def _pad_size(n: int) -> int:
    """Next power of two (capped at SCAN_BATCH): ragged tail chunks
    compile at most log2(SCAN_BATCH) kernel variants per bucket instead
    of one per distinct tail size."""
    p = 1
    while p < n:
        p *= 2
    return min(p, SCAN_BATCH)


class Scanner:
    def __init__(self, cfg: J.ModelConfig, params: J.Params):
        self.cfg0 = cfg
        self.params0 = params

    def scan(self, fq_path: str, out, log=None):
        if log is None:
            log = sys.stderr   # resolved at call time: callers may
            #                    redirect stderr per task (elem
            #                    --in-process)
        t0 = time.time()
        qr = FastqReader(fq_path)
        reads = list(qr.reads())
        if not reads:
            print("E[N]: []", file=log)
            return
        g0 = None
        EN_singles = EN_pairs = None

        # group reads into length buckets; one compiled kernel per
        # bucket, reads batched through the DP (vs the reference's
        # one-thread-per-read loop, motif_scanner.hpp:215-260)
        buckets = {}
        for idx, r in enumerate(reads):
            buckets.setdefault(_bucket_of(len(r.seq)), []).append(idx)

        results = [None] * len(reads)
        pending = None  # one-chunk pipeline: fetch overlaps next compute

        def flush(p):
            (cfgp, paramsp, chunkp, sdsp, Pys_b, Pye_b, Pyi_b,
             Ys_b, Ye_b, handle) = p
            vit = None
            if handle is not None:
                vit = CYK.cyk_batch_finish(cfgp, handle, len(chunkp))
            for t, i in enumerate(chunkp):
                L = len(reads[i].seq)
                Ys, Ye = int(Ys_b[t]), int(Ye_b[t])
                if cfgp.no_rss:
                    psihat = _chain_viterbi(
                        cfgp, paramsp, sdsp[t], Ys, Ye, L)
                    rss = "O" * L
                else:
                    psihat, rss = vit[t]
                    psihat = psihat[:L]
                results[i] = (Pys_b[t][:L], Pye_b[t][:L + 1],
                              Pyi_b[t][:L], Ys, Ye, psihat, rss)

        for Lp in sorted(buckets):
            cfg, params = scan_config(self.cfg0, self.params0, Lp)
            g = J.kernels(cfg).g
            if g0 is None:
                g0 = g
                EN_singles = np.zeros_like(np.asarray(params.singles))
                EN_pairs = np.zeros_like(np.asarray(params.pairs))
            idxs = buckets[Lp]
            for k0 in range(0, len(idxs), SCAN_BATCH):
                chunk = idxs[k0:k0 + SCAN_BATCH]
                sds = [J.make_seqdata(cfg, reads[i].seq, reads[i].qual)
                       for i in chunk]
                # pad ragged tail chunks up to a power-of-two batch so
                # each bucket compiles O(log) kernels, not one per
                # distinct tail size; pad rows replicate the last read
                # and their results are discarded below
                bpad = _pad_size(len(chunk))
                sds += [sds[-1]] * (bpad - len(chunk))
                sd_b = __import__("jax").tree.map(
                    lambda *xs: np.stack(xs), *sds)
                valid = np.zeros(bpad)
                valid[: len(chunk)] = 1.0
                res = SC.scan_posteriors_batch(cfg, params, sd_b, valid)
                EN_singles += np.asarray(res["EN"].singles)
                EN_pairs += np.asarray(res["EN"].pairs)
                Pys_b = np.asarray(res["Pys"])
                Pye_b = np.asarray(res["Pye"])
                Pyi_b = np.asarray(res["Pyi"])
                Ys_b = np.asarray(res["Ys"])
                Ye_b = np.asarray(res["Ye"])
                handle = None
                if not cfg.no_rss:
                    # batched CYK: dispatch device work + async host
                    # copies now; the traceback of the PREVIOUS chunk
                    # runs while this chunk computes/transfers
                    handle = CYK.cyk_batch_start(
                        cfg, params, sd_b, Ys_b, Ye_b)
                info = (cfg, params, chunk, sds, Pys_b, Pye_b, Pyi_b,
                        Ys_b, Ye_b, handle)
                if pending is not None:
                    flush(pending)
                pending = info
        if pending is not None:
            flush(pending)

        M = g0.M
        for r, resu in zip(reads, results):
            Pys, Pye, Pyi, Ys, Ye, psihat, rss = resu
            mot = "".join(
                " " if (p == 0 or p == M - 1) else g0.nodes[int(p)]
                for p in psihat)
            out.write(f"id: {r.id}\n")
            out.write("start: " + _fmt_vec(
                [_log_or_neg(v) for v in Pys]) + "\n")
            out.write("end: " + _fmt_vec(
                [_log_or_neg(v) for v in Pye]) + "\n")
            out.write("inner: " + _fmt_vec(
                [_log_or_neg(v) for v in Pyi]) + "\n")
            out.write("psihat: " + _fmt_ivec(psihat) + "\n")
            out.write(f"motif region: {Ys} - {Ye}\n")
            out.write(f"exist prob: {_g(float(Pys.sum()))}\n")
            out.write(f"seq: {ints_to_seq(r.seq)}\n")
            out.write(f"rss: {rss}\n")
            out.write(f"mot: {mot}\n")

        en_tabs = []
        for t, sz in enumerate(g0.table_sizes):
            if sz == 6:
                en_tabs.append(EN_pairs[g0.pair_table_index[t]])
            else:
                en_tabs.append(EN_singles[g0.single_table_index[t]])
        en_str = "[" + ",".join(_fmt_vec(t) for t in en_tabs) + "]"
        print("E[N]:", en_str, file=log)
        print("scan end:", time.time() - t0, file=log)

def _chain_viterbi(cfg, params, sd, Ys, Ye, L):
    """no-rss Viterbi: max-semiring forward chain over O states with the
    Ys/Ye pins, traced back on host (compute_inside no-rss branch +
    CYKFun, motif_model.hpp:170-190 / motif_scanner.hpp:830-873)."""
    import dataclasses as dc
    from ..scan.scanner import state_masks

    g = J.kernels(cfg).g
    S = g.S
    th = J.effective_theta(cfg, params)
    base = np.asarray(sd.seq)
    b1 = np.clip(base - 1, 0, 3)
    sidx = g.single_table_index[g.tid_r]
    singles = np.asarray(th.singles)
    eR = np.where((base > 0)[:, None] & (not cfg.no_prf),
                  singles[sidx[None, :], b1[:, None]], 0.0)
    eR = eR + np.where(np.asarray(g.ws_r)[None, :],
                       np.asarray(sd.ws)[:, None], 0.0)
    ltau = np.log(cfg.tau) if cfg.tau > 0 else -np.inf
    TR = np.where(g.rt, np.where(g.rt_tau, ltau, 0.0), -np.inf)
    m = state_masks(cfg)
    r_start = np.asarray(m.r_start)
    r_end = np.asarray(m.r_end)
    r_tail = np.asarray(m.r_tail)

    def allow(p):
        a = np.zeros((S, S))
        if p == Ys:
            a = np.where(r_start, 0.0, -np.inf)
        if p == Ye:
            a = a + np.where(r_end, 0.0, -np.inf)
        if Ye == L and p == L - 1:
            a = a + np.where(r_tail, 0.0, -np.inf)
        return a

    NEGI = -np.inf
    v = np.full(S, NEGI)
    v[g.end_states[0]] = 0.0
    back = np.zeros((L, S), np.int64)
    for p in range(L):
        # t[s, s1]: target-state s emits base p through node s.r
        t = v[None, :] + TR + eR[p][:, None] + allow(p)
        back[p] = np.argmax(t, axis=1)
        v = t[np.arange(S), back[p]]
    ends = [g.end_states[1], g.end_states[2]]
    s = ends[1] if v[ends[0]] < v[ends[1]] else ends[0]
    path = np.zeros(L, np.int64)
    for p in range(L - 1, -1, -1):
        path[p] = g.state_r[s]
        s = back[p, s]
    return path
