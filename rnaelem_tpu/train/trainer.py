"""Training driver: minibatch EM with shuffled negatives.

Replicates RNAelemTrainer (motif_trainer.hpp:461-634): Adam over
minibatches with per-read deterministic shuffled negatives (default), or
L-BFGS-B full-batch without negatives (--no-shuffle); bounds clip lambda
at 0, L2 regularization with per-block rho; an interim model snapshot is
written at every epoch boundary; "considered BP" (mean bpp_eff) is logged
on the first evaluation.

The device work per evaluation is one jitted batched fn/grad call
(objective.batch_fn_grad); multi-host data parallelism wraps that call
with a psum (parallel/mesh.py).
"""
from __future__ import annotations

import sys
import time
from typing import Optional

import numpy as np

from ..alphabet import ints_to_seq, seq_to_ints
from ..io.fastq import FastqBatchReader
from ..model import joint as J
from ..model import io as MIO
from ..pipeline.ushuffle import negative_for
from . import objective as OBJ
from .optim import Adam, Lbfgsb


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class Trainer:
    def __init__(self, cfg: J.ModelConfig, params: J.Params,
                 max_iter: int = 100, eps: float = 1e-5,
                 lambda_init: float = 0.0, kmer_shuf: int = 2,
                 batch_size: int = 100, no_shuffle: bool = False,
                 lik_ratio: bool = False, interim_out=None,
                 mask_indices=None, mesh=None, array_eval=None):
        self.cfg = cfg
        self.params = params
        self.g = J.kernels(cfg).g
        self.max_iter = max_iter
        self.eps = eps
        self.lambda_init = lambda_init
        self.kmer_shuf = kmer_shuf
        self.batch_size = batch_size
        self.no_shuffle = no_shuffle
        self.lik_ratio = lik_ratio
        self.interim_out = interim_out
        self.mask_indices = mask_indices  # TR_MASK (motif_mask_trainer)
        # multi-chip data parallelism (the reference's TR_ARRAY loop as
        # one SPMD program): with a jax.sharding.Mesh, the batch is
        # sharded over 'data' and the DP + BPP pruning run on all chips
        self.mesh = mesh
        self._mesh_steps = {}   # per length-bucket sharded step / bp fn
        # file-based distributed evaluation (the reference's TR_ARRAY
        # protocol, parallel/arrayjob.ArrayEvaluator): full-batch
        # fn/gr per step through N filesystem slaves
        self.array_eval = array_eval
        self.qr = FastqBatchReader()
        self._eval_cnt = 0
        self._eff_logged = False
        # one-deep batch prefetch pipeline (see _take_batch)
        self._prefetch = None
        self._pf_pool = None

    def _bucket_cfg(self, reads, negs):
        """Length-bucketed config for this minibatch: pad to the next
        32-multiple instead of the file max, so mixed-length data reuses
        a handful of compiled kernels (SURVEY §7.1 'Batching')."""
        import dataclasses as dc
        Lmax = max(max((len(s) for s, _ in reads), default=1),
                   max((len(s) for s in negs), default=1))
        Lp = min(self.cfg.Lp, max(32, ((Lmax + 31) // 32) * 32))
        return self.cfg if Lp == self.cfg.Lp \
            else dc.replace(self.cfg, Lp=Lp)

    def _funcs_for(self, cfg):
        """(step_fn, bp_fn) for one bucket config (mesh-sharded when a
        mesh is attached; cached per bucket)."""
        if self.mesh is None:
            return None, None
        if cfg not in self._mesh_steps:
            from ..parallel import mesh as MESH
            self._mesh_steps[cfg] = (
                MESH.make_sharded_per_read(cfg, self.mesh,
                                           self.lik_ratio),
                MESH.make_sharded_bp_masks(cfg, self.mesh))
        return self._mesh_steps[cfg]

    def set_fq(self, path: str):
        self.qr.open(path)
        self.qr.set_batch_size(self.batch_size)

    def _bounds_reg(self, nparam):
        lower = np.full(nparam, -np.inf)
        upper = np.full(nparam, np.inf)
        lower[-2:] = 0.0  # lambda >= 0 (motif_trainer.hpp:508-526)
        rho = np.full(
            nparam - 2,
            self.cfg.rho_s if self.cfg.theta_softmax
            else self.cfg.rho_theta)
        rho = np.concatenate([rho, [self.cfg.rho_lambda] * 2])
        rtype = np.full(nparam, 2)  # L2
        if self.mask_indices is not None:
            # freeze all but chosen indices: collapse bounds, zero reg
            # (motif_mask_trainer.hpp:36-103)
            keep = np.zeros(nparam, bool)
            keep[np.asarray(self.mask_indices)] = True
            x0 = J.pack_params(self.g, self.params)
            lower = np.where(keep, lower, x0)
            upper = np.where(keep, upper, x0)
            rho = np.where(keep[:len(rho)], rho[:len(rho)], 0.0)
        return lower, upper, rtype, rho

    def _objective_array(self, x, iter_cnt):
        """One distributed fn/gr evaluation through the file-based
        array protocol (motif_trainer.hpp:608-614): broadcast = model
        snapshot file, all-reduce = parse-and-sum of slave files.  The
        snapshot rides the same 6-significant-digit model writer the
        reference broadcasts with — its per-step quantization quirk
        included."""
        self.params = J.unpack_params(self.g, x, self.params)
        if self.interim_out is not None:
            self.interim_out.write(
                MIO.interim_line(self.cfg, self.params) + "\n")
            self.interim_out.flush()
        fn, gr, eff = self.array_eval(self.params)
        if not self._eff_logged:
            log("considered BP (sum eff):", eff)
            self._eff_logged = True
        self._eval_cnt += 1
        return fn, np.asarray(gr)

    def _read_batch_host(self, iter_cnt):
        """HOST-ONLY half of batch building: advance the reader one
        minibatch, draw the iter-keyed negatives, pack per-read host
        arrays.  Touches no JAX API, so it is safe to run in the
        prefetch worker while the device computes the previous step
        (concurrent device dispatch/compile from a second thread broke
        both multi-process collectives — gloo order mismatch — and
        this jaxlib's CPU compiler)."""
        qr = self.qr
        if qr.N() - qr.orig().cnt() < qr.N_batch():
            qr.skip(qr.N() - qr.orig().cnt())
        epoch_end = qr.is_end_epoc()
        qr.clear()
        reads, negs = [], []
        while not qr.is_end():
            r = qr.get_read()
            if len(r.seq) + 1 != len(r.qual):
                raise ValueError(f"bad seq format. {r.id}")
            reads.append((r.seq, r.qual))
            if not self.no_shuffle:
                s = ints_to_seq(r.seq)
                negs.append(seq_to_ints(
                    negative_for(s, self.kmer_shuf, iter_cnt)))
        return dict(iter_cnt=iter_cnt, epoch_end=epoch_end,
                    reads=reads, negs=negs)

    def _finish_batch(self, got):
        """Device half: stack + BPP mask pass (consumer thread only)."""
        if not hasattr(self, "_bp_cache"):
            self._bp_cache = OBJ.BpMaskCache()
        reads, negs = got["reads"], got["negs"]
        cfg_b = self._bucket_cfg(reads, negs)
        step_fn, bp_fn = self._funcs_for(cfg_b)
        batch = OBJ.stack_reads(cfg_b, reads,
                                negs if not self.no_shuffle else None,
                                bp_cache=self._bp_cache,
                                bp_fn=bp_fn)
        return dict(got, cfg=cfg_b, step_fn=step_fn, batch=batch)

    def _take_batch(self, iter_cnt):
        """The batch for this evaluation: consume the prefetched host
        half if its iteration key matches, else build synchronously;
        then start prefetching the next.  Negatives are keyed by
        iter_cnt and masks are parameter-free, so a batch built one
        step ahead is bit-identical to one built on demand."""
        got = None
        if self._prefetch is not None:
            pf = self._prefetch
            self._prefetch = None
            try:
                res = pf.result()
            except Exception:
                self._pf_pool = None      # worker died: fall back
                raise
            if res["iter_cnt"] != iter_cnt and not self.no_shuffle:
                # non-sequential call pattern: the reader has advanced,
                # so keep the reads but redraw the iter-keyed negatives
                res["negs"] = [seq_to_ints(negative_for(
                    ints_to_seq(s), self.kmer_shuf, iter_cnt))
                    for s, _ in res["reads"]]
            got = dict(res, iter_cnt=iter_cnt)
        if got is None:
            got = self._read_batch_host(iter_cnt)
        if self._pf_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._pf_pool = ThreadPoolExecutor(max_workers=1)
        self._prefetch = self._pf_pool.submit(
            self._read_batch_host, iter_cnt + 1)
        return self._finish_batch(got)

    def _objective(self, x, iter_cnt):
        """One fn/gr evaluation over the next minibatch
        (motif_trainer.hpp:595-633)."""
        if self.array_eval is not None:
            return self._objective_array(x, iter_cnt)
        self.params = J.unpack_params(self.g, x, self.params)
        got = self._take_batch(iter_cnt)
        if got["epoch_end"] and self.interim_out is not None:
            self.interim_out.write(
                MIO.interim_line(self.cfg, self.params) + "\n")
            self.interim_out.flush()
        cfg_b, step_fn, batch = got["cfg"], got["step_fn"], got["batch"]
        if step_fn is not None:
            f_b, gr_b, eff_b = step_fn(self.params, batch)
        else:
            f_b, gr_b, eff_b = OBJ.batch_fn_grad_pr(
                cfg_b, self.params, batch, self.lik_ratio)
        fn, grads, eff = OBJ.reduce_per_read(f_b, gr_b, eff_b)
        gr = J.pack_params(self.g, grads)
        if not self._eff_logged:
            log("considered BP:",
                float(eff) / max(1, len(got["reads"])))
            self._eff_logged = True
        self._eval_cnt += 1
        return fn, gr

    def train(self) -> J.Params:
        self.params = self.params._replace(
            lam=np.full(2, self.lambda_init))
        x0 = J.pack_params(self.g, self.params)
        lower, upper, rtype, rho = self._bounds_reg(len(x0))
        t0 = time.time()
        if self.no_shuffle:
            opt = Lbfgsb(maxiter=self.max_iter - 1, eps=self.eps)
            opt.set_bounds(lower, upper)
            opt.set_regularization(rtype, rho)
            best = opt.minimize(self._objective, x0)
        else:
            opt = Adam(alpha=0.1)
            opt.set_bounds(lower, upper)
            opt.set_regularization(rtype, rho)

            def cb(t, x, y, gr):
                log(f"iter: {t - 1} , y: {y} , |gr|: {(gr * gr).sum()}"
                    f" , p|x|: {opt.rgl_term(x)}")

            best = opt.minimize(self._objective, x0, self.max_iter,
                                callback=cb)
        self.params = J.unpack_params(self.g, best, self.params)
        if self._pf_pool is not None:
            # drain the dangling lookahead batch and stop the worker
            if self._prefetch is not None:
                try:
                    self._prefetch.result()
                except Exception:
                    pass
                self._prefetch = None
            self._pf_pool.shutdown(wait=True)
            self._pf_pool = None
        if self._eval_cnt:
            log("wall clock time per eval:",
                (time.time() - t0) / self._eval_cnt)
        return self.params
