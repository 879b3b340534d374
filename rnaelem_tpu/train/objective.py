"""Training objective: discriminative EM function/gradient evaluation.

Replicates RNAelemTrainDP::operator() (motif_trainer.hpp:124-272):

* default mode: f += Z(all) - Z(label-restricted); positives (has-motif
  sentinel) restrict to motif-present (ari), negatives/unflagged restrict
  to motif-absent (nasi);
* lik-ratio mode (TR_LIK_RATIO): f += +-(Z(motif) - Z(all)) with sign -1
  for flagged positives;
* reads whose partition functions are non-finite contribute nothing
  (motif_trainer.hpp:211-214);
* gradients of f w.r.t. theta/s and lambda are the reference's
  ENo-ENx / EHo-EHx expected-count differences, obtained here by
  jax.grad through the DP's custom VJP.

Batched over padded same-length-bucket reads with vmap; the per-step
all-reduce for multi-host data parallelism lives in parallel/mesh.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..model import joint as J
from ..ops.semiring import NEG, lse


class BatchData(NamedTuple):
    sd: J.SeqData            # fields stacked with leading batch axis
    restrict_ari: jnp.ndarray  # [B] bool: label-restriction is motif-present
    lik_sign: jnp.ndarray    # [B] +-1.0 for lik-ratio mode
    is_neg: jnp.ndarray      # [B] bool: shuffled negative (weaker skip
    #                           check, motif_trainer.hpp:236)
    valid: jnp.ndarray       # [B] bool (padding rows in a batch)
    bp_ok: jnp.ndarray       # [B, Lp+1, Wp+1] min-BPP pruning masks —
    #   parameter-independent, so computed once per sequence instead of
    #   per evaluation (the reference recomputes them every visit,
    #   energy_model.hpp:268-276; identical semantics, ~2x cheaper)
    eff: jnp.ndarray         # [B] bpp_eff per read


def stack_reads(cfg: J.ModelConfig, reads, negatives=None) -> BatchData:
    """Host-side: pack reads (+ optional shuffled negatives) into a batch.

    reads: list of (seq_codes, quals) tuples. negatives: list of
    seq_codes (quality all zero, restricted to motif-absent,
    motif_trainer.hpp:228-245).
    """
    sds, ari, sign, neg = [], [], [], []
    for seq, quals in reads:
        sd = J.make_seqdata(cfg, seq, quals)
        sds.append(sd)
        ari.append(bool(sd.has_motif))
        sign.append(-1.0 if bool(sd.has_motif) else 1.0)
        neg.append(False)
    for seq in negatives or []:
        q = np.zeros(len(seq) + 1, np.int64)
        sds.append(J.make_seqdata(cfg, seq, q))
        ari.append(False)
        sign.append(1.0)
        neg.append(True)
    sd = jax.tree.map(lambda *xs: jnp.stack(xs), *sds)
    bp_ok, eff = batch_bp_masks(cfg, sd)
    return BatchData(
        sd=sd,
        restrict_ari=jnp.asarray(ari),
        lik_sign=jnp.asarray(sign, jnp.dtype(cfg.dtype)),
        is_neg=jnp.asarray(neg),
        valid=jnp.ones(len(sds), bool),
        bp_ok=bp_ok,
        eff=eff,
    )


def batch_bp_masks(cfg: J.ModelConfig, sd_batch):
    """Vectorized min-BPP pruning masks for a stacked SeqData batch."""
    J.kernels(cfg)
    return _batch_bp_masks_jit(cfg, sd_batch)


@functools.partial(jax.jit, static_argnums=(0,))
def _batch_bp_masks_jit(cfg, sd_batch):
    return jax.vmap(lambda sd: J._effective_bp_mask_jit(cfg, sd))(sd_batch)


def _read_f(cfg, params, sd, restrict_ari, lik_sign, is_neg,
            lik_ratio: bool, bp_ok=None, eff=None):
    if bp_ok is None:
        parts, eff = J.logZ_parts(cfg, params, sd, with_eff=True)
    else:
        parts = J._logZ_parts_jit(cfg, params, sd, None, bp_ok, False)
    z_all = lse(parts, axis=-1)
    z_ari = lse(jnp.where(jnp.asarray([False, True, True]), parts, NEG),
                axis=-1)
    z_nasi = parts[0]
    if lik_ratio:
        f = lik_sign * (z_ari - z_all)
        ok = jnp.isfinite(z_all) & jnp.isfinite(z_ari)
    else:
        z_restr = jnp.where(restrict_ari, z_ari, z_nasi)
        f = z_all - z_restr
        # skip checks: positives require finite Z(all) and Z(ari)
        # regardless of label; negatives only finite Z(all)
        # (motif_trainer.hpp:211-214, 236-239)
        ok = jnp.isfinite(z_all) & (is_neg | jnp.isfinite(z_ari))
    return jnp.where(ok, f, 0.0), jnp.where(is_neg, 0.0, eff)


@functools.partial(jax.jit, static_argnums=(0, 3))
def batch_fn_grad(cfg: J.ModelConfig, params: J.Params, batch: BatchData,
                  lik_ratio: bool = False):
    """(fn, grads, sum_eff) over a batch; grads is a Params pytree."""

    def total(p):
        f, eff = jax.vmap(
            lambda sd, ra, sg, ng, bk, ef: _read_f(
                cfg, p, sd, ra, sg, ng, lik_ratio, bk, ef)
        )(batch.sd, batch.restrict_ari, batch.lik_sign, batch.is_neg,
          batch.bp_ok, batch.eff)
        f = jnp.where(batch.valid, f, 0.0)
        eff = jnp.where(batch.valid, eff, 0.0)
        return f.sum(), eff.sum()

    (fn, eff), grads = jax.value_and_grad(total, has_aux=True)(params)
    return fn, grads, eff


def eval_file(cfg: J.ModelConfig, params: J.Params, fq_path: str,
              lik_ratio: bool = False, batch_size: int = 0):
    """Full-file fn/gr evaluation (motif_eval.hpp:23-54, no-shuffle).

    Returns (fn, flat_grad_in_reference_pack_order, sum_eff).
    """
    from ..io.fastq import FastqReader
    qr = FastqReader(fq_path)
    reads = [(r.seq, r.qual) for r in qr.reads()]
    g = J.kernels(cfg).g
    fn_total, eff_total = 0.0, 0.0
    acc = None
    bs = batch_size or len(reads)
    for k in range(0, len(reads), bs):
        batch = stack_reads(cfg, reads[k:k + bs])
        fn, grads, eff = batch_fn_grad(cfg, params, batch, lik_ratio)
        fn_total += float(fn)
        eff_total += float(eff)
        if acc is None:
            acc = grads
        else:
            acc = jax.tree.map(jnp.add, acc, grads)
    flat = J.pack_params(g, acc)
    return fn_total, flat, eff_total
