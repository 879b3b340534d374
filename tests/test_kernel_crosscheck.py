"""Cross-checks between the two DP kernels so they cannot silently
diverge (SURVEY §7.1 "one DP kernel, three semirings"):

1. the batched sum-semiring kernel (ops/dp.py) against the per-read
   kernel (ops/dp_max.py, semiring="sum") on a heterogeneous-length
   B>1 batch — values to 1e-9 in f64, per-read parameter gradients
   against the per-read kernel's gradients;
2. in a degenerate single-path configuration (fix_rss + no_ene +
   no_theta) the max and sum semirings agree exactly, pinning the
   max/CYK twin to the production kernel.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rnaelem_tpu.alphabet import seq_to_ints
from rnaelem_tpu.model import joint as J
from rnaelem_tpu.ops import dp_max as DPM
from rnaelem_tpu.train import objective as OBJ


def _reads(cfg, lens, seed=11):
    rng = np.random.RandomState(seed)
    out = []
    for i, L in enumerate(lens):
        s = "".join("ACGU"[c] for c in rng.randint(0, 4, L))
        q = np.full(L + 1, 12)
        q[-1] = 0 if i % 2 == 0 else 6
        out.append((seq_to_ints(s), q))
    return out


def _per_read_parts(cfg, params, sd, bp_ok, semiring):
    k = J.kernels(cfg)
    dp_parts, _ = DPM.build_dp(k.g, k.dims_max, k.tab,
                               jnp.dtype(cfg.dtype), semiring=semiring)
    d, c = J.factors(cfg, params, sd, bp_ok)
    return dp_parts(d, c)


def test_batched_sum_matches_per_read_kernel():
    cfg = J.ModelConfig(pattern="(...)", Lp=26, max_span=24, max_iloop=10,
                        min_bpp=1e-4, tau=0.1, dtype="float64",
                        with_aux=True)
    params = J.init_params(J.kernels(cfg).g, cfg, np.float64)
    params = params._replace(
        singles=params.singles + 0.1 * np.arange(4)[None, :],
        lam=jnp.asarray([0.7, 1.3]))
    reads = _reads(cfg, [14, 22, 26, 18])
    batch = OBJ.stack_reads(cfg, reads)
    parts_b = np.asarray(
        J._batch_logZ_parts_jit(cfg, params, batch.sd, None, batch.bp_ok))
    for i in range(len(reads)):
        sd = jax.tree.map(lambda x: x[i], batch.sd)
        ref = np.asarray(_per_read_parts(cfg, params, sd,
                                         batch.bp_ok[i], "sum"))
        np.testing.assert_allclose(parts_b[i], ref, rtol=1e-9, atol=1e-9)


def test_per_read_grads_match_per_read_kernel():
    cfg = J.ModelConfig(pattern="(.)", Lp=18, max_span=16, max_iloop=8,
                        min_bpp=0.0, tau=0.1, dtype="float64")
    params = J.init_params(J.kernels(cfg).g, cfg, np.float64)
    reads = _reads(cfg, [12, 18, 15])
    batch = OBJ.stack_reads(cfg, reads)
    f_b, gr_b, _ = OBJ.batch_fn_grad_pr(cfg, params, batch)
    k = J.kernels(cfg)
    dp_parts, _ = DPM.build_dp(k.g, k.dims_max, k.tab, jnp.float64)

    for i in range(len(reads)):
        sd = jax.tree.map(lambda x: x[i], batch.sd)

        def f_of(p):
            d, c = J.factors(cfg, p, sd, batch.bp_ok[i])
            parts = dp_parts(d, c)
            from rnaelem_tpu.ops.semiring import lse, NEG
            z_all = lse(parts, axis=-1)
            z_r = lse(jnp.where(jnp.asarray([False, True, True]),
                                parts, NEG), axis=-1) \
                if bool(batch.restrict_ari[i]) else parts[0]
            return z_all - z_r

        fi, gri = jax.value_and_grad(f_of)(params)
        np.testing.assert_allclose(float(f_b[i]), float(fi), rtol=1e-9)
        for a, b in zip(jax.tree.leaves(
                jax.tree.map(lambda x: x[i], gr_b)),
                jax.tree.leaves(gri)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-10)


def test_max_equals_sum_on_single_path():
    """With the structure pinned, energies off and theta pinned to 1,
    exactly one parse path survives per (structure, motif placement)
    class; in the fully constrained single-path case max == sum."""
    cfg = J.ModelConfig(pattern="(...)", Lp=12, max_span=12, max_iloop=4,
                        min_bpp=0.0, turn=0, tau=0.0, no_ene=True,
                        no_theta=True, fix_rss=True, dtype="float64")
    params = J.init_params(J.kernels(cfg).g, cfg, np.float64)
    seq = seq_to_ints("GGAAACCGGAAA")
    rss = "((...))....."
    sd = J.make_seqdata(cfg, seq, None, rss=rss)
    bp_ok, _ = J.effective_bp_mask(cfg, sd)
    mx = np.asarray(_per_read_parts(cfg, params, sd, bp_ok, "max"))
    sm = np.asarray(_per_read_parts(cfg, params, sd, bp_ok, "sum"))
    # nasi part (no motif): unique parse of the pinned structure
    np.testing.assert_allclose(mx[0], sm[0], rtol=1e-12)
    # motif parts: sum counts placements, max picks one -> sum >= max
    assert np.all(sm + 1e-12 >= mx)
    assert np.isfinite(mx[1:]).any()
