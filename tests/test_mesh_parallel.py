"""Data-parallel training step: the psum-reduced (fn, grad, eff) over an
8-device mesh must equal the single-device evaluation (the multi-host
test the reference lacks; SURVEY §4 item (e)).

The mesh-compiling test re-runs itself in a FRESH interpreter: this
jaxlib segfaults inside backend_compile_and_load when its first
mesh-sharded CPU executable is built late in a long-lived process
(reproduced at the same suite position across four full-suite runs,
with and without the persistent compilation cache; every mesh test
passes in isolation)."""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnaelem_tpu.alphabet import seq_to_ints
from rnaelem_tpu.model import joint as J
from rnaelem_tpu.parallel import mesh as MESH
from rnaelem_tpu.train import objective as OBJ

_INNER = os.environ.get("RNAELEM_MESH_INNER") == "1"


def _rerun_isolated(test_name, timeout=900):
    # cache OFF in the child: writing a mesh-sharded executable to the
    # persistent cache is this jaxlib's other reproducible segfault
    env = dict(os.environ, RNAELEM_MESH_INNER="1",
               JAX_ENABLE_COMPILATION_CACHE="false")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-x", "-q",
         f"{__file__}::{test_name}"],
        env=env, capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, (r.stdout[-3000:] + r.stderr[-2000:])


def _toy_batch(cfg, n, seed=0):
    rng = np.random.RandomState(seed)
    reads = []
    for i in range(n):
        s = "".join("ACGU"[c] for c in rng.randint(0, 4, cfg.Lp - 2))
        q = np.full(len(s) + 1, 10)
        q[-1] = 0 if i % 2 == 0 else 5
        reads.append((seq_to_ints(s), q))
    return OBJ.stack_reads(cfg, reads)


def test_psum_grad_equals_single_device():
    if not _INNER:
        _rerun_isolated("test_psum_grad_equals_single_device")
        return
    assert len(jax.devices()) >= 8, jax.devices()
    cfg = J.ModelConfig(pattern="(...)", Lp=24, max_span=24, max_iloop=8,
                        min_bpp=0.0, tau=0.1, dtype="float64")
    params = J.init_params(J.kernels(cfg).g, cfg, jnp.float64)
    batch = _toy_batch(cfg, 8)

    fn1, gr1, eff1 = OBJ.batch_fn_grad(cfg, params, batch)

    m = MESH.data_mesh(jax.devices()[:8])
    step = MESH.make_sharded_fn_grad(cfg, m)
    fn8, gr8, eff8 = step(params, batch)

    assert float(fn8) == pytest.approx(float(fn1), rel=1e-12)
    assert float(eff8) == pytest.approx(float(eff1), rel=1e-12)
    for a, b in zip(jax.tree.leaves(gr1), jax.tree.leaves(gr8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-12)


def test_padded_batch_rows_are_inert():
    cfg = J.ModelConfig(pattern="(...)", Lp=24, max_span=24, max_iloop=8,
                        min_bpp=0.0, tau=0.1, dtype="float64")
    params = J.init_params(J.kernels(cfg).g, cfg, jnp.float64)
    batch = _toy_batch(cfg, 5)
    fn1, gr1, _ = OBJ.batch_fn_grad(cfg, params, batch)
    padded = MESH.pad_batch(batch, 8)
    fn2, gr2, _ = OBJ.batch_fn_grad(cfg, params, padded)
    assert float(fn2) == pytest.approx(float(fn1), rel=1e-12)
    for a, b in zip(jax.tree.leaves(gr1), jax.tree.leaves(gr2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10)
