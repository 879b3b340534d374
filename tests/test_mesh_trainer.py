"""Production multi-chip training path: `rnaelem train` on an 8-device
mesh must write a train.model BYTE-IDENTICAL to the single-device run.

This works because the training step never reduces across reads on
device: per-read (f, grad, eff) come back with the batch axis intact
(objective.per_read_core) and the host sums them in read order
(objective.reduce_per_read) — the same deterministic contract as the
reference's TR_ARRAY text-file all-reduce
(/root/reference/RNAelem/motif_array_trainer.hpp:20-58).
"""
import os
import subprocess
import sys

import numpy as np

import jax

from rnaelem_tpu import cli

# see tests/test_mesh_parallel.py: the first mesh-sharded CPU compile in
# a long-lived process segfaults this jaxlib, so the mesh-compiling test
# re-runs itself in a fresh interpreter
_INNER = os.environ.get("RNAELEM_MESH_INNER") == "1"


def _write_fq(path, n, L, seed=7):
    rng = np.random.RandomState(seed)
    with open(path, "w") as f:
        for i in range(n):
            s = "".join("ACGU"[c] for c in rng.randint(0, 4, L))
            qual = "".join(chr(33 + int(q))
                           for q in rng.randint(5, 25, L))
            sentinel = "!" if i % 2 == 0 else chr(33 + 5)
            f.write(f"@r{i}\n{s}\n+\n{qual}{sentinel}\n")


def _run(tmp_path, tag, mesh_flag):
    out1 = str(tmp_path / f"train.{tag}.model")
    fq = str(tmp_path / "train.fq")
    cli.main(["train", "-f", fq, "-m", "(...)",
              "-i", "3", "--batch-size", "8",
              "-w", "12", "-c", "8", "-p", "0",
              "--mesh", mesh_flag,
              "--out1", out1, "--out3", "~NULL~"])
    with open(out1, "rb") as f:
        return f.read()


def test_mesh_train_model_byte_identical(tmp_path):
    if not _INNER:
        env = dict(os.environ, RNAELEM_MESH_INNER="1",
                   JAX_ENABLE_COMPILATION_CACHE="false")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q",
             f"{__file__}::test_mesh_train_model_byte_identical"],
            env=env, capture_output=True, text=True, timeout=1200)
        assert r.returncode == 0, (r.stdout[-3000:] + r.stderr[-2000:])
        return
    assert len(jax.devices()) >= 8, jax.devices()
    _write_fq(str(tmp_path / "train.fq"), 8, 14)
    single = _run(tmp_path, "single", "0")
    meshed = _run(tmp_path, "mesh", "8")
    assert b"pattern" in single and len(single) > 100
    assert meshed == single
