"""File-based distributed objective evaluation — the reference's SGE
array-job backend (arrayjob_manager.hpp:121-151 submit,
motif_array_trainer.hpp:20-58 collect, motif_eval.hpp:23-54 slave) as a
queue-agnostic subprocess fan-out.

This is the no-mesh fallback: when chips ARE connected, the mesh path
(parallel/mesh.py) replaces the whole protocol with one SPMD program.
Here the channel is the shared filesystem, exactly like the reference:
the master writes a model snapshot (through the same 6-significant-
digit model writer the reference broadcasts with), slaves each evaluate
fn/gr over their `assigned_range` slice of the FASTQ and write a
17-digit `tmp-<tid>` text file, and the master parses and sums them.

A custom scheduler (qsub & co.) can be swapped in by passing `submit`;
the default runs the slaves as local subprocesses with `SGE_TASK_ID`
set, which is also how the 2-slave test exercises the protocol.
"""
from __future__ import annotations

import os
import subprocess
import sys
from typing import Callable, List, Optional

import numpy as np

F_INDEX, F_FN, F_GR, F_EFF = 1, 2, 4, 8
F_ALL = F_INDEX | F_FN | F_GR | F_EFF


def collect_fn_gr_eff(tmp_prefix: str, n: int):
    """Parse and sum the n slave files `<tmp_prefix>-<tid>` with the
    reference's field-bitmask and duplicate-index checks
    (motif_array_trainer.hpp:29-56).  Returns (fn, gr, sum_eff)."""
    fn_total, eff_total = 0.0, 0.0
    gr_total: Optional[np.ndarray] = None
    seen = set()
    for tid in range(1, n + 1):
        path = f"{tmp_prefix}-{tid}"
        got = 0
        for line in open(path):
            line = line.strip()
            if line.startswith("index:"):
                idx = int(line.split(":")[1].split("/")[0])
                if idx in seen:
                    raise ValueError(f"duplicate slave index {idx}")
                seen.add(idx)
                got |= F_INDEX
            elif line.startswith("fn:"):
                fn_total += float(line.split(":", 1)[1])
                got |= F_FN
            elif line.startswith("gr:"):
                vec = np.array([
                    float(v) for v in
                    line.split(":", 1)[1].strip().strip("[]").split(",")
                    if v])
                gr_total = vec if gr_total is None else gr_total + vec
                got |= F_GR
            elif line.startswith("sum eff:"):
                eff_total += float(line.split(":", 1)[1])
                got |= F_EFF
        if got != F_ALL:
            raise ValueError(
                f"broken slave file {path}: field mask {got:04b}")
    return fn_total, gr_total, eff_total


def submit_local(slave_argv: List[str], n: int,
                 env: Optional[dict] = None) -> None:
    """Run n slaves as local subprocesses, rank via SGE_TASK_ID
    (the reference's DBG_ARRAY-compatible env contract,
    arrayjob_manager.hpp:110-119), and block until all finish —
    the subprocess equivalent of `qsub -t 1-N -sync y`."""
    procs = []
    for tid in range(1, n + 1):
        e = dict(env if env is not None else os.environ)
        e["SGE_TASK_ID"] = str(tid)
        procs.append(subprocess.Popen(
            slave_argv, env=e, stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE, text=True))
    errs = [p.communicate()[1] for p in procs]
    for p, err in zip(procs, errs):
        if p.returncode != 0:
            raise RuntimeError(
                f"array-eval slave failed ({p.returncode}):\n"
                f"{err[-2000:]}")


class ArrayEvaluator:
    """Master side of one distributed objective evaluation per call
    (motif_trainer.hpp:608-614): write the model snapshot to `tmp`,
    fan out `rnaelem array-eval --fastq ... --motif-model <tmp>
    --array n --tmp <tmp>` slaves, collect fn/gr/eff."""

    def __init__(self, cfg, n: int, tmp: str, fq: str,
                 lik_ratio: bool = False,
                 submit: Callable = submit_local,
                 python: Optional[str] = None):
        self.cfg = cfg
        self.n = n
        self.tmp = tmp
        self.fq = fq
        self.lik_ratio = lik_ratio
        self.submit = submit
        self.python = python or sys.executable

    def slave_argv(self) -> List[str]:
        argv = [self.python, "-m", "rnaelem_tpu.cli", "array-eval",
                "--fastq", self.fq, "--motif-model", self.tmp,
                "--array", str(self.n), "--tmp", self.tmp,
                "--dtype", str(self.cfg.dtype)]
        if self.lik_ratio:
            argv.append("--lik-ratio")
        return argv

    def __call__(self, params):
        from ..model import io as MIO
        MIO.write_model(self.tmp, self.cfg, params)
        self.submit(self.slave_argv(), self.n)
        return collect_fn_gr_eff(self.tmp, self.n)
