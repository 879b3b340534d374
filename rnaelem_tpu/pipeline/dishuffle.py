"""Dinucleotide-preserving shuffle of a FASTA file.

Purpose-equivalent to script/dishuffle.py (Altschul-Erikson): generates
negatives that exactly preserve dinucleotide counts.  Implemented on the
shared k-let Euler-walk shuffler (pipeline/ushuffle.py) with k=2, which
samples from the same uniform distribution over dinucleotide-preserving
permutations.
"""
from __future__ import annotations

import sys

import numpy as np

from .kmer_psp import parse_fasta
from .ushuffle import klet_shuffle


def run(fasta_path: str, out=sys.stdout, seed: int = 0):
    rng = np.random.RandomState(seed)
    for ann, seq in parse_fasta(fasta_path):
        s = seq.upper().replace("T", "U")
        out.write(f"{ann}\n{klet_shuffle(s, 2, rng)}\n")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("Usage: dishuffle FASTA", file=sys.stderr)
        raise SystemExit(1)
    run(argv[0])


if __name__ == "__main__":
    main()
