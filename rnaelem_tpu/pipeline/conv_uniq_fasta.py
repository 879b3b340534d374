"""Prefix FASTA headers with a mark and running index
(script/conv_uniq_fasta.py behavioral twin)."""
from __future__ import annotations

import sys

from .kmer_psp import parse_fasta


def run(fasta_path: str, mark: str, out=sys.stdout):
    for i, (ann, seq) in enumerate(parse_fasta(fasta_path)):
        out.write(f">{mark}{i};{ann[1:]}\n{seq}\n")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print("Usage: conv_uniq_fasta FASTA MARK", file=sys.stderr)
        raise SystemExit(1)
    run(argv[0], argv[1])


if __name__ == "__main__":
    main()
