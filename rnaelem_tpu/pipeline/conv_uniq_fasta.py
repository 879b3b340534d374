"""Prefix FASTA headers with a mark and running index
(script/conv_uniq_fasta.py behavioral twin)."""
from __future__ import annotations

import sys

from .kmer_psp import parse_fasta


def run(fasta_path: str, mark: str = "", out=sys.stdout):
    """Header convention of the reference (script/conv_uniq_fasta.py:11-17):
    ``>mark:<mark>;index:<n>;<head>``, the mark clause omitted when no
    mark is given."""
    mk = f"mark:{mark};" if mark else ""
    for i, (ann, seq) in enumerate(parse_fasta(fasta_path)):
        out.write(f">{mk}index:{i};{ann[1:]}\n{seq}\n")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 1:
        print("Usage: conv_uniq_fasta FASTA [MARK]", file=sys.stderr)
        raise SystemExit(1)
    run(argv[0], argv[1] if len(argv) > 1 else "")


if __name__ == "__main__":
    main()
