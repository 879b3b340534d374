"""FASTA -> FASTQ conversion with k-mer-enrichment positional priors.

Behavioral twin of script/kmer-psp.py: pick the k in [3,10] whose most
positively-enriched k-mer (Fisher exact test on per-sequence presence
counts, positives vs negatives) is most significant; encode per-position
quality as 10 +/- the number of covering enriched/depleted k-mers
(clamped printable) and append the '!' (q=0) has-motif sentinel.
Without negatives: flat quality 10 + sentinel.
"""
from __future__ import annotations

import re
import sys
from typing import Dict, Iterator, List, Tuple

import numpy as np

KMIN, KMAX, THRESH, BASE = 3, 10, 5e-2, 10


def parse_fasta(path: str) -> Iterator[Tuple[str, str]]:
    ann, seq = None, []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if ann is not None and seq:
                    yield ann, "".join(seq)
                ann, seq = line, []
            else:
                seq.append(line)
    if ann is not None and seq:
        yield ann, "".join(seq)


def _presence_counts(path: str, k: int) -> Tuple[int, Dict[str, int]]:
    n, cnt = 0, {}
    for _, seq in parse_fasta(path):
        n += 1
        for km in set(seq[i:i + k] for i in range(len(seq) - k)):
            cnt[km] = cnt.get(km, 0) + 1
    return n, cnt


def _enriched(pos_path, neg_path, k):
    from scipy.stats import fisher_exact
    nT, nP = _presence_counts(pos_path, k)
    nF, nN = _presence_counts(neg_path, k)
    rich, poor = [], []
    for km, c in nP.items():
        if km not in nN:
            continue
        p = fisher_exact([[c, nN[km]], [nT - c, nF - nN[km]]])[1]
        if nN[km] < c:
            if p < THRESH:
                print(f"+{km}\t{p:f}", file=sys.stderr)
                rich.append((km, p))
        elif p < THRESH:
            print(f"-{km}\t{p:f}", file=sys.stderr)
            poor.append((km, p))
    return rich, poor


def write_fastq(pos_path: str, rich, poor, out):
    for ann, seq in parse_fasta(pos_path):
        q = np.full(len(seq), float(BASE), np.float32)
        for km, _ in rich:
            for mm in re.finditer(re.escape(km), seq):
                q[mm.start(): mm.start() + len(km)] += 1
        for km, _ in poor:
            for mm in re.finditer(re.escape(km), seq):
                q[mm.start(): mm.start() + len(km)] -= 1
        qs = "".join(
            chr(max(min(ord("!") + int(round(float(v))), ord("~")),
                    ord("!")))
            for v in q)
        out.write(f"@{ann[1:]}\n{seq}\n+\n{qs}!\n")


def run(pos_path: str, neg_path: str = None, out=sys.stdout):
    if neg_path is None:
        write_fastq(pos_path, [], [], out)
        return
    best_k, best_p = -1, 1.0
    for k in range(KMIN, KMAX + 1):
        rich, _ = _enriched(pos_path, neg_path, k)
        if not rich:
            continue
        p = min(p for _, p in rich)
        if p < best_p:
            best_k, best_p = k, p
    if best_k < 0:
        write_fastq(pos_path, [], [], out)
        return
    print(f"k:{best_k}", file=sys.stderr)
    rich, poor = _enriched(pos_path, neg_path, best_k)
    write_fastq(pos_path, rich, poor, out)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    run(argv[0], argv[1] if len(argv) > 1 else None)


if __name__ == "__main__":
    main()
