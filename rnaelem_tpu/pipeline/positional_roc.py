"""Positional-inference ROC rows from scan.raw — the paper's
per-position benchmark post-processor (script/_run-rnaelem-h3.py:1-38).

For every scan record, positions are ranked by descending inner-motif
posterior; each position i emits one TSV row

    x <TAB> rank <TAB> P(inner at i)

where x = 1 iff i falls inside the planted ``decoy-site:b-e`` interval
annotated in the read id (the header convention written by
conv_uniq_fasta.py / the synthetic decoy generators).  Concatenated
rows across reads are directly consumable as a positional ROC table.

Two deliberate adaptations from the reference script, which predates
the current raw format: records are parsed by field NAME from the
10-line record (motif_scanner.hpp:240-252) rather than by a fixed
9-line frame, and all L inner positions are ranked (the reference's
``[:-1]`` dropped the final position of an older L+1-length vector).
"""
from __future__ import annotations

import sys

import numpy as np

from .elem import parse_raw


def _parse_vec(s: str) -> np.ndarray:
    vals = [v for v in s.strip().strip("[]").split(",") if v]
    return np.array([float(v) for v in vals])


def _annotations(read_id: str) -> dict:
    """``key:value;`` annotation fields of a read id (the id may lead
    with '@' and contain non-annotation text; malformed fields are
    skipped like the reference's bare dict() would not)."""
    out = {}
    for fld in read_id.lstrip("@").split(";"):
        if ":" in fld:
            k, _, v = fld.partition(":")
            out[k.strip()] = v.strip()
    return out


def rows_for_record(rec: dict):
    """(x, rank, prob) rows for one parsed raw record, ranked by
    descending inner posterior (_run-rnaelem-h3.py:29-38)."""
    inner = np.exp(_parse_vec(rec["inner"]))
    annot = _annotations(rec.get("id", ""))
    b = e = -1
    try:
        b, e = map(int, annot["decoy-site"].split("-"))
    except (KeyError, ValueError):
        pass
    order = np.argsort(inner, kind="stable")[::-1]
    return [(1 if b <= i < e else 0, j, float(inner[i]))
            for j, i in enumerate(order)]


def run(raw_paths, out=None):
    if out is None:
        out = sys.stdout
    for path in raw_paths:
        for rec in parse_raw(path):
            for x, j, p in rows_for_record(rec):
                out.write(f"{x}\t{j}\t{p}\n")


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        prog="elem-positional-roc",
        description="per-position motif-inference ROC rows from "
                    "scan.raw files")
    ap.add_argument("raw", nargs="+", help="scan.raw file(s)")
    args = ap.parse_args(argv)
    try:
        run(args.raw)
    except BrokenPipeError:
        sys.exit(0)      # downstream `head`-style consumers


if __name__ == "__main__":
    main()
