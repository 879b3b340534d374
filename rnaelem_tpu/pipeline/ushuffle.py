"""k-let preserving sequence shuffle (Euler-walk).

Reimplements the behavioral contract of the reference's ushuffle C
library (Jiang et al. uShuffle; RNAelem/ushuffle/ushuffle.c): a uniform
random shuffle of the sequence that exactly preserves all k-let
(substring of length k) counts, built from a random arborescence on the
(k-1)-let de Bruijn multigraph followed by an Euler walk.

Determinism contract: the trainer seeds per read with
(count of first base in the read) + iteration (motif_trainer.hpp:146-152).
The exact pseudo-random stream differs from the C library (we use numpy's
RandomState rather than libc rand), so shuffled negatives are
reproducible run-to-run here but not bit-identical to the reference's.

A C++ twin lives in native/ for the hot serving path.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def klet_shuffle(seq: str, k: int, rng: np.random.RandomState) -> str:
    """Return a uniform k-let-preserving shuffle of seq."""
    n = len(seq)
    if k >= n or k <= 1:
        # k<=1: plain shuffle preserving composition; k>=n: identity
        if k <= 1 and n > 1:
            arr = np.array(list(seq))
            rng.shuffle(arr)
            return "".join(arr)
        return seq

    km1 = k - 1
    verts = {}
    labels = []

    def vid(s):
        if s not in verts:
            verts[s] = len(labels)
            labels.append(s)
        return verts[s]

    edges = [[] for _ in range(n)]  # adjacency: out-edges per vertex
    seq_v = [vid(seq[i:i + km1]) for i in range(n - km1 + 1)]
    nv = len(labels)
    adj = [[] for _ in range(nv)]
    for t in range(len(seq_v) - 1):
        adj[seq_v[t]].append(seq_v[t + 1])

    root = seq_v[-1]

    # random arborescence toward root via loop-erased random walks
    # (Wilson's algorithm, as in ushuffle.c shuffle1)
    last_exit = [None] * nv
    in_tree = [False] * nv
    in_tree[root] = True
    for v0 in range(nv):
        v = v0
        path = {}
        while not in_tree[v]:
            nxt = adj[v][rng.randint(len(adj[v]))]
            path[v] = nxt
            v = nxt
        v = v0
        while not in_tree[v]:
            last_exit[v] = path[v]
            in_tree[v] = True
            v = path[v]

    # shuffle the remaining out-edges of every vertex; append the
    # arborescence edge last so the Euler walk terminates properly
    out = []
    for v in range(nv):
        rest = list(adj[v])
        if last_exit[v] is not None:
            rest.remove(last_exit[v])
        rng.shuffle(rest)
        if last_exit[v] is not None:
            rest.append(last_exit[v])
        out.append(rest)

    # Euler walk from the first vertex
    ptr = [0] * nv
    v = seq_v[0]
    walk = [v]
    for _ in range(len(seq_v) - 1):
        nxt = out[v][ptr[v]]
        ptr[v] += 1
        walk.append(nxt)
        v = nxt
    res = labels[walk[0]]
    for v in walk[1:]:
        res += labels[v][-1]
    return res


def negative_for(seq: str, k: int, iter_cnt: int) -> str:
    """Deterministic shuffled negative for a read: seed =
    count(first base) + iteration (motif_trainer.hpp:145-152).

    Runs the native C++ Euler-walk when available (the trainer calls
    this per read per epoch); the Python walk above is the always-
    available fallback and the semantic reference.  Both are
    deterministic in the seed; their pseudo-random streams differ.
    """
    if not seq:
        return seq
    seed = seq.count(seq[0]) + iter_cnt
    from ..native import klet_shuffle_native
    out = klet_shuffle_native(seq, k, seed & 0x7FFFFFFF)
    if out is not None:
        return out
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    return klet_shuffle(seq, k, rng)
