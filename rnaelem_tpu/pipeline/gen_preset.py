"""Enumerate dot-bracket search patterns of a given length.

Behavioral twin of script/gen_preset.py (the provenance of
pattern_list): enumerate rooted trees as bracket skeletons, distribute
unpaired dots over the remaining positions, and filter trivial loops
('()', '(.)', '(..)') and adjacent closing-opening pairs (')(').
"""
from __future__ import annotations

import itertools
import sys
from typing import Iterator, List


def _trees(max_pairs: int) -> Iterator[List[int]]:
    """Rooted trees as parent arrays (node 0 = virtual root)."""
    def rec(parents):
        yield parents
        if len(parents) - 1 >= max_pairs:
            return
        p = len(parents) - 1
        while p != -1:
            yield from rec(parents + [p])
            p = parents[p]

    yield from rec([-1])


def _brackets(parents: List[int]) -> str:
    children = [[] for _ in parents]
    for i, p in enumerate(parents[1:], 1):
        children[p].append(i)

    def render(v):
        return "".join("(" + render(c) + ")" for c in children[v])

    return render(0)


def patterns(length: int) -> Iterator[str]:
    seen = set()
    for tree in _trees(length // 2):
        bk = _brackets(tree)
        nbp = len(bk)
        if nbp > length:
            continue
        for nb in range(length - nbp + 1):
            total = nbp + nb
            for combo in itertools.combinations(range(total), nbp):
                rss = ["."] * total
                for ci, pos in zip(combo, range(nbp)):
                    rss[ci] = bk[pos]
                s = "".join(rss)
                if ("()" in s or "(.)" in s or "(..)" in s
                        or ")(" in s):
                    continue
                if len(s) != length:
                    continue
                if s not in seen:
                    seen.add(s)
                    yield s


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    n = int(argv[0]) if argv else 7
    for p in patterns(n):
        print(p)


if __name__ == "__main__":
    main()
