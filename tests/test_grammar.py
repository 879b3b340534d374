"""Grammar compiler parity vs reference ProfileHMM dumps
(tests/golden/hmm_*.txt, generated from profile_hmm.hpp:206-463)."""
import os

import numpy as np
import pytest

from rnaelem_tpu.grammar.profile import compile_pattern, dump

GOLD = os.path.join(os.path.dirname(__file__), "golden")

PATTERNS = [".", "(.)", "(.*)", ".*.", "(.).(.)", "(.)*(.)", "....",
            "..*..", "(.....)", "((..))", "(*)", ".(*)."]


def gold_name(p):
    return "hmm_" + p.translate(str.maketrans("().*", "PQDS")) + ".txt"


@pytest.mark.parametrize("pattern", PATTERNS)
def test_state_machine_matches_reference(pattern):
    with open(os.path.join(GOLD, gold_name(pattern))) as f:
        gold = f.read()
    lines = gold.splitlines()
    split = lines.index([l for l in lines if l.startswith("loopstates:")][0])
    gold_dump = "\n".join(lines[:split])

    g = compile_pattern(pattern)
    assert dump(g) == gold_dump, f"state machine differs for {pattern!r}"

    meta = {}
    i = split
    loopstates = [int(x) for x in lines[i].split()[1:]]
    quad = []
    i += 2
    while not lines[i].startswith("thetaid:"):
        quad.append([int(x) for x in lines[i].split()])
        i += 1
    thetaid = [int(x) for x in lines[i].split()[1:]]
    tables = [int(x) for x in lines[i + 1].split()[1:]]

    assert list(np.nonzero(g.loop_mask)[0]) == loopstates
    assert g.ep_tuples.tolist() == quad
    assert g.theta_id.tolist() == thetaid
    assert g.table_sizes == tables


def test_normalize():
    assert compile_pattern("**.**.*").reg_pattern == ".*."
    assert compile_pattern("(.....)").S >= 20
