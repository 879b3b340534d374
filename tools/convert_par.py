#!/usr/bin/env python
"""Convert a ViennaRNA 2.0 .par file (plain or C-string-literal quoted)
into the pre-parsed .npz shipped with rnaelem_tpu.

Usage: python tools/convert_par.py IN.par OUT.npz [name]
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from rnaelem_tpu.energy.params import parse_par_text  # noqa: E402


def main():
    inp, outp = sys.argv[1], sys.argv[2]
    name = sys.argv[3] if len(sys.argv) > 3 else "custom"
    with open(inp) as f:
        p = parse_par_text(f.read(), name=name)
    p.save_npz(outp)
    print("wrote", outp)


if __name__ == "__main__":
    main()
