"""Motif visualization: sequence/structure logo + 2D structure diagram.

Purpose-equivalent of RNAelem-plot (EPS secondary-structure diagram),
RNAelem-logo (FreeType SVG logo) and script/draw_motif.py, reimplemented
as dependency-free SVG writers:

* ``draw(model_dir, rss_svg, prf_svg, threshold)`` reads the training
  log (E[N] expected counts + motif pattern) and train.raw (exist
  probabilities, psihat state paths), builds the per-node PWM and
  occupancy, and writes both figures.
* the logo stacks base letters scaled by information content (bits);
  base-pair columns show the 6 pair types split per side;
* the structure diagram lays loops out on circles (radial layout like
  RNAelem-plot/struct.hpp:39-94) with '*' gaps dashed; loci whose
  emission entropy is below the threshold get IUPAC letters.
"""
from __future__ import annotations

import math
import os
import re
from typing import Dict, List

import numpy as np

COLORS = {"A": "#1fab36", "C": "#2c67c2", "G": "#f2a93b", "U": "#d22d2d"}
PAIRS = ["CG", "GC", "GU", "UG", "AU", "UA"]
IUPAC = {
    frozenset("A"): "A", frozenset("C"): "C", frozenset("G"): "G",
    frozenset("U"): "U", frozenset("AG"): "R", frozenset("CU"): "Y",
    frozenset("GU"): "K", frozenset("AC"): "M", frozenset("CG"): "S",
    frozenset("AU"): "W", frozenset("CGU"): "B", frozenset("AGU"): "D",
    frozenset("ACU"): "H", frozenset("ACG"): "V",
    frozenset("ACGU"): "N",
}


def parse_log(model_dir: str):
    pattern, en = None, None
    with open(os.path.join(model_dir, "log")) as f:
        for line in f:
            if line.startswith("motif pattern:"):
                pattern = line.split(":", 1)[1].strip()
            elif line.startswith("E[N]:"):
                body = line.split(":", 1)[1].strip()
                en = _parse_nested(body)
    if pattern is None:
        # fall back to the model file
        with open(os.path.join(model_dir, "train.model")) as f:
            for line in f:
                if line.startswith("pattern:"):
                    pattern = line.split(":", 1)[1].strip()
    return pattern, en


def _parse_nested(s: str) -> List[List[float]]:
    out, stack = [], []
    for j, ch in enumerate(s):
        if ch == "[":
            stack.append(j)
        elif ch == "]" and len(stack) > 1:
            i = stack.pop()
            out.append([float(v) for v in s[i + 1: j].split(",") if v])
        elif ch == "]":
            stack.pop()
    return out


def occupancy(model_dir: str, M: int, pattern: str = ""):
    """Per-node coverage fraction + mean gap length per '*' node from
    psihat paths weighted by exist prob (reference draw_motif.py:60-107
    — including its cumulative-z weighting, reproduced for parity:
    the reference accumulates `z += exist_prob` BEFORE weighting, so
    later reads weigh more)."""
    occ = np.zeros(M)
    n = 0
    raw = os.path.join(model_dir, "train.raw")
    # '*' at pattern position i is node i+1 (draw_motif.py:75)
    pos_gap = [i + 1 for i, ch in enumerate(pattern) if ch == "*"]
    L_gap = np.zeros(len(pos_gap))
    L_gap_div = 0.0
    z = 0.0
    if not os.path.exists(raw):
        return np.ones(M), {}
    ez = None
    with open(raw) as f:
        for line in f:
            if line.startswith("exist prob:"):
                ez = float(line.split(":", 1)[1])
            elif line.startswith("psihat:"):
                path = [int(v) for v in
                        line.split(":", 1)[1].strip()[1:-1].split(",")
                        if v]
                n += 1
                for h in set(path):
                    if 0 <= h < M:
                        occ[h] += 1
                if ez is not None and pos_gap:
                    z += ez
                    for gi, pg in enumerate(pos_gap):
                        L_gap[gi] += z * sum(1 for y in path if y == pg)
                    L_gap_div += z
    gaps = {pg: (L_gap[gi] / L_gap_div if L_gap_div > 0 else 0.0)
            for gi, pg in enumerate(pos_gap)}
    return (occ / max(n, 1)), gaps


def _entropy(p):
    p = np.asarray(p, float)
    p = p / max(p.sum(), 1e-12)
    return -(p * np.log2(np.maximum(p, 1e-12))).sum()


def _logo_column(x, y0, height, probs, letters, colors, width=20):
    """Stacked letters (tallest on top), scaled to `height`."""
    parts = []
    order = np.argsort(probs)
    y = y0
    for k in order:
        h = probs[k] * height
        if h < 0.5:
            continue
        y_here = y
        parts.append(
            f'<text x="{x + width / 2:.1f}" y="{y_here:.1f}" '
            f'text-anchor="middle" font-family="monospace" '
            f'font-weight="bold" font-size="24" fill="{colors[k]}" '
            f'transform="translate(0,{-(height - (y_here - y0)):.1f}) '
            f'scale(1,{h / 24:.3f}) '
            f'translate(0,{(height - (y_here - y0)) / (h / 24):.1f})">'
            f"{letters[k]}</text>")
        y -= h
    return parts


def draw_logo(pattern: str, en: List[List[float]], occ, out_path: str,
              gaps=None):
    nodes = "z" + pattern + "o"
    M = len(nodes)
    col_w, height, pad = 24, 96, 30
    cols = []
    tid = 0  # table 0 is background
    tids = []
    t = 1
    for h, c in enumerate(nodes):
        if c in ".)":
            tids.append(t)
            t += 1
        else:
            tids.append(0 if c in "zo*" else -1)
    draw_nodes = [h for h in range(1, M - 1)]
    svg = [f'<svg xmlns="http://www.w3.org/2000/svg" '
           f'width="{len(draw_nodes) * col_w + 2 * pad}" '
           f'height="{height + 60}">']
    x = pad
    for h in draw_nodes:
        c = nodes[h]
        if c == "*":
            svg.append(
                f'<text x="{x + col_w / 2}" y="{height + 20}" '
                f'text-anchor="middle" font-size="16">*</text>')
            if gaps and h in gaps:
                # mean gap length annotation (reference
                # draw_motif.py:85-107 meta row)
                svg.append(
                    f'<text x="{x + col_w / 2}" y="{height + 40}" '
                    f'text-anchor="middle" font-size="10">'
                    f'{gaps[h]:.1f}nt</text>')
            x += col_w
            continue
        if c == "(":
            svg.append(
                f'<text x="{x + col_w / 2}" y="{height + 20}" '
                f'text-anchor="middle" font-size="14">(</text>')
            x += col_w
            continue
        if en is not None and 0 < tids[h] <= len(en) - 0 and \
                tids[h] < len(en):
            p = np.asarray(en[tids[h]], float)
        else:
            p = np.ones(6 if c == ")" else 4)
        p = p / max(p.sum(), 1e-12)
        arity = len(p)
        info = (math.log2(arity) - _entropy(p)) * float(occ[h]) \
            if h < len(occ) else math.log2(arity) - _entropy(p)
        colheight = max(4.0, info / math.log2(arity) * height)
        if c == ")":
            letters = PAIRS
            colors = ["#888888"] * 6
            # split color: left base grey, right base colored
            colors = [COLORS[pp[1]] for pp in PAIRS]
        else:
            letters = "ACGU"
            colors = [COLORS[b] for b in "ACGU"]
        svg += _logo_column(x, height, colheight, p, letters, colors,
                            col_w - 4)
        svg.append(
            f'<text x="{x + col_w / 2}" y="{height + 20}" '
            f'text-anchor="middle" font-size="14">{c}</text>')
        x += col_w
    svg.append(
        f'<line x1="{pad}" y1="{height + 2}" x2="{x}" '
        f'y2="{height + 2}" stroke="black"/>')
    svg.append("</svg>")
    with open(out_path, "w") as f:
        f.write("\n".join(svg))


def _layout_structure(pattern: str):
    """Radial loop layout (struct.hpp:39-94 flavor): place each loop's
    members on a circle, recurse into helices."""
    n = len(pattern)
    pair = [-1] * n
    stack = []
    for i, c in enumerate(pattern):
        if c == "(":
            stack.append(i)
        elif c == ")":
            j = stack.pop()
            pair[i], pair[j] = j, i
    xy = [(0.0, 0.0)] * n
    R = 16.0

    def place(lo, hi, cx, cy, ang_in):
        members = []
        k = lo
        while k <= hi:
            members.append(k)
            if pattern[k] == "(" and pair[k] > k:
                k = pair[k]
                members.append(k)
            k += 1
        m = max(len(members), 3)
        r = R * m / (2 * math.pi) + R
        for idx, k2 in enumerate(members):
            ang = ang_in + 2 * math.pi * (idx + 1) / (m + 1)
            xy[k2] = (cx + r * math.cos(ang), cy + r * math.sin(ang))
        idx = 0
        k = lo
        while k <= hi:
            if pattern[k] == "(" and pair[k] > k:
                x1, y1 = xy[k]
                ang = math.atan2(y1 - cy, x1 - cx)
                place(k + 1, pair[k] - 1,
                      x1 + 2 * R * math.cos(ang),
                      y1 + 2 * R * math.sin(ang), ang + math.pi)
                k = pair[k]
            k += 1

    place(0, n - 1, 0.0, 0.0, math.pi / 2)
    return xy, pair


def draw_structure(pattern: str, en, occ, threshold: float,
                   out_path: str):
    xy, pair = _layout_structure(pattern)
    xs = [p[0] for p in xy]
    ys = [p[1] for p in xy]
    x0, y0 = min(xs) - 30, min(ys) - 30
    wd, ht = max(xs) - x0 + 30, max(ys) - y0 + 30
    svg = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{wd:.0f}" '
           f'height="{ht:.0f}">']

    def pt(i):
        return xy[i][0] - x0, xy[i][1] - y0

    for i in range(len(pattern) - 1):
        (xa, ya), (xb, yb) = pt(i), pt(i + 1)
        dash = ' stroke-dasharray="4,3"' if "*" in pattern[i:i + 2] \
            else ""
        svg.append(f'<line x1="{xa:.1f}" y1="{ya:.1f}" x2="{xb:.1f}" '
                   f'y2="{yb:.1f}" stroke="black"{dash}/>')
    for i, c in enumerate(pattern):
        if c == "(" and pair[i] > i:
            (xa, ya), (xb, yb) = pt(i), pt(pair[i])
            svg.append(
                f'<line x1="{xa:.1f}" y1="{ya:.1f}" x2="{xb:.1f}" '
                f'y2="{yb:.1f}" stroke="#999" stroke-width="3"/>')
    # letters for confident loci
    nodes = "z" + pattern + "o"
    t = 1
    tids = [0 if c in "zo*" else (-1 if c in "(<>" else None)
            for c in nodes]
    for h, c in enumerate(nodes):
        if tids[h] is None:
            tids[h] = t
            t += 1
    for i, c in enumerate(pattern):
        x, y = pt(i)
        label = {".": "•", "*": "*", "(": "(", ")": ")"}[c] \
            if c in ".*()" else c
        if en is not None and c in ".)":
            tid = tids[i + 1]
            p = np.asarray(en[tid], float)
            if c == ")":
                # project pair distribution onto right-base identity
                b = np.zeros(4)
                for k2, pp in enumerate(PAIRS):
                    b["ACGU".index(pp[1])] += p[k2]
                p = b
            if _entropy(p) < threshold:
                keep = frozenset(
                    b for k2, b in enumerate("ACGU")
                    if p[k2] / max(p.sum(), 1e-12) > 0.15)
                label = IUPAC.get(keep or frozenset("ACGU"), "N")
        svg.append(
            f'<circle cx="{x:.1f}" cy="{y:.1f}" r="8" fill="white" '
            f'stroke="black"/>')
        svg.append(
            f'<text x="{x:.1f}" y="{y + 4:.1f}" text-anchor="middle" '
            f'font-size="11" font-family="monospace">{label}</text>')
    svg.append("</svg>")
    with open(out_path, "w") as f:
        f.write("\n".join(svg))


def draw(model_dir: str, rss_out: str, prf_out: str,
         threshold: float = 1.5):
    pattern, en = parse_log(model_dir)
    if pattern is None:
        raise RuntimeError("no pattern found in " + model_dir)
    pattern = pattern.replace("_", ".")
    occ, gaps = occupancy(model_dir, len(pattern) + 2, pattern)
    draw_logo(pattern, en, occ, prf_out, gaps)
    draw_structure(pattern, en, occ, threshold, rss_out)


def main(argv=None):
    import sys
    argv = argv if argv is not None else sys.argv[1:]
    draw(argv[0], argv[1], argv[2],
         float(argv[3]) if len(argv) > 3 else 1.5)


if __name__ == "__main__":
    main()
