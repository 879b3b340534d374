"""Positional-inference ROC post-processor: per-position rows from
scan.raw, ranked by descending inner posterior and labeled by the
planted decoy-site interval (/root/reference/script/_run-rnaelem-h3.py)."""
import io
import math

import numpy as np


def _raw_record(read_id, inner_logs, seq):
    vec = "[" + ",".join("%g" % v for v in inner_logs) + "]"
    L = len(seq)
    zeros = "[" + ",".join(["-1"] * L) + "]"
    return (f"id: {read_id}\n"
            f"start: {zeros}\n"
            f"end: {zeros}\n"
            f"inner: {vec}\n"
            f"psihat: [" + ",".join(["0"] * L) + "]\n"
            "motif region: 1 - 3\n"
            "exist prob: 0.5\n"
            f"seq: {seq}\n"
            f"rss: {'O' * L}\n"
            f"mot: {' ' * L}\n")


def test_rows_ranked_and_labeled(tmp_path):
    from rnaelem_tpu.pipeline.positional_roc import run

    # 4 positions; planted site [1, 3); posterior peaks inside it
    inner = [math.log(p) for p in (0.1, 0.9, 0.6, 0.2)]
    raw = tmp_path / "scan.raw"
    raw.write_text(
        _raw_record("@mark:1;index:2;decoy-site:1-3;", inner, "ACGU"))
    out = io.StringIO()
    run([str(raw)], out)
    rows = [l.split("\t") for l in out.getvalue().strip().splitlines()]
    assert len(rows) == 4
    # ranked by descending posterior: positions 1, 2, 3, 0
    probs = [float(r[2]) for r in rows]
    assert probs == sorted(probs, reverse=True)
    np.testing.assert_allclose(probs, [0.9, 0.6, 0.2, 0.1], rtol=1e-5)
    assert [int(r[0]) for r in rows] == [1, 1, 0, 0]   # in-site labels
    assert [int(r[1]) for r in rows] == [0, 1, 2, 3]   # rank column


def test_missing_decoy_site_all_negative(tmp_path):
    from rnaelem_tpu.pipeline.positional_roc import run

    raw = tmp_path / "scan.raw"
    raw.write_text(_raw_record("@plain_read", [-1.0, -2.0], "AC"))
    out = io.StringIO()
    run([str(raw)], out)
    rows = [l.split("\t") for l in out.getvalue().strip().splitlines()]
    assert [int(r[0]) for r in rows] == [0, 0]


def test_elem_roc_subcommand(tmp_path, capsys):
    from rnaelem_tpu.pipeline.elem import main

    raw = tmp_path / "scan.raw"
    raw.write_text(
        _raw_record("@decoy-site:0-1;", [math.log(0.8), math.log(0.1)],
                    "AC"))
    main(["roc", str(raw)])
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0].split("\t")[0] == "1"
