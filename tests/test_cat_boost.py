"""Ensemble booster (pipeline/cat_boost.py) over synthetic raw files:
feature-matrix assembly must mirror the reference's key/column scheme
(/root/reference/script/rnaelem_cat_boost.py:40-96) and the boosted
regressor must separate an informative pattern column."""
import os

import numpy as np

from rnaelem_tpu.pipeline import cat_boost as CB


def _write_raw(path, probs, prefix):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for i, p in enumerate(probs):
            f.write(f"id: @{prefix}{i}\n")
            f.write("start: [0]\nend: [0]\ninner: [0]\npsihat: [0]\n")
            f.write("motif region: 0 - 1\n")
            f.write(f"exist prob: {p}\n")
            f.write("seq: A\nrss: O\nmot:  \n")


def _make_tree(root, n_pat, rng, sub, layout):
    # pattern 1 is informative (pos ~0.9, neg ~0.1); pattern 2 is noise;
    # pattern 3 has no raw files at all (imputed)
    for i, kind in ((1, "signal"), (2, "noise")):
        for k in ("0", "1"):
            for label, name in enumerate(("negative", "positive")):
                if kind == "signal":
                    probs = rng.uniform(0.8, 1.0, 10) if label \
                        else rng.uniform(0.0, 0.2, 10)
                else:
                    probs = rng.uniform(0, 1, 10)
                if layout == "cv":
                    p = os.path.join(root, sub, f"cv-{k}", "test",
                                     f"pattern-{i}", f"{name}.raw")
                    _write_raw(p, probs, f"k{k}s")
                else:
                    p = os.path.join(root, sub, name, f"pattern-{i}",
                                     "scan.raw")
                    _write_raw(p, probs, "t")


def test_booster_end_to_end(tmp_path):
    rng = np.random.RandomState(0)
    root = str(tmp_path)
    _make_tree(root, 3, rng, "elem_out_w50", "cv")
    _make_tree(root, 3, rng, "scan_out_w50", "scan")

    from pathlib import Path
    Xtr, ytr = CB.get_train_data(Path(root), "elem_out_w50", 3)
    Xte, yte = CB.get_test_data(Path(root), "scan_out_w50", 3)
    assert Xtr.shape[1] == 3 and Xte.shape[1] == 3
    # pattern-3 column has no data anywhere -> all NaN
    assert np.isnan(Xtr[:, 2]).all()
    assert set(ytr) == {0, 1}

    auc = CB.train_and_eval(Xtr, ytr, Xte, yte,
                            tmp_path / "save", n_estimators=50)
    assert auc > 0.9
    assert (tmp_path / "save" / "auc.txt").exists()
    assert (tmp_path / "save" / "features.csv").exists()
    # the informative pattern must rank first in feature importances
    first = open(tmp_path / "save" / "features.csv").readlines()[1]
    assert first.split("\t")[0] == "1"
