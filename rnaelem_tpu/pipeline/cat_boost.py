"""Ensemble booster over per-pattern exist-prob feature matrices.

Counterpart of the reference's downstream research script
(/root/reference/script/rnaelem_cat_boost.py:1-99): build a feature
matrix X[sequence, pattern] of per-sequence `exist prob` across all
trained patterns (train: the CV test raws under `cv-<k>/test/
pattern-<i>/{positive,negative}.raw`; test: per-dataset
`<name>/pattern-<i>/scan.raw`), fit a gradient-boosted regressor, and
report held-out AUC plus per-pattern feature importances.

CatBoost is not in this image; the regressor is sklearn's
GradientBoostingRegressor (same role: ensemble over pattern scores).
Missing entries (patterns that failed to train/scan — the reference
swallows them with a bare try/except) are imputed with a constant 0,
matching SimpleImputer(strategy="constant").

Usage: python -m rnaelem_tpu.pipeline.cat_boost DATA_DIR SAVE_DIR
           [--train-sub elem_out_w50] [--test-sub scan_out_w50]
           [--n-patterns 200]
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np


def _accumulate(x, y, raw_path, col, n, label):
    """Add one raw file's exist probs into feature column `col`.

    Keys follow the reference: the record's id line suffixed with the
    class label, so the same sequence id in positive and negative sets
    stays distinct (rnaelem_cat_boost.py:48-56)."""
    try:
        with open(raw_path) as f:
            lines = f.readlines()
    except OSError:
        return
    for sid, prob in zip(lines[0::10], lines[6::10]):
        key = sid + str(label)
        if key not in x:
            x[key] = [np.nan] * n
        x[key][col] = float(prob.strip().split(": ")[1])
        y[key] = label


def get_train_data(root: Path, sub_dir: str, n: int):
    x, y = {}, {}
    for k in ("0", "1"):
        for i in range(n):
            for label, fname in enumerate(
                    ("negative.raw", "positive.raw")):
                _accumulate(
                    x, y,
                    root / sub_dir / f"cv-{k}" / "test"
                    / f"pattern-{i + 1}" / fname, i, n, label)
    keys = sorted(x)
    return (np.array([x[k] for k in keys]),
            np.array([y[k] for k in keys]))


def get_test_data(root: Path, sub_dir: str, n: int,
                  dname=("negative", "positive")):
    x, y = {}, {}
    for i in range(n):
        for label in (0, 1):
            _accumulate(
                x, y,
                root / sub_dir / dname[label] / f"pattern-{i + 1}"
                / "scan.raw", i, n, label)
    keys = sorted(x)
    return (np.array([x[k] for k in keys]),
            np.array([y[k] for k in keys]))


def train_and_eval(X_train, y_train, X_test, y_test, save_dir: Path,
                   n_estimators: int = 500, learning_rate: float = 0.05,
                   max_depth: int = 6):
    from sklearn.ensemble import GradientBoostingRegressor
    from sklearn.metrics import roc_auc_score

    # constant imputation (reference: SimpleImputer strategy="constant")
    X_train = np.nan_to_num(X_train, nan=0.0)
    X_test = np.nan_to_num(X_test, nan=0.0)
    model = GradientBoostingRegressor(
        n_estimators=n_estimators, learning_rate=learning_rate,
        max_depth=max_depth)
    model.fit(X_train, y_train)
    y_pred = model.predict(X_test)
    auc = roc_auc_score(y_test, y_pred)
    save_dir.mkdir(parents=True, exist_ok=True)
    with open(save_dir / "auc.txt", "w") as fo:
        fo.write(str(auc) + "\n")
    import pickle
    with open(save_dir / "model.pkl", "wb") as fo:
        pickle.dump(model, fo)
    imp = model.feature_importances_
    order = np.argsort(-imp)
    with open(save_dir / "features.csv", "w") as fo:
        fo.write("Feature\tImportance\n")
        for i in order:
            fo.write(f"{i + 1}\t{imp[i]}\n")
    return auc


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="ensemble booster over exist-prob features")
    ap.add_argument("data_dir")
    ap.add_argument("save_dir")
    ap.add_argument("--train-sub", default="elem_out_w50")
    ap.add_argument("--test-sub", default="scan_out_w50")
    ap.add_argument("--n-patterns", type=int, default=200)
    ap.add_argument("--n-estimators", type=int, default=500)
    args = ap.parse_args(argv)
    data_dir, save_dir = Path(args.data_dir), Path(args.save_dir)
    X_train, y_train = get_train_data(data_dir, args.train_sub,
                                      args.n_patterns)
    X_test, y_test = get_test_data(data_dir, args.test_sub,
                                   args.n_patterns)
    auc = train_and_eval(X_train, y_train, X_test, y_test, save_dir,
                         n_estimators=args.n_estimators)
    print("auc:", auc, file=sys.stderr)


if __name__ == "__main__":
    main()
