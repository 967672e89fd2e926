"""Reproduce the reference's published §6 golden table on real MovieLens-100K.

The reference's only published numbers are stored notebook outputs on
ML-100K (SURVEY.md §6 / BASELINE.md: KernelMF linear test RMSE 0.9534,
BaselineModel SGD 0.9292, ALS 0.9294, sigmoid 1.1109, rbf 0.9670, ...).
This image is zero-egress, so those cells cannot be re-run here; this
script is the documented one-command recipe (``make golden``) for any
machine WITH network:

    make golden          # downloads ML-100K u.data, runs the table
    make golden DATA=... # or point at an existing u.data

Caveats on comparability (why the budget below is "close", not 1e-3):
the published numbers came from numpy global-RNG shuffles + an
unseeded 80/20 split on the author's laptop, so exact-trajectory
reproduction is impossible by construction; run-to-run spread of the
reference itself is a few 1e-3.  We assert each model lands within
ATOL of the published value — tight enough to catch semantic bugs,
loose enough for the RNG gap.  (Hermetic counterpart pinned in-repo:
tests/test_golden_mini.py.)

Reference cells: examples/recommender-system.ipynb cells 6/9/12/18/25/27.
"""

import argparse
import io
import sys
import time
import urllib.request
import zipfile
from pathlib import Path

import numpy as np
import pandas as pd

ML100K_URL = "https://files.grouplens.org/datasets/movielens/ml-100k.zip"
ATOL = 0.02  # see module docstring

PUBLISHED = {
    "global_mean": 1.1207,
    "baseline_sgd": 0.9292,
    "baseline_als": 0.9294,
    "kernelmf_linear": 0.9534,
    "kernelmf_sigmoid": 1.1109,
    "kernelmf_rbf": 0.9670,
    # §6 protocols added round 5 (VERDICT r4 #5): update_users
    # cold-start rows (cells 15/23) and the GridSearchCV winner
    # (cells 29-30; published best CV RMSE at linear k=50, reg .1)
    "baseline_update_users": 0.9486,
    "kernelmf_update_users": 0.9677,
    "gridsearch_best_cv": 0.9253,
}


def load_ml100k(data: str | None) -> pd.DataFrame:
    if data:
        raw = Path(data).read_bytes()
    else:
        print(f"downloading {ML100K_URL} ...", flush=True)
        try:
            blob = urllib.request.urlopen(ML100K_URL, timeout=120).read()
        except OSError as e:
            raise SystemExit(
                f"cannot download ML-100K ({e}); this image has no egress."
                " Run on a machine with network, or pass --data"
                " /path/to/u.data (make golden DATA=...). Hermetic parity"
                " anchor: tests/test_golden_mini.py."
            )
        raw = zipfile.ZipFile(io.BytesIO(blob)).read("ml-100k/u.data")
    df = pd.read_csv(io.BytesIO(raw), sep="\t",
                     names=["user_id", "item_id", "rating", "ts"])
    return df[["user_id", "item_id", "rating"]]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data", default=None,
                   help="path to an existing ml-100k u.data (skips download)")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()

    import jax  # noqa: F401  (fail early if backend is broken)

    from matrix_factorization_tpu import BaselineModel, KernelMF
    from matrix_factorization_tpu.utils.metrics import rmse

    df = load_ml100k(a.data)
    rng = np.random.default_rng(a.seed)
    perm = rng.permutation(len(df))
    cut = int(0.8 * len(df))
    tr, te = df.iloc[perm[:cut]], df.iloc[perm[cut:]]
    X_tr, y_tr = tr[["user_id", "item_id"]], tr["rating"].astype(np.float32)
    X_te, y_te = te[["user_id", "item_id"]], te["rating"].astype(np.float32)

    rows = []

    def record(name, value, seconds=None):
        pub = PUBLISHED[name]
        ok = abs(value - pub) <= ATOL
        rows.append((name, value, pub, ok, seconds))
        t = "" if seconds is None else f"  {seconds:.2f}s"
        print(f"{name:18s} RMSE {value:.4f}  published {pub:.4f}  "
              f"{'OK' if ok else 'MISS'}{t}", flush=True)

    record("global_mean", rmse(y_te, np.full(len(y_te), float(y_tr.mean()))))

    # notebook cell hyperparameters (recommender-system.ipynb)
    t0 = time.time()
    m = BaselineModel(method="sgd", n_epochs=20, lr=0.01, reg=0.005)
    m.fit(X_tr, y_tr)
    record("baseline_sgd", rmse(y_te, m.predict(X_te)), time.time() - t0)

    t0 = time.time()
    m = BaselineModel(method="als", n_epochs=20, reg=0.5)
    m.fit(X_tr, y_tr)
    record("baseline_als", rmse(y_te, m.predict(X_te)), time.time() - t0)

    t0 = time.time()
    m = KernelMF(n_epochs=20, n_factors=100, lr=0.001, reg=0.005,
                 min_rating=1, max_rating=5)
    m.fit(X_tr, y_tr)
    record("kernelmf_linear", rmse(y_te, m.predict(X_te)), time.time() - t0)

    t0 = time.time()
    m = KernelMF(kernel="sigmoid", n_epochs=20, n_factors=100, lr=0.01,
                 reg=0.005, min_rating=1, max_rating=5)
    m.fit(X_tr, y_tr)
    record("kernelmf_sigmoid", rmse(y_te, m.predict(X_te)), time.time() - t0)

    t0 = time.time()
    m = KernelMF(kernel="rbf", n_epochs=20, n_factors=100, lr=0.5,
                 reg=0.005, min_rating=1, max_rating=5)
    m.fit(X_tr, y_tr)
    record("kernelmf_rbf", rmse(y_te, m.predict(X_te)), time.time() - t0)

    # update_users cold-start protocol (cells 15/23 via
    # train_update_test_split — utils.py:8-73): held-out users enter
    # through update_users, their remaining ratings score the model
    from matrix_factorization_tpu.utils.splits import (
        train_update_test_split)

    (X_ti, y_ti, X_up, y_up, X_tu, y_tu) = train_update_test_split(
        df.assign(rating=df["rating"].astype(np.float64)),
        frac_new_users=0.2, seed=a.seed)

    t0 = time.time()
    m = BaselineModel(method="sgd", n_epochs=20, lr=0.01, reg=0.005)
    m.fit(X_ti, y_ti)
    m.update_users(X_up, y_up, lr=0.001, n_epochs=20)
    record("baseline_update_users", rmse(y_tu, m.predict(X_tu)),
           time.time() - t0)

    t0 = time.time()
    m = KernelMF(n_epochs=20, n_factors=100, lr=0.001, reg=0.005,
                 min_rating=1, max_rating=5)
    m.fit(X_ti, y_ti)
    m.update_users(X_up, y_up, lr=0.001, n_epochs=20)
    record("kernelmf_update_users", rmse(y_tu, m.predict(X_tu)),
           time.time() - t0)

    # GridSearchCV winner protocol (cells 29-30): the vmapped grid
    # trainer sweeps (lr, reg) over 5 folds at the published winner's
    # config (linear, k=50, 50 epochs); the grid brackets the winner
    # rather than replaying all 81 reference candidates
    from matrix_factorization_tpu.models.grid_search import (
        grid_search_kernel_mf)

    t0 = time.time()
    _, results = grid_search_kernel_mf(
        X_tr, y_tr, cv=5, lrs=(0.0005, 0.001, 0.002),
        regs=(0.05, 0.1, 0.2), n_epochs=50, n_factors=50,
        min_rating=1, max_rating=5, verbose=0, seed=a.seed)
    record("gridsearch_best_cv", results[0]["val_rmse"], time.time() - t0)

    misses = [r for r in rows if not r[3]]
    print(f"\n{len(rows) - len(misses)}/{len(rows)} within {ATOL} of the "
          "published table")
    return 1 if misses else 0


if __name__ == "__main__":
    sys.exit(main())
