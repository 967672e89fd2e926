"""Pin per-family anchors on the committed golden fixture (VERDICT r3 #8).

Extends the MF-kernel oracle anchors (``gen_golden_mini.py``) to the
non-MF families the §6 table shape covers: BaselineModel (ALS + SGD),
exact UserUserCF / ItemItemCF, ContentBasedRecommender (profile-mean and
feature modes), and EASE as the implicit-ranker representative (chosen
because its closed form is RNG-free — the anchor is exact arithmetic,
not a seeded trajectory).

Anchors are TEST-SPLIT metrics computed once on this image and committed
to ``golden_mini_family_expected.json``; ``tests/test_golden_mini.py``
re-runs each family on the same fixture and asserts the pinned value.
Item features for the content model are derived deterministically from
the item id (the fixture CSV carries no metadata).

Run from the repo root:  python tests/data/gen_golden_family.py
Re-running asserts the committed anchors are unchanged.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd

DATA = Path(__file__).resolve().parent
OUT = DATA / "golden_mini_family_expected.json"
POS_THRESHOLD = 4.0  # implicit arm: ratings >= this are positives


def load_fixture():
    raw = np.genfromtxt(DATA / "golden_mini.csv", delimiter=",",
                        skip_header=1)
    u = raw[:, 0].astype(np.int64)
    i = raw[:, 1].astype(np.int64)
    r = raw[:, 2].astype(np.float32)
    tr = raw[:, 3].astype(bool)
    return u, i, r, tr


def item_feature_frame(n_items: int) -> pd.DataFrame:
    """Deterministic item metadata derived from the id: 5 one-hot
    'genre' lanes + 2 smooth numeric columns."""
    ids = np.arange(n_items)
    cols = {"item_id": ids}
    for g in range(5):
        cols[f"genre_{g}"] = (ids % 5 == g).astype(np.float32)
    cols["num_a"] = np.sin(ids * 0.37).astype(np.float32)
    cols["num_b"] = ((ids % 7) / 7.0).astype(np.float32)
    return pd.DataFrame(cols)


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a, np.float64)
                                  - np.asarray(b, np.float64)) ** 2)))


def main() -> None:
    from matrix_factorization_tpu.models.baseline import BaselineModel
    from matrix_factorization_tpu.models.collaborative import (
        ItemItemCF, UserUserCF)
    from matrix_factorization_tpu.models.content_based import (
        ContentBasedRecommender)
    from matrix_factorization_tpu.models.ease import EASE

    u, i, r, tr = load_fixture()
    X_tr = pd.DataFrame({"user_id": u[tr], "item_id": i[tr]})
    y_tr = pd.Series(r[tr])
    X_te = pd.DataFrame({"user_id": u[~tr], "item_id": i[~tr]})
    y_te = np.asarray(r[~tr], np.float64)
    anchors: dict = {"positive_threshold": POS_THRESHOLD}

    m = BaselineModel(method="als", n_epochs=10, reg=0.05,
                      min_rating=0.5, max_rating=5.0, verbose=0)
    m.fit(X_tr, y_tr)
    anchors["baseline_als_test_rmse"] = round(rmse(y_te, m.predict(X_te)), 6)

    m = BaselineModel(method="sgd", n_epochs=20, lr=0.01, reg=0.05,
                      min_rating=0.5, max_rating=5.0, verbose=0)
    m.fit(X_tr, y_tr)
    anchors["baseline_sgd_test_rmse"] = round(rmse(y_te, m.predict(X_te)), 6)

    for name, cls in (("user_user", UserUserCF), ("item_item", ItemItemCF)):
        m = cls(n_neighbors=30, min_rating=0.5, max_rating=5.0)
        m.fit(X_tr, y_tr)
        anchors[f"{name}_cf_test_rmse"] = round(
            rmse(y_te, m.predict(X_te)), 6)

    feats = item_feature_frame(400)
    m = ContentBasedRecommender(min_rating=0.5, max_rating=5.0)
    m.fit(X_tr, y_tr)  # profile-mean mode (no metadata)
    anchors["content_profile_mean_test_rmse"] = round(
        rmse(y_te, m.predict(X_te)), 6)
    m = ContentBasedRecommender(min_rating=0.5, max_rating=5.0,
                                predict_mode="similarity")
    m.fit(X_tr, y_tr, item_features=feats)
    anchors["content_similarity_test_rmse"] = round(
        rmse(y_te, m.predict(X_te)), 6)

    # implicit ranker: EASE on binarized positives; anchor = leave-out
    # hit@10 over test positives whose user has >= 1 train positive
    pos_tr = r[tr] >= POS_THRESHOLD
    Xp = pd.DataFrame({"user_id": u[tr][pos_tr], "item_id": i[tr][pos_tr]})
    e = EASE(reg=50.0)
    e.fit(Xp, pd.Series(np.ones(len(Xp), np.float32)))
    test_pos = [(uu, ii) for uu, ii in zip(u[~tr], i[~tr])]
    test_pos = [(uu, ii) for (uu, ii), rr in zip(test_pos, r[~tr])
                if rr >= POS_THRESHOLD and uu in set(Xp.user_id)]
    hits = 0
    for uu, ii in test_pos:
        known = set(Xp[Xp.user_id == uu].item_id)
        recs = e.recommend(user=uu, amount=10, items_known=known)
        hits += int(ii in set(recs["item_id"]))
    anchors["ease_hit_at_10"] = round(hits / max(1, len(test_pos)), 6)
    anchors["ease_n_test_positives"] = len(test_pos)

    # -- §6 protocols previously uncovered (VERDICT r4 #5) ---------------
    # (a) update_users cold-start RMSE — the reference notebook's
    # train_update_test_split protocol (recommender-system.ipynb cells
    # 15/23 via utils.py:8-73): held-out users never seen in the initial
    # fit are introduced through model.update_users, then scored on
    # their remaining ratings.
    from matrix_factorization_tpu.models.kernel_mf import KernelMF
    from matrix_factorization_tpu.utils.splits import (
        train_update_test_split)

    df = pd.DataFrame({"user_id": u, "item_id": i,
                       "rating": r.astype(np.float64)})
    (X_ti, y_ti, X_up, y_up, X_tu, y_tu) = train_update_test_split(
        df, frac_new_users=0.2, seed=7)
    anchors["update_users_n_test"] = int(len(y_tu))

    km = KernelMF(n_epochs=15, n_factors=32, lr=0.01, reg=0.005,
                  min_rating=0.5, max_rating=5.0, verbose=0, seed=0)
    km.fit(X_ti, y_ti)
    km.update_users(X_up, y_up)
    anchors["update_users_kernel_mf_test_rmse"] = round(
        rmse(y_tu, km.predict(X_tu)), 6)

    bm = BaselineModel(method="sgd", n_epochs=20, lr=0.01, reg=0.05,
                       min_rating=0.5, max_rating=5.0, verbose=0)
    bm.fit(X_ti, y_ti)
    bm.update_users(X_up, y_up)
    anchors["update_users_baseline_test_rmse"] = round(
        rmse(y_tu, bm.predict(X_tu)), 6)

    # (b) hyperparameter-sweep winner — the reference's GridSearchCV
    # protocol (recommender-system.ipynb cells 29-30) on the vmapped
    # grid trainer: pin the winning (lr, reg) and its holdout RMSE.
    from matrix_factorization_tpu.models.grid_search import (
        grid_search_kernel_mf)

    best, results = grid_search_kernel_mf(
        X_tr, y_tr, X_val=X_te, y_val=pd.Series(y_te),
        lrs=(0.002, 0.01, 0.05), regs=(0.005, 0.05), n_epochs=10,
        n_factors=32, min_rating=0.5, max_rating=5.0, verbose=0, seed=0)
    anchors["sweep_winner_lr"] = results[0]["lr"]
    anchors["sweep_winner_reg"] = results[0]["reg"]
    anchors["sweep_winner_val_rmse"] = round(results[0]["val_rmse"], 6)

    if OUT.exists():
        old = json.loads(OUT.read_text())
        drift = {k: (old[k], anchors[k]) for k in old
                 if k in anchors and old[k] != anchors[k]}
        if drift:
            raise SystemExit(f"anchor drift! {json.dumps(drift, indent=2)}")
        merged = {**old, **anchors}
        if merged != old:
            OUT.write_text(json.dumps(merged, indent=2) + "\n")
            print("merged new anchors into", OUT)
        else:
            print("anchors unchanged:", OUT)
        anchors = merged
    else:
        OUT.write_text(json.dumps(anchors, indent=2) + "\n")
        print("wrote", OUT)
    print(json.dumps(anchors, indent=2))


if __name__ == "__main__":
    main()
