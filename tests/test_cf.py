"""UserUserCF / ItemItemCF vs a float64 numpy oracle of the reference's
neighborhood formula (collaborative_filtering.py:133-190, :311-368) with
the rating-misalignment bug fixed."""

import numpy as np
import pandas as pd
import pytest

from matrix_factorization_tpu import ItemItemCF, UserUserCF
from matrix_factorization_tpu.data.synthetic import lowrank_ratings


def _dense(X, y, n_users, n_items):
    R = np.zeros((n_users, n_items))
    R[X["user_id"], X["item_id"]] = y
    return R


def _cosine(m):
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    normed = m / np.maximum(norms, 1e-12)
    return normed @ normed.T


def _user_cf_oracle(R, u, i, n_neighbors, global_mean):
    means = R.mean(axis=1)
    S = _cosine(R - means[:, None])
    sims = S[u].copy()
    ratings = R[:, i]
    mask = ratings > 0
    mask[u] = False
    if not mask.any():
        return means[u]
    sims_m, r_m, mean_m = sims[mask], ratings[mask], means[mask]
    if len(sims_m) > n_neighbors:
        top = np.argsort(sims_m)[-n_neighbors:]
        sims_m, r_m, mean_m = sims_m[top], r_m[top], mean_m[top]
    den = np.abs(sims_m).sum()
    if den == 0:
        return means[u]
    return means[u] + (sims_m * (r_m - mean_m)).sum() / den


def _item_cf_oracle(R, u, i, n_neighbors, global_mean):
    means = R.mean(axis=0)
    S = _cosine((R - means[None, :]).T)
    sims = S[i].copy()
    ratings = R[u, :]
    mask = ratings > 0
    mask[i] = False
    if not mask.any():
        return means[i]
    sims_m, r_m, mean_m = sims[mask], ratings[mask], means[mask]
    if len(sims_m) > n_neighbors:
        top = np.argsort(sims_m)[-n_neighbors:]
        sims_m, r_m, mean_m = sims_m[top], r_m[top], mean_m[top]
    den = np.abs(sims_m).sum()
    if den == 0:
        return means[i]
    return means[i] + (sims_m * (r_m - mean_m)).sum() / den


@pytest.fixture(scope="module")
def small():
    X, y = lowrank_ratings(n_users=30, n_items=24, density=0.45, seed=9)
    # ensure ratings strictly positive so `rated = r > 0` is meaningful
    y = y.clip(lower=0.5)
    return X, y


@pytest.mark.parametrize("cls,oracle,mode", [
    (UserUserCF, _user_cf_oracle, "user"),
    (ItemItemCF, _item_cf_oracle, "item"),
])
def test_cf_matches_oracle(small, cls, oracle, mode):
    X, y = small
    n_users = X["user_id"].nunique()
    n_items = X["item_id"].nunique()
    model = cls(n_neighbors=5).fit(X, y)

    # model ids are first-seen order; build oracle matrix in the same space
    u_enc = model.user_vocab.encode(X["user_id"].to_numpy())
    i_enc = model.item_vocab.encode(X["item_id"].to_numpy())
    R = np.zeros((n_users, n_items))
    R[u_enc, i_enc] = y

    pairs = pd.DataFrame({
        "user_id": X["user_id"].iloc[:40].to_numpy(),
        "item_id": X["item_id"].iloc[5:45].to_numpy(),
    })
    got = model.predict(pairs, bound_ratings=False)
    pu = model.user_vocab.encode(pairs["user_id"].to_numpy())
    pi = model.item_vocab.encode(pairs["item_id"].to_numpy())
    want = [oracle(R, a, b, 5, float(y.mean())) for a, b in zip(pu, pi)]
    # f32 similarities can swap borderline neighbors vs the f64 oracle;
    # allow a small absolute slack and require the bulk to be tight.
    np.testing.assert_allclose(got, want, atol=6e-3)
    assert np.median(np.abs(np.asarray(got) - np.asarray(want))) < 2e-4


def test_cf_unknown_returns_global_mean(small):
    X, y = small
    model = UserUserCF(n_neighbors=5).fit(X, y)
    preds = model.predict(
        pd.DataFrame({"user_id": [424242], "item_id": [X["item_id"].iloc[0]]}),
        bound_ratings=False,
    )
    np.testing.assert_allclose(preds, [float(np.mean(y))], atol=1e-5)
    assert model.predictions_possible == [False]


def test_cf_bounds(small):
    X, y = small
    model = ItemItemCF(n_neighbors=5, min_rating=2.0, max_rating=3.0).fit(X, y)
    preds = model.predict(X.iloc[:20])
    assert all(2.0 <= p <= 3.0 for p in preds)


def test_cf_bad_metric_raises():
    with pytest.raises(ValueError):
        UserUserCF(similarity_metric="jaccard")


def test_cf_pearson_equals_centered_cosine(small):
    X, y = small
    a = UserUserCF(n_neighbors=5, similarity_metric="cosine").fit(X, y)
    b = UserUserCF(n_neighbors=5, similarity_metric="pearson").fit(X, y)
    np.testing.assert_allclose(
        a.user_similarity_matrix, b.user_similarity_matrix, atol=1e-6
    )
