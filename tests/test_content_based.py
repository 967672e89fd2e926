import numpy as np
import pandas as pd
import pytest

from matrix_factorization_tpu import ContentBasedRecommender
from matrix_factorization_tpu.data.synthetic import lowrank_ratings


@pytest.fixture(scope="module")
def data():
    X, y = lowrank_ratings(n_users=25, n_items=20, density=0.5, seed=4)
    return X, y.clip(lower=0.5)


@pytest.fixture(scope="module")
def features(data):
    X, _ = data
    items = np.sort(X["item_id"].unique())
    rng = np.random.default_rng(11)
    feats = pd.DataFrame(rng.integers(0, 2, (len(items), 6)).astype(float),
                         columns=[f"g{j}" for j in range(6)])
    feats.insert(0, "item_id", items)
    return feats


def test_no_features_profile_is_user_mean(data):
    X, y = data
    m = ContentBasedRecommender().fit(X, y)
    u0 = X["user_id"].iloc[0]
    want = y[X["user_id"] == u0].mean()
    got = m.predict(pd.DataFrame({"user_id": [u0], "item_id": [X["item_id"].iloc[0]]}),
                    bound_ratings=False)[0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_with_features_profile_mean_semantics(data, features):
    """Parity: prediction is the mean of the rating-weighted profile
    vector, independent of the queried item (reference :213-215)."""
    X, y = data
    m = ContentBasedRecommender().fit(X, y, item_features=features)
    u0 = X["user_id"].iloc[0]
    items = X["item_id"].unique()[:3]
    preds = m.predict(
        pd.DataFrame({"user_id": [u0] * 3, "item_id": items}), bound_ratings=False
    )
    assert np.allclose(preds, preds[0])

    # oracle: weighted profile mean
    rows = X["user_id"] == u0
    feats = features.set_index("item_id")
    w = (y[rows] - m.min_rating).to_numpy()
    F = feats.loc[X.loc[rows, "item_id"]].to_numpy()
    want = ((w[:, None] * F).sum(0) / w.sum()).mean()
    np.testing.assert_allclose(preds[0], want, rtol=1e-4)


def test_similarity_matrix_shape_and_unknown_fallback(data, features):
    X, y = data
    m = ContentBasedRecommender().fit(X, y, item_features=features)
    n_items = X["item_id"].nunique()
    assert m.item_similarity_matrix.shape == (n_items, n_items)
    preds = m.predict(pd.DataFrame({"user_id": [31337], "item_id": [999]}),
                      bound_ratings=False)
    np.testing.assert_allclose(preds, [float(np.mean(y))], atol=1e-5)


def test_similarity_predict_mode_varies_by_item(data, features):
    X, y = data
    m = ContentBasedRecommender(predict_mode="similarity").fit(
        X, y, item_features=features
    )
    u0 = X["user_id"].iloc[0]
    items = X["item_id"].unique()[:5]
    preds = m.predict(
        pd.DataFrame({"user_id": [u0] * 5, "item_id": items}), bound_ratings=False
    )
    assert len(set(np.round(preds, 6))) > 1


def test_missing_item_id_column_raises(data):
    X, y = data
    with pytest.raises(ValueError, match="item_id"):
        ContentBasedRecommender().fit(X, y, item_features=pd.DataFrame({"g": [1.0]}))


def test_partial_item_features(data, features):
    """Items without feature rows are skipped in profiles (reference
    semantics) and predicted via the global-mean fallback paths."""
    X, y = data
    partial = features.iloc[: len(features) // 2]
    m = ContentBasedRecommender().fit(X, y, item_features=partial)
    preds = m.predict(X.iloc[:20])
    assert len(preds) == 20
    assert all(np.isfinite(preds))
