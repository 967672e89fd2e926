"""Implicit-feedback ALS (ImplicitALS / ops.ials.implicit_sweep).

The reference has no implicit model (its Steam pipeline converts
play-hours to pseudo-ratings for the explicit models); this is a
capability extension, so correctness is proven against the iALS normal
equations solved directly with numpy.
"""

import numpy as np
import pandas as pd
import pytest

from matrix_factorization_tpu import ImplicitALS
from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops import ials


@pytest.fixture
def interactions(rng):
    n_u, n_i, n = 60, 40, 600
    flat = rng.choice(n_u * n_i, size=n, replace=False)
    u = (flat // n_i).astype(np.int32)
    i = (flat % n_i).astype(np.int32)
    s = rng.exponential(2.0, n).astype(np.float32)  # strengths (hours)
    X = pd.DataFrame({"user_id": u, "item_id": i})
    return X, pd.Series(s)


def _numpy_user_solve(Y, items, strengths, reg, alpha):
    """Direct iALS normal equations for one user."""
    k = Y.shape[1]
    G = Y.T @ Y
    A = G + reg * np.eye(k)
    b = np.zeros(k)
    for j, s in zip(items, strengths):
        c = 1.0 + alpha * s
        A += (c - 1.0) * np.outer(Y[j], Y[j])
        b += c * Y[j]
    return np.linalg.solve(A, b)


def test_implicit_sweep_matches_numpy_normal_equations(rng):
    import jax.numpy as jnp

    k, n_items, n_users = 8, 12, 5
    cfg = SGDConfig(kernel="linear", n_factors=k, reg=0.3)
    kp = cfg.padded_factors
    Q = np.zeros((16, kp), np.float32)
    Q[:n_items, :k] = rng.normal(size=(n_items, k)).astype(np.float32)
    # user 0: 3 items; user 1: none (must solve to exactly 0); user 2: 1
    u = np.array([0, 0, 0, 2], np.int32)
    i = np.array([1, 4, 7, 3], np.int32)
    s = np.array([2.0, 0.5, 1.0, 4.0], np.float32)
    grouped = ials.group_by_entity(u, i, s, n_users)
    own = ials.implicit_sweep(
        jnp.zeros((n_users, kp), jnp.float32), jnp.asarray(Q), grouped,
        n_items, cfg, alpha=10.0,
    )
    own = np.asarray(own)
    Yk = Q[:n_items, :k]
    exp0 = _numpy_user_solve(Yk, [1, 4, 7], [2.0, 0.5, 1.0], 0.3, 10.0)
    exp2 = _numpy_user_solve(Yk, [3], [4.0], 0.3, 10.0)
    np.testing.assert_allclose(own[0, :k], exp0, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(own[2, :k], exp2, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(own[1, :k], 0.0, atol=1e-7)  # no data -> 0


def test_fit_loss_decreases_and_scores_rank_observed_items(interactions):
    X, s = interactions
    m = ImplicitALS(n_factors=16, n_epochs=8, reg=0.05, alpha=5.0)
    m.fit(X, s)
    assert len(m.train_loss) == 8
    assert m.train_loss[-1] < m.train_loss[0]
    # observed pairs should score far above random unobserved pairs
    obs = np.asarray(m.predict(X.iloc[:100], bound_ratings=False))
    rng = np.random.default_rng(0)
    seen = set(zip(X["user_id"], X["item_id"]))
    rows = [(u_, i_) for u_ in range(40) for i_ in rng.integers(0, 40, 3)
            if (u_, i_) not in seen][:100]
    Xn = pd.DataFrame(rows, columns=["user_id", "item_id"])
    unobs = np.asarray(m.predict(Xn, bound_ratings=False))
    assert obs.mean() > unobs.mean() + 0.2


def test_recommend_excludes_known_and_orders(interactions):
    X, s = interactions
    m = ImplicitALS(n_factors=16, n_epochs=6, alpha=5.0).fit(X, s)
    user = int(X["user_id"].iloc[0])
    known = set(X.loc[X["user_id"] == user, "item_id"])
    recs = m.recommend(user=user, amount=5, items_known=known)
    assert len(recs) == 5
    assert not set(recs["item_id"]).intersection(known)
    assert recs["rating_pred"].is_monotonic_decreasing


def test_update_users_new_user_matches_exact_solve(interactions, rng):
    X, s = interactions
    m = ImplicitALS(n_factors=16, n_epochs=6, reg=0.2, alpha=5.0).fit(X, s)
    new_items = [0, 5, 9]
    Xn = pd.DataFrame({"user_id": ["brand_new"] * 3, "item_id": new_items})
    sn = pd.Series([3.0, 1.0, 2.0])
    m.update_users(Xn, sn)
    assert m.contains_user("brand_new")
    Y = m.item_features
    dense_items = [m.item_id_map[j] for j in new_items]
    exp = _numpy_user_solve(Y, dense_items, [3.0, 1.0, 2.0], 0.2, 5.0)
    got = m.user_features[m.user_id_map["brand_new"]]
    np.testing.assert_allclose(got, exp, rtol=2e-3, atol=1e-4)
    # item table frozen
    preds = m.predict(Xn)
    assert all(0.0 <= p <= 1.0 for p in preds)
    assert m.predictions_possible == [True, True, True]


def test_negative_strengths_rejected(interactions):
    X, s = interactions
    m = ImplicitALS(n_factors=8, n_epochs=2)
    with pytest.raises(ValueError, match="non-negative"):
        m.fit(X, s - 10.0)


def test_cold_start_predict(interactions):
    X, s = interactions
    m = ImplicitALS(n_factors=8, n_epochs=3).fit(X, s)
    Xq = pd.DataFrame({"user_id": ["ghost"], "item_id": [X["item_id"].iloc[0]]})
    preds = m.predict(Xq)
    assert preds == [0.0]  # zero factors x anything, clipped to [0, 1]
    assert m.predictions_possible == [False]
