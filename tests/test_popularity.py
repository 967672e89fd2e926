"""Popularity baseline: damped means, count ranking, lifecycle parity."""

import numpy as np
import pandas as pd
import pytest

from matrix_factorization_tpu.models.popularity import Popularity


def _frame(rows):
    X = pd.DataFrame(rows, columns=["user_id", "item_id"])
    return X


def test_count_mode_ranks_by_interaction_count():
    rows = [("u1", "a"), ("u2", "a"), ("u3", "a"),
            ("u1", "b"), ("u2", "b"),
            ("u1", "c")]
    y = pd.Series([5, 4, 3, 2, 1, 5])
    m = Popularity(score="count").fit(_frame(rows), y)
    rec = m.recommend("u3", amount=3)
    assert rec["item_id"].tolist() == ["a", "b", "c"]
    # counts are not clipped to the rating range
    assert rec["rating_pred"].tolist() == [3.0, 2.0, 1.0]


def test_count_mode_excludes_items_known():
    rows = [("u1", "a"), ("u2", "a"), ("u1", "b"), ("u2", "c")]
    y = pd.Series([1, 1, 1, 1])
    m = Popularity(score="count").fit(_frame(rows), y)
    rec = m.recommend("u1", amount=5, items_known=["a"])
    assert "a" not in rec["item_id"].tolist()


def test_mean_mode_matches_damped_mean_formula():
    rows = [("u1", "a"), ("u2", "a"), ("u1", "b")]
    y = pd.Series([4.0, 2.0, 5.0])
    damping = 2.0
    m = Popularity(score="mean", damping=damping).fit(_frame(rows), y)
    gm = y.mean()
    exp_a = (6.0 + damping * gm) / (2 + damping)
    exp_b = (5.0 + damping * gm) / (1 + damping)
    preds = m.predict(_frame([("u1", "a"), ("u2", "b")]), bound_ratings=False)
    np.testing.assert_allclose(preds, [exp_a, exp_b], rtol=1e-6)
    assert m.predictions_possible == [True, True]


def test_unknown_item_falls_back_and_flags_impossible():
    rows = [("u1", "a"), ("u2", "a")]
    y = pd.Series([4.0, 2.0])
    m = Popularity(score="mean").fit(_frame(rows), y)
    preds = m.predict(_frame([("u1", "zzz")]), bound_ratings=False)
    np.testing.assert_allclose(preds, [3.0])  # global mean
    assert m.predictions_possible == [False]


def test_update_users_folds_new_ratings_and_registers_users():
    rows = [("u1", "a"), ("u1", "b"), ("u2", "b")]
    y = pd.Series([1.0, 1.0, 1.0])
    m = Popularity(score="count").fit(_frame(rows), y)
    # two more interactions with 'a' from a new user (and one unknown item,
    # which must be dropped)
    m.update_users(_frame([("u9", "a"), ("u9", "zzz")]), pd.Series([1.0, 1.0]))
    assert m.contains_user("u9")
    rec = m.recommend("u2", amount=2)
    # counts after update: a=2, b=2 -> stable argsort keeps catalog order
    assert rec["item_id"].tolist() == ["a", "b"]
    np.testing.assert_allclose(rec["rating_pred"].to_numpy(), [2.0, 2.0])


def test_recommend_batch_is_user_independent():
    rows = [("u1", "a"), ("u2", "a"), ("u1", "b")]
    y = pd.Series([1, 1, 1])
    m = Popularity(score="count").fit(_frame(rows), y)
    out = m.recommend_batch(["u1", "u2"], amount=2)
    per_user = {u: g["item_id"].tolist() for u, g in out.groupby("user_id")}
    assert per_user["u1"] == per_user["u2"] == ["a", "b"]


def test_invalid_score_raises():
    with pytest.raises(ValueError):
        Popularity(score="nope")


def test_mean_mode_recommend_clips_to_rating_range():
    rows = [("u1", "a"), ("u2", "a")]
    y = pd.Series([9.0, 9.0])  # outside [0, 5]
    m = Popularity(score="mean", damping=0.0).fit(_frame(rows), y)
    rec = m.recommend("u1", amount=1)
    assert rec["rating_pred"].iloc[0] == 5.0


def test_checkpoint_roundtrip(tmp_path):
    from matrix_factorization_tpu.core.checkpoint import load_model, save_model

    rows = [("u1", "a"), ("u2", "a"), ("u1", "b")]
    y = pd.Series([4.0, 2.0, 5.0])
    m = Popularity(score="mean", damping=3.0).fit(_frame(rows), y)
    save_model(m, tmp_path / "ckpt")
    m2 = load_model(tmp_path / "ckpt")
    assert isinstance(m2, Popularity)
    assert m2.score == "mean" and m2.damping == 3.0
    np.testing.assert_allclose(m2.item_scores_, m.item_scores_)
    X = _frame([("u1", "a"), ("u9", "b")])
    assert m2.predict(X, bound_ratings=False) == m.predict(X, bound_ratings=False)
