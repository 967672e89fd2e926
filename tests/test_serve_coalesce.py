"""Request-coalescing serving (VERDICT r4 #2): interleaved requests get
their own results, and concurrent load shares device programs."""

import threading

import numpy as np
import pandas as pd
import pytest

from matrix_factorization_tpu import KernelMF
from matrix_factorization_tpu.data.synthetic import lowrank_ratings
from matrix_factorization_tpu.serve.coalesce import CoalescingRecommender


@pytest.fixture(scope="module")
def model():
    X, y = lowrank_ratings(n_users=60, n_items=50, density=0.5, seed=5)
    m = KernelMF(n_epochs=5, n_factors=16, batch_size=512, verbose=0)
    m.fit(X, y)
    return m


def _concurrent(co, calls):
    """Run calls concurrently; return results list aligned with calls."""
    out = [None] * len(calls)
    errs = [None] * len(calls)

    def work(n, kw):
        try:
            out[n] = co.recommend(**kw)
        except Exception as e:  # noqa: BLE001
            errs[n] = e

    ts = [threading.Thread(target=work, args=(n, kw))
          for n, kw in enumerate(calls)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    assert all(e is None for e in errs), errs
    return out


def test_interleaved_requests_get_own_results(model):
    users = sorted(pd.unique(np.asarray(model.user_vocab.raw_ids)))[:24]
    co = CoalescingRecommender(model, window_ms=20.0, max_batch=64)
    try:
        results = _concurrent(
            co, [{"user": u, "amount": 5} for u in users])
        for u, frame in zip(users, results):
            assert (frame["user_id"] == u).all()
            assert len(frame) == 5
            # identical to the model's own single-user answer
            solo = model.recommend(user=u, amount=5)
            assert list(frame["item_id"]) == list(solo["item_id"])
            np.testing.assert_allclose(frame["rating_pred"],
                                       solo["rating_pred"], atol=1e-5)
        # the window coalesced concurrent requests into fewer programs
        assert co.dispatches < len(users)
        assert co.served == len(users)
    finally:
        co.close()


def test_same_user_different_exclusions_split(model):
    u = model.user_vocab.raw_ids[0]
    base = model.recommend(user=u, amount=5)
    excl = [base["item_id"].iloc[0]]
    co = CoalescingRecommender(model, window_ms=20.0, max_batch=64)
    try:
        res = _concurrent(co, [
            {"user": u, "amount": 5},
            {"user": u, "amount": 5, "items_known": excl},
            {"user": u, "amount": 5},
        ])
        assert list(res[0]["item_id"]) == list(base["item_id"])
        assert list(res[2]["item_id"]) == list(base["item_id"])
        assert excl[0] not in set(res[1]["item_id"])
    finally:
        co.close()


def test_mixed_amounts_and_duplicates(model):
    users = [model.user_vocab.raw_ids[n] for n in (0, 1, 0, 2)]
    co = CoalescingRecommender(model, window_ms=20.0, max_batch=64)
    try:
        res = _concurrent(co, [
            {"user": users[0], "amount": 3},
            {"user": users[1], "amount": 7},
            {"user": users[2], "amount": 3},  # duplicate of request 0
            {"user": users[3], "amount": 7},
        ])
        assert len(res[0]) == 3 and len(res[1]) == 7
        assert list(res[0]["item_id"]) == list(res[2]["item_id"])
        assert (res[3]["user_id"] == users[3]).all()
    finally:
        co.close()


def test_dispatch_errors_propagate():
    class Boom:
        def recommend_batch(self, users, amount=10, items_known_map=None):
            raise RuntimeError("device fell over")

    co = CoalescingRecommender(Boom(), window_ms=5.0)
    try:
        with pytest.raises(RuntimeError, match="device fell over"):
            co.recommend(user="u1", amount=5)
    finally:
        co.close()


def test_closed_recommender_raises(model):
    co = CoalescingRecommender(model)
    co.close()
    with pytest.raises(RuntimeError):
        co.recommend(user=model.user_vocab.raw_ids[0])
