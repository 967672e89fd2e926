"""Batched recommend + streaming top-k."""

import numpy as np
import jax.numpy as jnp

from matrix_factorization_tpu import BaselineModel, KernelMF
from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.data.synthetic import lowrank_ratings
from matrix_factorization_tpu.ops import segment_sgd as sgd
from matrix_factorization_tpu.ops.scoring import score_catalog, streaming_topk


def test_recommend_batch_matches_per_user():
    X, y = lowrank_ratings(n_users=40, n_items=30, density=0.5, seed=30)
    m = KernelMF(n_factors=6, n_epochs=10, lr=0.02, reg=0.02,
                 batch_size=128).fit(X, y)
    users = list(X["user_id"].unique()[:5])
    known = {u: set(X.loc[X["user_id"] == u, "item_id"]) for u in users}
    batch = m.recommend_batch(users, amount=4, items_known_map=known)
    assert len(batch) == 20
    for u in users:
        single = m.recommend(u, amount=4, items_known=known[u])
        got = batch.loc[batch["user_id"] == u]
        assert list(got["item_id"]) == list(single["item_id"])
        np.testing.assert_allclose(got["rating_pred"].to_numpy(),
                                   single["rating_pred"].to_numpy(),
                                   atol=1e-5)


def test_recommend_batch_fallback_loop():
    X, y = lowrank_ratings(n_users=30, n_items=20, density=0.5, seed=31)
    m = BaselineModel(method="als", n_epochs=5).fit(X, y)
    # Baseline has no batched scorer attr on purpose? it has _catalog_scores
    # only; recommend_batch should still work via the loop path for unknown
    # users mixed in
    users = [X["user_id"].iloc[0], 999999]
    out = m.recommend_batch(users, amount=3)
    assert len(out) == 6


def test_streaming_topk_matches_dense():
    rng = np.random.default_rng(5)
    cfg = SGDConfig(kernel="linear", n_factors=8)
    kp = cfg.padded_factors
    B, I, tile = 6, 64, 16
    pu = np.zeros((B, kp), np.float32)
    pu[:, :8] = rng.normal(0, 0.5, (B, 8))
    pu[:, sgd.const_col(cfg, "user")] = 1.0
    Q = np.zeros((I, kp), np.float32)
    Q[:, :8] = rng.normal(0, 0.5, (I, 8))
    Q[:, sgd.const_col(cfg, "item")] = 1.0
    Q[:, sgd.bias_col(cfg, "item")] = rng.normal(0, 0.2, I)
    valid = np.ones(I, np.float32)
    valid[50:] = 0.0
    mu = jnp.float32(3.0)

    vals, idx = streaming_topk(cfg, mu, jnp.asarray(pu), jnp.asarray(Q),
                               jnp.asarray(valid), k=7, tile=tile)
    dense = np.array(score_catalog(cfg, mu, jnp.asarray(pu), jnp.asarray(Q)))
    dense[:, 50:] = -np.inf
    want_idx = np.argsort(-dense, axis=1)[:, :7]
    want_vals = np.take_along_axis(dense, want_idx, axis=1)
    np.testing.assert_allclose(np.asarray(vals), want_vals, atol=1e-5)
    got_scores = np.take_along_axis(dense, np.asarray(idx), axis=1)
    np.testing.assert_allclose(got_scores, want_vals, atol=1e-5)


def test_recommend_batch_exhausted_candidates():
    """When known items exhaust the catalog, masked entries are dropped
    rather than returned at min_rating (matches recommend())."""
    X, y = lowrank_ratings(n_users=20, n_items=10, density=0.9, seed=33)
    m = KernelMF(n_factors=4, n_epochs=5, lr=0.02, batch_size=64).fit(X, y)
    user = X["user_id"].iloc[0]
    all_items = list(m.known_items)
    known = set(all_items[:-2])  # leave only 2 candidates
    out = m.recommend_batch([user], amount=5, items_known_map={user: known})
    assert len(out) == 2
    assert not set(out["item_id"]).intersection(known)


def test_recommend_topk_path_matches_bruteforce():
    """The device-side top-k recommend path (VERDICT r2 #3: only k
    values+indices leave the device) must reproduce the reference's
    score-everything / stable-sort / head(amount) semantics exactly —
    checked against host brute force for every kernel and the bias
    model, with and without items_known exclusion."""
    from matrix_factorization_tpu.ops.scoring import score_catalog

    X, y = lowrank_ratings(n_users=40, n_items=60, density=0.4, seed=41)
    for kernel in ("linear", "sigmoid", "rbf"):
        m = KernelMF(kernel=kernel, n_factors=6, n_epochs=8, lr=0.02,
                     reg=0.02, batch_size=128, gamma=0.05).fit(X, y)
        assert hasattr(m, "_catalog_topk")
        user = X["user_id"].iloc[0]
        ud = m.user_vocab.encode(np.asarray([user], dtype=object))[0]
        scores = np.asarray(score_catalog(
            m._cfg(), m._params.global_mean,
            m._params.user_features[jnp.asarray([ud])],
            m._params.item_features[: m.n_items]))[0]
        exp = np.argsort(-scores, kind="stable")[:7]
        recs = m.recommend(user, amount=7, bound_ratings=False)
        assert list(recs["item_id"]) == [m.item_vocab.raw_ids[j] for j in exp]
        np.testing.assert_allclose(recs["rating_pred"].to_numpy(),
                                   scores[exp], rtol=1e-5)
        # with exclusion: filter then head, same as reference candidates
        known = set(X.loc[X["user_id"] == user, "item_id"])
        kd = set(m.item_vocab.encode(
            np.asarray(list(known), dtype=object)).tolist())
        exp_ex = [j for j in np.argsort(-scores, kind="stable")
                  if j not in kd][:7]
        recs_ex = m.recommend(user, amount=7, items_known=known)
        assert list(recs_ex["item_id"]) == [m.item_vocab.raw_ids[j]
                                            for j in exp_ex]
        # bound_ratings clamps values but not the ordering
        np.testing.assert_allclose(
            recs_ex["rating_pred"].to_numpy(),
            np.clip(scores[exp_ex], m.min_rating, m.max_rating), rtol=1e-5)

    b = BaselineModel(method="als", n_epochs=5).fit(X, y)
    user = X["user_id"].iloc[1]
    ud = b.user_vocab.encode(np.asarray([user], dtype=object))[0]
    scores = b.global_mean + b.user_biases[ud] + b.item_biases
    exp = np.argsort(-scores, kind="stable")[:5]
    recs = b.recommend(user, amount=5, bound_ratings=False)
    assert list(recs["item_id"]) == [b.item_vocab.raw_ids[j] for j in exp]
    np.testing.assert_allclose(recs["rating_pred"].to_numpy(), scores[exp],
                               rtol=1e-5)


def test_implicit_recommend_topk_matches_bruteforce():
    from matrix_factorization_tpu.models.implicit import ImplicitALS

    rng = np.random.default_rng(7)
    n = 400
    import pandas as pd
    X = pd.DataFrame({
        "user_id": rng.integers(0, 30, n),
        "item_id": rng.integers(0, 40, n),
    }).drop_duplicates()
    y = pd.Series(rng.uniform(1, 20, len(X)))
    m = ImplicitALS(n_factors=6, n_epochs=3).fit(X, y)
    user = X["user_id"].iloc[0]
    ud = m.user_vocab.encode(np.asarray([user], dtype=object))[0]
    scores = m._catalog_scores_batch(np.asarray([ud]))[0]
    exp = np.argsort(-scores, kind="stable")[:6]
    recs = m.recommend(user, amount=6, bound_ratings=False)
    assert list(recs["item_id"]) == [m.item_vocab.raw_ids[j] for j in exp]
    np.testing.assert_allclose(recs["rating_pred"].to_numpy(), scores[exp],
                               rtol=1e-4)
