"""NMF (models/nmf.py, ops/nmf.py): float64 oracle parity for the
alternating multiplicative-update schedule, batch-size invariance,
non-negativity, lifecycle, checkpointing."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from matrix_factorization_tpu.core.checkpoint import load_model, save_model
from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.data.synthetic import lowrank_ratings
from matrix_factorization_tpu.models import NMF
from matrix_factorization_tpu.ops import nmf as nmf_ops
from matrix_factorization_tpu.ops import segment_sgd as sgd


def _oracle_nmf(P, Q, u, i, r, k, n_epochs, reg_pu, reg_qi, eps=1e-8):
    """Float64 numpy oracle of the same schedule: per epoch, a user pass
    against the pre-epoch item table updates P, then an item pass against
    the FRESH P updates Q (alternating Lee–Seung), count-scaled L2,
    zero-count rows frozen."""
    P = P.astype(np.float64).copy()
    Q = Q.astype(np.float64).copy()
    cnt_u = np.bincount(u, minlength=P.shape[0]).astype(np.float64)
    cnt_i = np.bincount(i, minlength=Q.shape[0]).astype(np.float64)
    hist = []
    for _ in range(n_epochs):
        est = np.einsum("nk,nk->n", P[u, :k], Q[i, :k])
        num_u = np.zeros((P.shape[0], k))
        den_u = np.zeros_like(num_u)
        np.add.at(num_u, u, Q[i, :k] * r[:, None])
        np.add.at(den_u, u, Q[i, :k] * est[:, None])
        fu = P[:, :k]
        new_u = fu * num_u / (den_u + reg_pu * cnt_u[:, None] * fu + eps)
        P[:, :k] = np.where(cnt_u[:, None] > 0, new_u, fu)

        est = np.einsum("nk,nk->n", P[u, :k], Q[i, :k])
        num_i = np.zeros((Q.shape[0], k))
        den_i = np.zeros_like(num_i)
        np.add.at(num_i, i, P[u, :k] * r[:, None])
        np.add.at(den_i, i, P[u, :k] * est[:, None])
        fi = Q[:, :k]
        new_i = fi * num_i / (den_i + reg_qi * cnt_i[:, None] * fi + eps)
        Q[:, :k] = np.where(cnt_i[:, None] > 0, new_i, fi)

        e = r - np.einsum("nk,nk->n", P[u, :k], Q[i, :k])
        hist.append(np.sqrt(np.mean(e * e)))
    return P, Q, hist


def _toy(seed=0, n_users=14, n_items=11, n=90):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(0.5, 5.0, n).astype(np.float32)
    return u, i, r


def test_nmf_oracle_parity():
    n_users, n_items = 14, 11
    u, i, r = _toy()
    cfg = SGDConfig(kernel="linear", n_factors=5, min_rating=0.0,
                    max_rating=5.0)
    params = nmf_ops.init_nmf_params(jax.random.PRNGKey(0), n_users,
                                     n_items, cfg, 0.05, 1.0)
    data = sgd.pack_ratings(u, i, r, batch_size=32)
    cnt_u = jnp.asarray(np.bincount(
        u, minlength=params.user_features.shape[0]).astype(np.float32))
    cnt_i = jnp.asarray(np.bincount(
        i, minlength=params.item_features.shape[0]).astype(np.float32))
    P0 = np.asarray(params.user_features)
    Q0 = np.asarray(params.item_features)

    out, hist = nmf_ops.jit_nmf_train(cfg, 6, 0.06, 0.08)(
        params, data, cnt_u, cnt_i)
    oP, oQ, ohist = _oracle_nmf(P0, Q0, u, i, r.astype(np.float64),
                                cfg.n_factors, 6, 0.06, 0.08)

    np.testing.assert_allclose(
        np.asarray(out.user_features)[:n_users, :cfg.n_factors],
        oP[:n_users, :cfg.n_factors], rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out.item_features)[:n_items, :cfg.n_factors],
        oQ[:n_items, :cfg.n_factors], rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(hist), ohist, rtol=1e-3)


def test_nmf_batch_size_invariant():
    """Each alternating pass is full-batch math: batches only tile the
    segment sums, so results match across batch sizes."""
    n_users, n_items = 14, 11
    u, i, r = _toy(seed=3)
    cfg = SGDConfig(kernel="linear", n_factors=4, min_rating=0.0,
                    max_rating=5.0)
    outs = []
    for bs in (8, 128):
        # rebuilt per run: the trainer donates its params argument
        params = nmf_ops.init_nmf_params(jax.random.PRNGKey(1), n_users,
                                         n_items, cfg, 0.05, 1.0)
        cnt_u = jnp.asarray(np.bincount(
            u, minlength=params.user_features.shape[0]).astype(np.float32))
        cnt_i = jnp.asarray(np.bincount(
            i, minlength=params.item_features.shape[0]).astype(np.float32))
        data = sgd.pack_ratings(u, i, r, batch_size=bs)
        out, _ = nmf_ops.jit_nmf_train(cfg, 4, 0.06, 0.06)(
            params, data, cnt_u, cnt_i)
        outs.append(np.asarray(out.user_features))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-6)


def test_nmf_learns_and_stays_nonnegative():
    X, y = lowrank_ratings(n_users=60, n_items=40, n_factors=3,
                           density=0.5, min_rating=0.5, max_rating=5.0,
                           seed=5)
    m = NMF(n_factors=8, n_epochs=40, reg=0.04, batch_size=2048,
            min_rating=0.5, max_rating=5.0, seed=1)
    m.fit(X, y)
    assert m.train_rmse[-1] < 0.6 * m.train_rmse[0]
    assert m.train_rmse[-1] < 0.45
    # alternating MU descends the regularized objective; train RMSE
    # should be near-monotone (no Jacobi-style zigzag)
    assert (np.diff(m.train_rmse) <= 1e-3).all()
    assert (m.user_features >= 0).all() and (m.item_features >= 0).all()
    preds = np.asarray(m.predict(X))
    assert np.isfinite(preds).all()
    assert preds.min() >= 0.5 and preds.max() <= 5.0


def test_nmf_lifecycle_and_cold_start():
    X, y = lowrank_ratings(n_users=40, n_items=30, density=0.4,
                           min_rating=0.5, max_rating=5.0, seed=2)
    m = NMF(n_factors=6, n_epochs=25, min_rating=0.5, max_rating=5.0)
    m.fit(X, y)

    # cold-start: unknown pairs fall back to the (clipped) global mean
    df = pd.DataFrame({"user_id": ["__nope__", X["user_id"][0]],
                       "item_id": [X["item_id"][0], "__nope__"]})
    preds = m.predict(df)
    assert m.predictions_possible == [False, False]
    assert np.allclose(preds, np.clip(m.global_mean, 0.5, 5.0))

    # recommend: top-k over the catalog, caller-passed items excluded
    # (reference semantics: recommender_base.py:245-250)
    user = X["user_id"][0]
    seen = set(X[X["user_id"] == user]["item_id"])
    rec = m.recommend(user, amount=5, items_known=list(seen))
    assert len(rec) == 5
    assert not (set(rec["item_id"]) & seen)
    assert (rec["rating_pred"].to_numpy()[:-1]
            >= rec["rating_pred"].to_numpy()[1:]).all()

    # update_users: new user learns with the item side frozen
    Q_before = m.item_features.copy()
    new_items = X["item_id"].unique()[:6]
    Xn = pd.DataFrame({"user_id": ["brand_new"] * 6, "item_id": new_items})
    yn = pd.Series(np.linspace(4.5, 5.0, 6))
    m.update_users(Xn, yn, n_epochs=30)
    np.testing.assert_array_equal(m.item_features, Q_before)
    got = m.predict(Xn)
    assert np.mean(np.abs(np.asarray(got) - yn.to_numpy())) < 1.5
    assert m.contains_user("brand_new")


def test_nmf_dp_matches_single_device():
    """The dp trainer is the SAME full-batch math (segment sums split
    over devices + one item psum per epoch), so an 8-device mesh fit
    must match the single-device fit up to float reassociation."""
    from matrix_factorization_tpu.parallel.mesh import make_mesh

    X, y = lowrank_ratings(n_users=50, n_items=35, density=0.5,
                           min_rating=0.5, max_rating=5.0, seed=11)
    kw = dict(n_factors=6, n_epochs=12, reg=0.05, batch_size=256,
              min_rating=0.5, max_rating=5.0, seed=3)
    m1 = NMF(**kw).fit(X, y)
    mesh = make_mesh(n_data=8, n_model=1)
    m8 = NMF(**kw, mesh=mesh).fit(X, y)
    np.testing.assert_allclose(m8.train_rmse, m1.train_rmse,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(m8.item_features, m1.item_features,
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(m8.user_features, m1.user_features,
                               rtol=2e-3, atol=2e-4)
    p1 = np.asarray(m1.predict(X))
    p8 = np.asarray(m8.predict(X))
    np.testing.assert_allclose(p8, p1, rtol=1e-3, atol=1e-3)


def test_nmf_rejects_negative_ratings():
    X = pd.DataFrame({"user_id": [1, 2], "item_id": [1, 2]})
    with pytest.raises(ValueError, match="non-negative"):
        NMF().fit(X, pd.Series([1.0, -0.5]))


def test_nmf_checkpoint_roundtrip(tmp_path):
    X, y = lowrank_ratings(n_users=25, n_items=20, density=0.4, seed=7,
                           min_rating=0.5, max_rating=5.0)
    m = NMF(n_factors=5, n_epochs=10, min_rating=0.5, max_rating=5.0)
    m.fit(X, y)
    save_model(m, tmp_path / "nmf_ckpt")
    m2 = load_model(tmp_path / "nmf_ckpt")
    assert isinstance(m2, NMF)
    p1 = m.predict(X)
    p2 = m2.predict(X)
    np.testing.assert_allclose(p1, p2, rtol=1e-6)
    assert m2.global_mean == m.global_mean
