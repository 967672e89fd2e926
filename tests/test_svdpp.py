"""SVD++ (models/svdpp.py, ops/svdpp.py): oracle parity for the
epoch-cached schedule, learning quality, lifecycle, checkpointing."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.data.synthetic import lowrank_ratings
from matrix_factorization_tpu.models import KernelMF, SVDpp
from matrix_factorization_tpu.ops import segment_sgd as sgd
from matrix_factorization_tpu.ops import svdpp as svdpp_ops


def _oracle_train(P, Q, Y, mu, u, i, r, cfg, n_epochs, lr, lr_y, reg,
                  reg_y, n_users, n_items):
    """Float64 numpy oracle of the SAME schedule as ops/svdpp.py with one
    batch per epoch: epoch-cached S, summed-minibatch p/q updates,
    epoch-deferred y update regrouped over the observed pairs."""
    P, Q, Y = P.astype(np.float64), Q.astype(np.float64), Y.astype(np.float64)
    kp = P.shape[1]
    umask = sgd.update_mask(cfg, "user").astype(np.float64)
    imask = sgd.update_mask(cfg, "item").astype(np.float64)
    fmask = (np.arange(kp) < cfg.n_factors).astype(np.float64)
    counts = np.bincount(u, minlength=n_users).astype(np.float64)
    wvec = np.zeros(P.shape[0])
    wvec[:n_users] = np.where(counts > 0, 1 / np.sqrt(np.maximum(counts, 1)),
                              0.0)
    deg = np.zeros(Q.shape[0])
    deg[:n_items] = np.bincount(i, minlength=n_items)
    hist = []
    for _ in range(n_epochs):
        S = np.zeros_like(P)
        np.add.at(S, u, Y[i])
        S = S * wvec[:, None]
        eff = P[u] + S[u]
        e = r - (mu + np.einsum("nk,nk->n", eff, Q[i]))
        hist.append(np.sqrt(np.mean(e * e)))
        gp = (e[:, None] * Q[i] - reg * P[u]) * umask[None, :]
        gq = (e[:, None] * eff - reg * Q[i]) * imask[None, :]
        A = np.zeros_like(P)
        np.add.at(A, u, e[:, None] * Q[i] * fmask[None, :])
        dP = np.zeros_like(P)
        np.add.at(dP, u, lr * gp)
        dQ = np.zeros_like(Q)
        np.add.at(dQ, i, lr * gq)
        P, Q = P + dP, Q + dQ
        gY = np.zeros_like(Y)
        np.add.at(gY, i, A[u] * wvec[u][:, None])
        Y = Y + lr_y * (gY - reg_y * deg[:, None] * Y) * fmask[None, :]
    return P, Q, Y, hist


def test_svdpp_oracle_parity():
    rng = np.random.default_rng(0)
    n_users, n_items, n = 12, 15, 80
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    cfg = SGDConfig(kernel="linear", n_factors=6, lr=0.05, reg=0.02,
                    min_rating=1.0, max_rating=5.0)
    mu = float(r.mean())
    params = svdpp_ops.init_params(jax.random.PRNGKey(0), n_users, n_items,
                                   cfg, mu, init_sd=0.1)
    up, ip, rp, wp, bs = svdpp_ops.pack_pairs(u, i, r, batch_size=4096)
    assert bs == n and len(up) == n  # single batch -> order-free schedule
    wvec = svdpp_ops._neighbor_weights(u, n_users,
                                       params.user_features.shape[0])
    deg = np.zeros(params.item_features.shape[0], np.float32)
    deg[:n_items] = np.bincount(i, minlength=n_items)
    fn = svdpp_ops.jit_svdpp_train(cfg, 6, 0.05, 0.02, bs, n, len(up))
    out, hist = fn(params, up, ip, rp, wp, wvec, deg, jax.random.PRNGKey(7))

    oP, oQ, oY, ohist = _oracle_train(
        np.asarray(params.user_features), np.asarray(params.item_features),
        np.asarray(params.implicit_features), mu, u, i,
        r.astype(np.float64), cfg, 6, 0.05, 0.05, 0.02, 0.02,
        n_users, n_items)
    np.testing.assert_allclose(np.asarray(out.user_features), oP, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.item_features), oQ, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.implicit_features), oY,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(hist), ohist, atol=1e-4)
    # the implicit table actually learned something
    assert np.abs(oY).max() > 1e-6
    # materialized sums match a fresh recompute from the final y table
    import jax.numpy as jnp

    S = svdpp_ops.implicit_sum(out.implicit_features, jnp.asarray(up),
                               jnp.asarray(ip), jnp.asarray(wp),
                               jnp.asarray(wvec))
    np.testing.assert_allclose(np.asarray(out.user_implicit_sums),
                               np.asarray(S), atol=1e-6)


def test_svdpp_batched_oracle_parity():
    """The tile-aggregated trainer (svdpp_train_batched) reproduces the
    same single-batch trajectory as the float64 oracle — one batch makes
    the schedule order-free, so the pack's in-batch user sort and the
    tile einsums must only change float summation order."""
    rng = np.random.default_rng(1)
    # id spaces must exceed the minimum tile span C=32 or the cost model
    # (correctly) refuses to tile
    n_users, n_items, n = 40, 35, 400
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    cfg = SGDConfig(kernel="linear", n_factors=6, lr=0.05, reg=0.02,
                    min_rating=1.0, max_rating=5.0)
    mu = float(r.mean())
    params = svdpp_ops.init_params(jax.random.PRNGKey(0), n_users, n_items,
                                   cfg, mu, init_sd=0.1)
    data = sgd.pack_ratings(u, i, r, batch_size=4096, shuffle_seed=0,
                            order="user", agg_min_gain=-10.0,
                            row_width=cfg.padded_factors)
    assert data.user_ids.shape[0] == 1  # single batch -> order-free
    assert data.agg_prim[1] > 0  # tiles forced on even at toy scale
    wvec = svdpp_ops._neighbor_weights(u, n_users,
                                       params.user_features.shape[0])
    deg = np.zeros(params.item_features.shape[0], np.float32)
    deg[:n_items] = np.bincount(i, minlength=n_items)
    fn = svdpp_ops.jit_svdpp_train_batched(cfg, 6, 0.05, 0.02)
    out, hist = fn(params, data, jnp.asarray(wvec), jnp.asarray(deg),
                   jax.random.PRNGKey(7))
    oP, oQ, oY, ohist = _oracle_train(
        np.asarray(params.user_features), np.asarray(params.item_features),
        np.asarray(params.implicit_features), mu, u, i,
        r.astype(np.float64), cfg, 6, 0.05, 0.05, 0.02, 0.02,
        n_users, n_items)
    np.testing.assert_allclose(np.asarray(out.user_features), oP, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.item_features), oQ, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.implicit_features), oY,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(hist), ohist, atol=1e-4)
    S = svdpp_ops.implicit_sum_batched(out.implicit_features, data,
                                       jnp.asarray(wvec))
    np.testing.assert_allclose(np.asarray(out.user_implicit_sums),
                               np.asarray(S), atol=1e-6)


def test_svdpp_batched_tile_vs_scatter_equivalence():
    """Forced-on tile aggregation == plain per-row scatter on the SAME
    multi-batch pack (identical batch membership; updates are summed, so
    only float summation order may differ)."""
    rng = np.random.default_rng(2)
    n_users, n_items, n = 40, 30, 600
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    cfg = SGDConfig(kernel="linear", n_factors=6, lr=0.05, reg=0.02,
                    min_rating=1.0, max_rating=5.0)
    mu = float(r.mean())
    params = svdpp_ops.init_params(jax.random.PRNGKey(3), n_users, n_items,
                                   cfg, mu, init_sd=0.1)
    wvec = jnp.asarray(svdpp_ops._neighbor_weights(
        u, n_users, params.user_features.shape[0]))
    deg = np.zeros(params.item_features.shape[0], np.float32)
    deg[:n_items] = np.bincount(i, minlength=n_items)
    deg = jnp.asarray(deg)
    outs = []
    for kwargs in ({"agg_min_gain": -10.0}, {"aggregate": False}):
        data = sgd.pack_ratings(u, i, r, batch_size=128, shuffle_seed=0,
                                order="user", row_width=cfg.padded_factors,
                                **kwargs)
        assert data.user_ids.shape[0] > 1
        fn = svdpp_ops.jit_svdpp_train_batched(cfg, 4, 0.05, 0.02)
        outs.append(fn(params, data, wvec, deg, jax.random.PRNGKey(9)))
    (a, ha), (b, hb) = outs
    assert outs[0][0].user_features is not None
    np.testing.assert_allclose(np.asarray(a.user_features),
                               np.asarray(b.user_features), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.item_features),
                               np.asarray(b.item_features), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.implicit_features),
                               np.asarray(b.implicit_features), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), atol=1e-5)


def test_svdpp_learns_and_serves():
    X, y = lowrank_ratings(n_users=60, n_items=50, density=0.4, seed=3)
    m = SVDpp(n_factors=8, n_epochs=25, lr=0.05, reg=0.02, batch_size=512,
              seed=1)
    m.fit(X, y)
    assert m.train_rmse[-1] < 0.7 * m.train_rmse[0]
    # predict clamps and marks cold pairs
    preds = m.predict(X.iloc[:40])
    assert all(m.min_rating <= p <= m.max_rating for p in preds)
    # recommend: sorted desc, excludes items_known
    uid = X.user_id.iloc[0]
    known = X[X.user_id == uid].item_id.tolist()
    rec = m.recommend(user=uid, amount=5, items_known=known)
    s = rec["rating_pred"].to_numpy()
    assert (np.diff(s) <= 1e-6).all()
    assert not set(rec["item_id"]) & set(known)
    # bf16 serving variant serves
    mb = SVDpp(n_factors=8, n_epochs=5, lr=0.05, batch_size=512, seed=1,
               serving_dtype="bfloat16").fit(X, y)
    assert len(mb.recommend(user=uid, amount=3)) == 3


def test_svdpp_beats_or_matches_plain_mf():
    """With equal budgets SVD++ stays in plain MF's league on train RMSE
    (lowrank synthetic data carries no implicit-only signal, so the
    extra stochastic y-term buys nothing here and costs a little
    fixed-budget convergence), and the learned y-table must actually
    contribute (nonzero implicit features)."""
    X, y = lowrank_ratings(n_users=80, n_items=60, density=0.35, seed=5)
    sv = SVDpp(n_factors=8, n_epochs=20, lr=0.05, reg=0.02, batch_size=1024,
               seed=2).fit(X, y)
    km = KernelMF(kernel="linear", n_factors=8, n_epochs=20, lr=0.05,
                  reg=0.02, batch_size=1024, seed=2).fit(X, y)
    assert sv.train_rmse[-1] <= km.train_rmse[-1] * 1.4
    assert np.abs(sv.implicit_features).max() > 1e-4


def test_svdpp_update_users_freezes_items():
    X, y = lowrank_ratings(n_users=50, n_items=40, density=0.4, seed=7)
    m = SVDpp(n_factors=8, n_epochs=15, lr=0.05, batch_size=512, seed=3)
    m.fit(X, y)
    Q0 = m.item_features.copy()
    Y0 = m.implicit_features.copy()
    gm = m.global_mean
    new = pd.DataFrame({"user_id": [9999] * 6,
                        "item_id": X.item_id.iloc[:6].to_numpy()})
    ny = pd.Series(np.asarray(y.iloc[:6]))
    m.update_users(new, ny)
    np.testing.assert_array_equal(m.item_features, Q0)
    np.testing.assert_array_equal(m.implicit_features, Y0)
    assert m.global_mean == gm
    # the new user can now be served, and better than the global mean
    preds = np.asarray(m.predict(new))
    assert np.sqrt(np.mean((preds - ny.to_numpy()) ** 2)) < np.sqrt(
        np.mean((gm - ny.to_numpy()) ** 2)) + 1e-6
    # unknown-item-only update is a no-op
    bogus = pd.DataFrame({"user_id": [1], "item_id": ["__nope__"]})
    m.update_users(bogus, pd.Series([3.0]))


def test_svdpp_checkpoint_roundtrip(tmp_path):
    from matrix_factorization_tpu.core.checkpoint import load_model, save_model

    X, y = lowrank_ratings(n_users=30, n_items=25, density=0.5, seed=9)
    m = SVDpp(n_factors=6, n_epochs=8, lr=0.05, batch_size=256, seed=4)
    m.fit(X, y)
    save_model(m, tmp_path / "svdpp")
    m2 = load_model(tmp_path / "svdpp")
    np.testing.assert_allclose(m2.predict(X.iloc[:20]), m.predict(X.iloc[:20]),
                               atol=1e-6)
    np.testing.assert_array_equal(m2.implicit_features, m.implicit_features)
    assert m2.train_rmse == m.train_rmse
    uid = X.user_id.iloc[0]
    pd.testing.assert_frame_equal(m2.recommend(user=uid, amount=5),
                                  m.recommend(user=uid, amount=5))


def test_dp_svdpp_mesh_training():
    """Data-parallel SVD++ on the 8-device mesh: learns, is
    deterministic, and with one batch per device per epoch the global
    summed update equals the single-device single-batch trajectory."""
    from matrix_factorization_tpu.parallel.mesh import make_mesh

    X, y = lowrank_ratings(n_users=60, n_items=50, density=0.4, seed=11)
    mesh = make_mesh(n_data=8)
    m = SVDpp(n_factors=8, n_epochs=20, lr=0.05, reg=0.02, batch_size=64,
              seed=6, mesh=mesh).fit(X, y)
    assert m.train_rmse[-1] < m.train_rmse[0]
    m2 = SVDpp(n_factors=8, n_epochs=20, lr=0.05, reg=0.02, batch_size=64,
               seed=6, mesh=mesh).fit(X, y)
    np.testing.assert_array_equal(m.item_features, m2.item_features)
    np.testing.assert_array_equal(m.implicit_features, m2.implicit_features)

    # overlap knob converges and serves
    m3 = SVDpp(n_factors=8, n_epochs=20, lr=0.05, reg=0.02, batch_size=64,
               seed=6, mesh=mesh, overlap_psum=True).fit(X, y)
    assert m3.train_rmse[-1] < m3.train_rmse[0]
    assert len(m3.recommend(user=X.user_id.iloc[0], amount=5)) == 5

    # one batch per device == one global summed batch: dp trajectory
    # matches the single-device big-batch trajectory to float tolerance
    big = 4096
    a = SVDpp(n_factors=8, n_epochs=5, lr=0.05, reg=0.02, batch_size=big,
              seed=7, mesh=mesh).fit(X, y)
    b = SVDpp(n_factors=8, n_epochs=5, lr=0.05, reg=0.02, batch_size=big,
              seed=7).fit(X, y)
    np.testing.assert_allclose(a.user_features, b.user_features, atol=1e-5)
    np.testing.assert_allclose(a.item_features, b.item_features, atol=1e-5)
    np.testing.assert_allclose(a.implicit_features, b.implicit_features,
                               atol=1e-5)

    with pytest.raises(ValueError, match="overlap_psum"):
        SVDpp(overlap_psum=True)


def test_svdpp_validation():
    with pytest.raises(ValueError):
        SVDpp(serving_dtype="float16")
    with pytest.raises(ValueError):  # duplicate pairs rejected at fit
        X = pd.DataFrame({"user_id": [1, 1], "item_id": [2, 2]})
        SVDpp(n_epochs=1).fit(X, pd.Series([3.0, 4.0]))


def test_dp_svdpp_tiled_layouts_and_windows():
    """dp_layout knob + windowed psum on the tiled SVD++ dp trainer
    (VERDICT r3 #5): tiled default learns, flat stays available, and
    psum_every/overlap compose."""
    from matrix_factorization_tpu.parallel.mesh import make_mesh

    X, y = lowrank_ratings(n_users=60, n_items=50, density=0.4, seed=11)
    mesh = make_mesh(n_data=8)
    kw = dict(n_factors=8, n_epochs=15, lr=0.05, reg=0.02, batch_size=32,
              seed=6, mesh=mesh)
    mt = SVDpp(dp_layout="tiled", **kw).fit(X, y)
    assert mt.train_rmse[-1] < mt.train_rmse[0]
    mf = SVDpp(dp_layout="flat", **kw).fit(X, y)
    assert mf.train_rmse[-1] < mf.train_rmse[0]
    # same objective/layout family: destinations agree loosely
    assert abs(mt.train_rmse[-1] - mf.train_rmse[-1]) < 0.05

    mw = SVDpp(dp_layout="tiled", psum_every="auto", overlap_psum=True,
               **kw).fit(X, y)
    assert mw.train_rmse[-1] < mw.train_rmse[0]
    assert len(mw.recommend(user=X.user_id.iloc[0], amount=5)) == 5

    with pytest.raises(ValueError, match="dp_layout"):
        SVDpp(dp_layout="bogus")
    with pytest.raises(ValueError, match="psum_every"):
        SVDpp(psum_every=2)
