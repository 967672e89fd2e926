"""KernelMF: convergence on low-rank synthetic data for all three kernels,
sequential-parity (batch_size=1) vs a numpy oracle of the reference's
per-rating SGD, update_users cold-start, recommend semantics."""

import numpy as np
import pandas as pd
import pytest

from matrix_factorization_tpu import KernelMF
from matrix_factorization_tpu.data.synthetic import lowrank_ratings
from matrix_factorization_tpu.utils.metrics import rmse


@pytest.fixture(scope="module")
def data():
    return lowrank_ratings(n_users=100, n_items=80, n_factors=4,
                           density=0.4, noise_sd=0.05, seed=2)


def test_linear_converges_below_noise_floorish(data):
    X, y = data
    m = KernelMF(n_factors=8, n_epochs=40, kernel="linear", lr=0.02,
                 reg=0.02, batch_size=256, seed=0)
    m.fit(X, y)
    assert m.train_rmse[-1] < m.train_rmse[0]
    err = rmse(y, m.predict(X))
    base = rmse(y, np.full(len(y), y.mean()))
    assert err < 0.6 * base


@pytest.mark.parametrize("kernel,lr", [("sigmoid", 0.05), ("rbf", 0.3)])
def test_nonlinear_kernels_converge(data, kernel, lr):
    X, y = data
    m = KernelMF(n_factors=8, n_epochs=40, kernel=kernel, lr=lr,
                 reg=0.02, batch_size=256, seed=0)
    m.fit(X, y)
    base = rmse(y, np.full(len(y), y.mean()))
    assert rmse(y, m.predict(X)) < base


def _sequential_oracle(u, i, r, n_users, n_items, k, mu, P, Q, lr, reg, n_epochs):
    """Reference linear-kernel per-rating SGD in numpy (kernels.py:108-180
    semantics, fixed visit order, no shuffle)."""
    bu = np.zeros(n_users)
    bi = np.zeros(n_items)
    P, Q = P.copy(), Q.copy()
    for _ in range(n_epochs):
        for n in range(len(r)):
            a, b, y_ = u[n], i[n], r[n]
            pred = mu + bu[a] + bi[b] + P[a] @ Q[b]
            e = pred - y_
            bu[a] -= lr * (e + reg * bu[a])
            bi[b] -= lr * (e + reg * bi[b])
            pa = P[a].copy()
            P[a] -= lr * (e * Q[b] + reg * P[a])
            Q[b] -= lr * (e * pa + reg * Q[b])
    return bu, bi, P, Q


def test_batch_size_one_matches_sequential_oracle():
    """With batch_size=1 and a fixed visit order, the scan reproduces the
    reference trajectory exactly (modulo f32)."""
    import jax
    import jax.numpy as jnp

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    rng = np.random.default_rng(0)
    n_users, n_items, k, n = 12, 9, 4, 60
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    mu = float(r.mean())
    P0 = rng.normal(0, 0.1, (n_users, k)).astype(np.float32)
    Q0 = rng.normal(0, 0.1, (n_items, k)).astype(np.float32)

    cfg = SGDConfig(kernel="linear", n_factors=k, lr=0.01, reg=0.05,
                    batch_size=1, compute_epoch_rmse=False, shuffle="none")
    kp = cfg.padded_factors
    uf = jnp.zeros((n_users, kp)).at[:, :k].set(P0)
    uf = uf.at[:, sgd.const_col(cfg, "user")].set(1.0)
    itf = jnp.zeros((n_items, kp)).at[:, :k].set(Q0)
    itf = itf.at[:, sgd.const_col(cfg, "item")].set(1.0)
    params = sgd.MFParams(uf, itf, jnp.float32(mu))
    data = sgd.pack_ratings(u, i, r, 1, shuffle_seed=None)

    def steps(p):
        def body(p, batch):
            uu, ii, rr, ww = batch
            return sgd.sgd_minibatch_step(p, uu, ii, rr, ww, cfg, cfg.lr), None

        p, _ = jax.lax.scan(
            body, p, (data.user_ids, data.item_ids, data.ratings, data.weights)
        )
        return p

    out = jax.jit(steps)(params)
    for _ in range(2):  # 3 epochs total, same visit order
        out = jax.jit(steps)(out)

    bu, bi, P, Q = _sequential_oracle(
        u, i, r.astype(np.float64), n_users, n_items, k, mu,
        P0.astype(np.float64), Q0.astype(np.float64), 0.01, 0.05, 3,
    )
    ub = np.asarray(out.user_features[:, sgd.bias_col(cfg, "user")])
    ib = np.asarray(out.item_features[:, sgd.bias_col(cfg, "item")])
    np.testing.assert_allclose(ub, bu, atol=2e-4)
    np.testing.assert_allclose(ib, bi, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.user_features[:, :k]), P, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.item_features[:, :k]), Q, atol=2e-4)
    # constant column frozen at 1, padding columns stay exactly zero
    assert np.all(
        np.asarray(out.user_features[:, sgd.const_col(cfg, "user")]) == 1.0
    )
    assert np.all(np.asarray(out.user_features[:, k + 2 :]) == 0)


def test_update_users_cold_start(data):
    X, y = data
    holdout = X["user_id"] == 0
    m = KernelMF(n_factors=8, n_epochs=30, kernel="linear", lr=0.02,
                 reg=0.02, batch_size=256, seed=0)
    m.fit(X[~holdout], y[~holdout])
    item_features_before = m.item_features.copy()

    m.update_users(X[holdout], y[holdout], lr=0.02, n_epochs=30)
    assert m.contains_user(0)
    # item side frozen during update (reference :234)
    np.testing.assert_array_equal(m.item_features, item_features_before)
    err = rmse(y[holdout], m.predict(X[holdout]))
    base = rmse(y[holdout], np.full(int(holdout.sum()), y.mean()))
    assert err < base


def test_predict_unknown_pairs(data):
    X, y = data
    m = KernelMF(n_factors=4, n_epochs=5, batch_size=256).fit(X, y)
    out = m.predict(pd.DataFrame({"user_id": [-123, 0], "item_id": [0, -99]}))
    assert len(out) == 2 and m.predictions_possible == [False, False]


def test_recommend_top_amount(data):
    X, y = data
    m = KernelMF(n_factors=8, n_epochs=20, lr=0.02, reg=0.02,
                 batch_size=256).fit(X, y)
    user0_items = set(X.loc[X["user_id"] == 0, "item_id"])
    recs = m.recommend(user=0, amount=7, items_known=user0_items)
    assert len(recs) == 7
    assert not set(recs["item_id"]).intersection(user0_items)
    assert recs["rating_pred"].is_monotonic_decreasing
    assert (recs["rating_pred"] <= m.max_rating).all()


@pytest.mark.parametrize("kernel", ["linear", "sigmoid", "rbf"])
def test_tile_aggregation_matches_scatter_path(kernel, rng):
    """The MXU tile-aggregated update must equal the per-row scatter
    update exactly (up to float summation order)."""
    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd
    import jax

    n, U, I = 4000, 250, 180
    u = rng.integers(0, U, n).astype(np.int32)
    i = rng.integers(0, I, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    cfg = SGDConfig(kernel=kernel, n_factors=12, batch_size=512, lr=0.01,
                    reg=0.02, compute_epoch_rmse=True, shuffle="batch")
    p0 = sgd.init_params(jax.random.PRNGKey(0), U, I, cfg, float(r.mean()))
    d_agg = sgd.pack_ratings(u, i, r, 512, agg_min_gain=-10)
    d_pln = sgd.pack_ratings(u, i, r, 512, aggregate=False)
    assert d_agg.agg_prim[1] > 0 and d_agg.agg_sec[1] > 0
    pa, ha = sgd.sgd_train(p0, d_agg, jax.random.PRNGKey(1), cfg, 3, cfg.lr)
    pp, hp = sgd.sgd_train(p0, d_pln, jax.random.PRNGKey(1), cfg, 3, cfg.lr)
    np.testing.assert_allclose(pa.user_features, pp.user_features, atol=2e-6)
    np.testing.assert_allclose(pa.item_features, pp.item_features, atol=2e-6)
    np.testing.assert_allclose(ha, hp, atol=1e-5)


@pytest.mark.parametrize("order", ["user", "item"])
@pytest.mark.parametrize("frozen", [False, True])
def test_primary_layout_matches_scatter_path(order, frozen, rng):
    """The primary-sorted storage layout (tile gather-expand + tile
    scatter on the chunk-sort side, perm + tile scatter on the other)
    must equal the plain per-row path exactly, in both orders and with
    the secondary/primary side frozen (update_users mode)."""
    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd
    import jax

    # the primary side's id space is dense per batch (many ratings/id)
    # so its tiles are tight and the gather-expand path switches on
    n, bs = 8192, 1024
    U, I = (128, 200) if order == "user" else (200, 128)
    u = rng.integers(0, U, n).astype(np.int32)
    i = rng.integers(0, I, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    cfg = SGDConfig(kernel="linear", n_factors=12, batch_size=bs, lr=0.01,
                    reg=0.02, compute_epoch_rmse=True, shuffle="batch",
                    update_item_params=not frozen)
    p0 = sgd.init_params(jax.random.PRNGKey(0), U, I, cfg, float(r.mean()))
    d_agg = sgd.pack_ratings(u, i, r, bs, order=order, agg_min_gain=-10)
    assert d_agg.primary == order
    assert d_agg.agg_prim[1] > 0 and d_agg.agg_sec[1] > 0
    assert d_agg.expand_prim  # tight tiles at this shape -> expand wins
    d_pln = sgd.pack_ratings(u, i, r, bs, order=order, aggregate=False)
    pa, ha = sgd.sgd_train(p0, d_agg, jax.random.PRNGKey(1), cfg, 3, cfg.lr)
    pp, hp = sgd.sgd_train(p0, d_pln, jax.random.PRNGKey(1), cfg, 3, cfg.lr)
    np.testing.assert_allclose(pa.user_features, pp.user_features, atol=2e-6)
    np.testing.assert_allclose(pa.item_features, pp.item_features, atol=2e-6)
    np.testing.assert_allclose(ha, hp, atol=1e-5)


def test_item_epoch_order_rmse_parity(data):
    """epoch_order='item' (fast tile path) must reach the same quality as
    the reference's shuffled visit order — final-metric parity."""
    X, y = data
    rmse = {}
    for order in ("shuffle", "item"):
        m = KernelMF(n_factors=8, n_epochs=25, lr=0.02, reg=0.02,
                     batch_size=512, epoch_order=order)
        m.fit(X, y)
        rmse[order] = m.train_rmse[-1]
    assert abs(rmse["shuffle"] - rmse["item"]) < 0.01, rmse


def test_recommend_fallback_refreshes_predictions_possible(data):
    """Regression (ADVICE r1): recommend's non-catalog fallback (unknown
    user) must refresh predictions_possible like the reference's
    predict-backed recommend, not leave it stale from a prior call."""
    X, y = data
    m = KernelMF(n_factors=4, n_epochs=3, batch_size=256).fit(X, y)
    m.predict(X.iloc[:3])
    assert m.predictions_possible == [True, True, True]  # stale baseline
    recs = m.recommend(user="__never_seen__", amount=5)
    assert len(recs) == 5
    assert len(m.predictions_possible) == m.n_items
    assert not any(m.predictions_possible)  # unknown user: nothing possible


def test_duplicate_ratings_raise(data):
    X, y = data
    X2 = pd.concat([X, X.iloc[[0]]])
    y2 = pd.concat([y, y.iloc[[0]]])
    with pytest.raises(ValueError, match="Duplicate"):
        KernelMF(n_epochs=1).fit(X2, y2)


def test_invalid_kernel_raises():
    with pytest.raises(ValueError):
        KernelMF(kernel="quadratic")


def test_update_users_capacity_growth(data):
    """New users beyond the table capacity trigger padded growth without
    retraining from scratch."""
    X, y = data
    m = KernelMF(n_factors=6, n_epochs=5, lr=0.02, reg=0.02, batch_size=256)
    m.fit(X, y)
    cap_before = m._params.user_features.shape[0]

    n_new = cap_before + 50  # force growth past the initial capacity
    rng = np.random.default_rng(0)
    items = X["item_id"].unique()
    Xn = pd.DataFrame({
        "user_id": np.repeat(np.arange(10_000, 10_000 + n_new), 2),
        "item_id": rng.choice(items, 2 * n_new),
    }).drop_duplicates()
    yn = pd.Series(rng.uniform(1, 5, len(Xn)))
    m.update_users(Xn, yn, n_epochs=2)
    assert m._params.user_features.shape[0] >= m.n_users
    assert m.contains_user(10_000)
    preds = m.predict(Xn.iloc[:5])
    assert len(preds) == 5


def test_epoch_order_block_end_to_end():
    """KernelMF(epoch_order='block') trains through the 2D cell layout
    and converges like the default order (round 5)."""
    import pandas as pd

    from matrix_factorization_tpu import KernelMF
    from matrix_factorization_tpu.data.synthetic import lowrank_ratings
    from matrix_factorization_tpu.utils.metrics import rmse as _rmse

    X, y = lowrank_ratings(n_users=120, n_items=90, density=0.4, seed=2)
    errs = {}
    for order in ("shuffle", "block"):
        m = KernelMF(n_epochs=12, n_factors=16, lr=0.01, reg=0.02,
                     batch_size=1024, epoch_order=order, verbose=0)
        m.fit(X, y)
        errs[order] = _rmse(y, m.predict(X))
    assert errs["block"] < _rmse(y, np.full(len(y), y.mean()))
    assert abs(errs["block"] - errs["shuffle"]) < 0.05
