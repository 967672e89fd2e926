"""Vmapped hyperparameter sweep: per-candidate equivalence with
sequential fits, and the model-level grid_search_kernel_mf API.

TPU-native counterpart of the reference's sklearn GridSearchCV usage
(examples/recommender-system.ipynb cells 29-30; the sklearn path itself
is covered by tests/test_sklearn_compat.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.data.synthetic import lowrank_ratings
from matrix_factorization_tpu.models.grid_search import grid_search_kernel_mf
from matrix_factorization_tpu.ops import segment_sgd as sgd
from matrix_factorization_tpu.ops import sweep


def test_grid_train_matches_sequential(rng):
    """Each vmapped candidate must equal the same (lr, reg) trained
    alone — vmap only batches the program."""
    n_users, n_items, n = 40, 30, 600
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    mu = float(r.mean())

    cfg = SGDConfig(kernel="linear", n_factors=8, batch_size=128,
                    compute_epoch_rmse=True)
    data = sgd.pack_ratings(u, i, r, cfg.batch_size)
    lrs = jnp.asarray([0.01, 0.05, 0.02], jnp.float32)
    regs = jnp.asarray([0.1, 0.01, 0.5], jnp.float32)

    params_k, hist_k = sweep.grid_train(
        data, n_users, n_items, cfg, 3, lrs, regs, mu, seed=7
    )
    assert params_k.user_features.shape[0] == 3

    k_init, k_train = jax.random.split(jax.random.PRNGKey(7))
    for c in range(3):
        p0 = sgd.init_params(k_init, n_users, n_items, cfg, mu)
        want, want_hist = sgd.sgd_train(
            p0, data, k_train, cfg, 3, float(lrs[c]), reg=float(regs[c])
        )
        np.testing.assert_allclose(
            np.asarray(params_k.user_features[c]),
            np.asarray(want.user_features), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(hist_k[c]), np.asarray(want_hist), atol=1e-5,
        )


def test_reg_override_defaults_to_cfg(rng):
    """sgd_train(reg=None) must behave exactly as before the override
    hook existed (reg taken from cfg)."""
    n_users, n_items, n = 20, 15, 200
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    cfg = SGDConfig(kernel="sigmoid", n_factors=4, batch_size=64, reg=0.07,
                    min_rating=1, max_rating=5, compute_epoch_rmse=False)
    data = sgd.pack_ratings(u, i, r, cfg.batch_size)
    p0 = sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg,
                         float(r.mean()))
    key = jax.random.PRNGKey(1)
    a, _ = sgd.sgd_train(p0, data, key, cfg, 2, 0.01)
    b, _ = sgd.sgd_train(p0, data, key, cfg, 2, 0.01, reg=jnp.float32(0.07))
    np.testing.assert_allclose(np.asarray(a.user_features),
                               np.asarray(b.user_features), atol=1e-6)


def test_grid_search_kernel_mf_picks_best():
    X, y = lowrank_ratings(n_users=80, n_items=60, n_factors=4,
                           density=0.3, noise_sd=0.1, seed=5)
    cut = int(len(y) * 0.8)
    model, results = grid_search_kernel_mf(
        X.iloc[:cut], y.iloc[:cut], X.iloc[cut:], y.iloc[cut:],
        lrs=[0.005, 0.02], regs=[0.01, 0.2], n_epochs=5,
        n_factors=8, batch_size=256,
    )
    assert len(results) == 4
    assert results == sorted(results, key=lambda d: d["val_rmse"])
    assert (model.lr, model.reg) == (results[0]["lr"], results[0]["reg"])
    # the returned model is fully usable (predict + recommend lifecycle)
    preds = model.predict(X.iloc[cut:])
    got = float(np.sqrt(np.mean((preds - y.iloc[cut:].to_numpy()) ** 2)))
    assert abs(got - results[0]["val_rmse"]) < 1e-4
    recs = model.recommend(user=X["user_id"].iloc[0], amount=3)
    assert len(recs) == 3
    assert np.isfinite(recs["rating_pred"].to_numpy()).all()
    assert len(model.train_rmse) == 5


def test_grid_search_cv_folds():
    """cv=F runs one vmapped sweep per fold, averages scores, and refits
    the winner on all data (the reference's GridSearchCV(cv=5) protocol,
    notebook cell 29)."""
    import pytest

    X, y = lowrank_ratings(n_users=70, n_items=50, n_factors=3,
                           density=0.4, noise_sd=0.1, seed=9)
    model, results = grid_search_kernel_mf(
        X, y, lrs=[0.005, 0.02], regs=[0.01, 0.2], n_epochs=5, cv=3,
        n_factors=8, batch_size=256,
    )
    assert len(results) == 4
    assert np.isfinite(results[0]["val_rmse"])
    # refit on all data: full lifecycle works and beats the global mean
    from matrix_factorization_tpu.utils.metrics import rmse as _rmse

    e = _rmse(y, model.predict(X))
    base = _rmse(y, np.full(len(y), float(y.mean())))
    assert e < base
    assert len(model.train_rmse) == 5
    # both-or-neither validation protocols raise
    with pytest.raises(ValueError, match="X_val"):
        grid_search_kernel_mf(X, y, lrs=[0.01], regs=[0.01])
    with pytest.raises(ValueError, match="X_val"):
        grid_search_kernel_mf(X, y, X, y, lrs=[0.01], regs=[0.01], cv=2)


def test_grid_search_skips_diverged_candidates():
    """A grid containing a divergent lr must never select the NaN
    candidate (jnp.argmin would otherwise pick the first NaN)."""
    X, y = lowrank_ratings(n_users=60, n_items=40, n_factors=3,
                           density=0.4, noise_sd=0.1, seed=3)
    cut = int(len(y) * 0.8)
    model, results = grid_search_kernel_mf(
        X.iloc[:cut], y.iloc[:cut], X.iloc[cut:], y.iloc[cut:],
        lrs=[0.01, 50.0], regs=[0.01], n_epochs=8,
        n_factors=8, batch_size=128,
    )
    assert model.lr == 0.01
    assert np.isfinite(np.asarray(model._params.user_features)).all()
    assert np.isnan(results[-1]["val_rmse"])  # the diverged one, last
    preds = model.predict(X.iloc[cut:])
    assert np.isfinite(preds).all()


def test_grid_search_validation_gaps():
    """cv=1 (empty per-fold train splits) and X_val-without-y_val raise
    explicit ValueErrors instead of failing downstream (ADVICE r2)."""
    import pytest

    X, y = lowrank_ratings(n_users=30, n_items=20, density=0.4, seed=5)
    with pytest.raises(ValueError, match="cv must be >= 2"):
        grid_search_kernel_mf(X, y, lrs=[0.01], regs=[0.01], cv=1,
                              n_epochs=2, n_factors=4, batch_size=64)
    with pytest.raises(ValueError, match="y_val"):
        grid_search_kernel_mf(X, y, X_val=X, lrs=[0.01], regs=[0.01],
                              n_epochs=2, n_factors=4, batch_size=64)


def test_jit_grid_train_threads_init(rng):
    """jit_grid_train must honor init_mean/init_sd (ADVICE r2: the cached
    lambda silently trained every candidate with the default init)."""
    X, y = lowrank_ratings(n_users=40, n_items=30, density=0.4, seed=7)
    from matrix_factorization_tpu.models.kernel_mf import KernelMF

    m = KernelMF(n_factors=8, batch_size=64)
    u, i, r = m._preprocess_fit(X, y)
    cfg = m._cfg()
    data = sgd.pack_ratings(u, i, r, cfg.batch_size,
                            row_width=cfg.padded_factors)
    lrs = jnp.asarray([0.01], jnp.float32)
    regs = jnp.asarray([0.01], jnp.float32)
    mu = jnp.float32(float(r.mean()))
    key = jax.random.PRNGKey(0)
    p_default, _ = sweep.jit_grid_train(cfg, 1, m.n_users, m.n_items)(
        data, lrs, regs, mu, key)
    p_big, _ = sweep.jit_grid_train(cfg, 1, m.n_users, m.n_items,
                                    init_sd=1.0)(data, lrs, regs, mu, key)
    # same seed, different init_sd: factor tables must differ
    assert not np.allclose(np.asarray(p_default.user_features),
                           np.asarray(p_big.user_features))
    # and the explicit default must reproduce the implicit default
    p_expl, _ = sweep.jit_grid_train(cfg, 1, m.n_users, m.n_items,
                                     init_mean=0.0, init_sd=0.1)(
        data, lrs, regs, mu, key)
    np.testing.assert_array_equal(np.asarray(p_default.user_features),
                                  np.asarray(p_expl.user_features))
