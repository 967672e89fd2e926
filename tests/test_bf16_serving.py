"""bf16-resident catalog serving (``KernelMF(serving_dtype='bfloat16')``).

The bf16 copy only changes the SERVING read path: training, ``predict``
and all parity numbers stay f32.  Quality bound here mirrors the on-chip
study (``benchmarks/bf16_serving.py``): top-k nearly identical, scores
within bf16 rounding of the stored table values.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from matrix_factorization_tpu import KernelMF
from matrix_factorization_tpu.data.synthetic import lowrank_ratings
from matrix_factorization_tpu.parallel import make_mesh


def _fit_pair(**kw):
    X, y = lowrank_ratings(n_users=60, n_items=50, density=0.5, seed=7)
    base = dict(n_factors=8, n_epochs=8, lr=0.02, reg=0.02, batch_size=256,
                seed=3)
    base.update(kw)
    f32 = KernelMF(**base).fit(X, y)
    bf16 = KernelMF(serving_dtype="bfloat16", **base).fit(X, y)
    return X, f32, bf16


def test_bf16_recommend_close_to_f32():
    X, f32, bf16 = _fit_pair()
    users = list(X["user_id"].unique()[:6])
    a = f32.recommend_batch(users, amount=8)
    b = bf16.recommend_batch(users, amount=8)
    for u in users:
        ia = list(a.loc[a.user_id == u, "item_id"])
        ib = list(b.loc[b.user_id == u, "item_id"])
        # identical training (same seed) -> only the bf16 rounding of
        # stored values separates the lists; demand heavy overlap
        assert len(set(ia) & set(ib)) >= 6, (u, ia, ib)
    np.testing.assert_allclose(
        np.sort(a.rating_pred.to_numpy()), np.sort(b.rating_pred.to_numpy()),
        atol=0.05)


def test_bf16_predict_stays_f32():
    X, f32, bf16 = _fit_pair()
    pa = np.asarray(f32.predict(X))
    pb = np.asarray(bf16.predict(X))
    np.testing.assert_array_equal(pa, pb)


def test_bf16_tables_actually_bf16_and_invalidate_on_refit():
    X, _, bf16 = _fit_pair()
    sp = bf16._serving_params()
    assert sp.item_features.dtype == jnp.bfloat16
    assert sp.user_features.dtype == jnp.bfloat16
    assert bf16._params.item_features.dtype == jnp.float32
    cached = bf16._serving_cache
    assert bf16._serving_params() is sp  # cache hit while params unchanged
    y2 = X["rating"] if "rating" in X else None
    # refit replaces _params -> the serving view must rebuild
    Xf, yf = lowrank_ratings(n_users=60, n_items=50, density=0.5, seed=8)
    bf16.fit(Xf, yf)
    assert bf16._serving_params() is not sp
    assert bf16._serving_cache is not cached


def test_bf16_rbf_kernel_scores():
    X, f32, bf16 = _fit_pair(kernel="rbf", lr=0.05)
    u = X["user_id"].iloc[0]
    a = f32.recommend(u, amount=5)
    b = bf16.recommend(u, amount=5)
    np.testing.assert_allclose(a.rating_pred.to_numpy(),
                               b.rating_pred.to_numpy(), atol=0.05)


def test_bf16_sharded_catalog(eight_cpu_devices=None):
    mesh = make_mesh()
    X, y = lowrank_ratings(n_users=64, n_items=48, density=0.6, seed=9)
    kw = dict(n_factors=8, n_epochs=6, lr=0.02, reg=0.02, batch_size=256,
              seed=3, mesh=mesh, keep_sharded=True)
    f32 = KernelMF(**kw).fit(X, y)
    bf16 = KernelMF(serving_dtype="bfloat16", **kw).fit(X, y)
    assert bf16._topk_catalog is not None
    assert bf16._topk_catalog.Q.dtype == jnp.bfloat16
    users = list(X["user_id"].unique()[:4])
    a = f32.recommend_batch(users, amount=6)
    b = bf16.recommend_batch(users, amount=6)
    for u in users:
        ia = set(a.loc[a.user_id == u, "item_id"])
        ib = set(b.loc[b.user_id == u, "item_id"])
        assert len(ia & ib) >= 4, (u, ia, ib)


def test_bf16_implicit_als():
    from matrix_factorization_tpu import ImplicitALS
    import pandas as pd

    rng = np.random.default_rng(11)
    n_u, n_i = 40, 30
    flat = rng.choice(n_u * n_i, size=400, replace=False)
    X = pd.DataFrame({"user_id": (flat // n_i).astype(np.int32),
                      "item_id": (flat % n_i).astype(np.int32)})
    s = pd.Series(rng.exponential(2.0, 400).astype(np.float32))
    kw = dict(n_factors=8, n_epochs=5, seed=2)
    a = ImplicitALS(**kw).fit(X, s)
    b = ImplicitALS(serving_dtype="bfloat16", **kw).fit(X, s)
    u = X["user_id"].iloc[0]
    ra = a.recommend(u, amount=6)
    rb = b.recommend(u, amount=6)
    assert len(set(ra.item_id) & set(rb.item_id)) >= 4
    np.testing.assert_allclose(ra.rating_pred.to_numpy(),
                               rb.rating_pred.to_numpy(), atol=0.05)


def test_serving_dtype_validation():
    with pytest.raises(ValueError):
        KernelMF(serving_dtype="float16")
    from matrix_factorization_tpu import ImplicitALS
    with pytest.raises(ValueError):
        ImplicitALS(serving_dtype="f16")
