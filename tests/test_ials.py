"""Factor ALS (iALS extension): exact single-entity solve vs numpy ridge,
convergence dominance over SGD-at-same-epochs, model integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matrix_factorization_tpu import KernelMF
from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.data.synthetic import lowrank_ratings
from matrix_factorization_tpu.ops import ials
from matrix_factorization_tpu.ops import segment_sgd as sgd
from matrix_factorization_tpu.utils.metrics import rmse


def test_user_sweep_matches_numpy_ridge(rng):
    """One user sweep = per-user ridge regression on [q_i, 1] -> [p_u, b_u]."""
    n_users, n_items, k, n = 6, 15, 4, 60
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    mu = float(r.mean())
    reg = 0.3

    cfg = SGDConfig(kernel="linear", n_factors=k, reg=reg, batch_size=32,
                    compute_epoch_rmse=False)
    params = sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg, mu)
    by_user = ials.group_by_entity(u, i, r, n_users)
    by_item = ials.group_by_entity(i, u, r, n_items)
    out, _ = ials.jit_ials_train(cfg, 1, update_item_params=False)(
        params, by_user, by_item, sgd.pack_ratings(u, i, r, 32)
    )

    Q = np.asarray(params.item_features, np.float64)
    bi_col = sgd.bias_col(cfg, "item")
    for user in range(n_users):
        rows = np.where(u == user)[0]
        X = np.column_stack([Q[i[rows], :k], np.ones(len(rows))])
        y = r[rows].astype(np.float64) - mu - Q[i[rows], bi_col]
        sol = np.linalg.solve(X.T @ X + reg * np.eye(k + 1), X.T @ y)
        got_p = np.asarray(out.user_features[user, :k], np.float64)
        got_b = float(out.user_features[user, sgd.bias_col(cfg, "user")])
        np.testing.assert_allclose(got_p, sol[:k], atol=2e-3)
        np.testing.assert_allclose(got_b, sol[k], atol=2e-3)


def test_kernelmf_als_converges_fast():
    X, y = lowrank_ratings(n_users=100, n_items=80, n_factors=4,
                           density=0.4, noise_sd=0.05, seed=2)
    als = KernelMF(n_factors=8, n_epochs=5, method="als", reg=0.1,
                   batch_size=256).fit(X, y)
    sgd_m = KernelMF(n_factors=8, n_epochs=5, method="sgd", lr=0.02,
                     reg=0.02, batch_size=256).fit(X, y)
    e_als = rmse(y, als.predict(X))
    e_sgd = rmse(y, sgd_m.predict(X))
    # exact alternation should dominate 5 epochs of SGD
    assert e_als < e_sgd
    assert als.train_rmse[-1] <= als.train_rmse[0]
    # lifecycle still works
    recs = als.recommend(user=X["user_id"].iloc[0], amount=5)
    assert len(recs) == 5


def test_als_rejects_nonlinear_kernels():
    with pytest.raises(ValueError, match="linear"):
        KernelMF(kernel="rbf", method="als")
    with pytest.raises(ValueError, match="Method"):
        KernelMF(method="newton")


def test_als_update_users_cold_start():
    X, y = lowrank_ratings(n_users=60, n_items=40, density=0.5, seed=19)
    holdout = X["user_id"] == 0
    m = KernelMF(n_factors=6, method="als", reg=0.1, n_epochs=5,
                 batch_size=128).fit(X[~holdout], y[~holdout])
    items_before = m.item_features.copy()
    m.update_users(X[holdout], y[holdout], n_epochs=5)
    np.testing.assert_array_equal(m.item_features, items_before)
    err = rmse(y[holdout], m.predict(X[holdout]))
    base = rmse(y[holdout], np.full(int(holdout.sum()), float(y.mean())))
    assert err < base


def test_bucketed_matches_simple_path(rng):
    """The count-bucketed sweep produces the same solution as the simple
    single-pad path (both are exact solves)."""
    n_users, n_items, k, n = 25, 18, 4, 300
    flat = rng.choice(n_users * n_items, size=n, replace=False)
    u = (flat // n_items).astype(np.int32)
    i = (flat % n_items).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    mu = float(r.mean())

    cfg = SGDConfig(kernel="linear", n_factors=k, reg=0.2, batch_size=64,
                    compute_epoch_rmse=True)
    params = sgd.init_params(jax.random.PRNGKey(3), n_users, n_items, cfg, mu)
    data = sgd.pack_ratings(u, i, r, 64)

    by_user = ials.group_by_entity(u, i, r, n_users)
    by_item = ials.group_by_entity(i, u, r, n_items)
    simple, h1 = ials.jit_ials_train(cfg, 3)(params, by_user, by_item, data)

    bu = ials.group_by_entity_bucketed(u, i, r, n_users, max_block_rows=64)
    bi = ials.group_by_entity_bucketed(i, u, r, n_items, max_block_rows=64)
    assert len(bu) > 1  # the tiny cap forces multiple buckets/chunks
    bucketed, h2 = ials.ials_train_bucketed(params, bu, bi, data, cfg, 3)

    np.testing.assert_allclose(
        np.asarray(simple.user_features), np.asarray(bucketed.user_features),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(simple.item_features), np.asarray(bucketed.item_features),
        atol=2e-4,
    )
    np.testing.assert_allclose(np.asarray(h1), h2, atol=1e-4)


def test_dp_bucketed_matches_single_device(rng):
    """Data-parallel bucketed iALS (entity solves sharded over the mesh,
    one all_gather of solutions per bucket) must reproduce the
    single-device bucketed solution exactly — the solves are independent
    per entity, so sharding them is semantics-free."""
    from matrix_factorization_tpu.parallel.mesh import (
        make_mesh,
        make_multislice_mesh,
    )

    n_users, n_items, k, n = 37, 23, 4, 400
    flat = rng.choice(n_users * n_items, size=n, replace=False)
    u = (flat // n_items).astype(np.int32)
    i = (flat % n_items).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    mu = float(r.mean())

    cfg = SGDConfig(kernel="linear", n_factors=k, reg=0.2, batch_size=64,
                    compute_epoch_rmse=True)
    params = sgd.init_params(jax.random.PRNGKey(3), n_users, n_items, cfg, mu)
    data = sgd.pack_ratings(u, i, r, 64)
    bu = ials.group_by_entity_bucketed(u, i, r, n_users, max_block_rows=64)
    bi = ials.group_by_entity_bucketed(i, u, r, n_items, max_block_rows=64)

    def fresh():
        # the sweeps donate the owned table, so each path gets its own
        # (identical, same-key) param buffers
        return sgd.init_params(jax.random.PRNGKey(3), n_users, n_items, cfg,
                               mu)

    ref, h_ref = ials.ials_train_bucketed(fresh(), bu, bi, data, cfg, 2)
    # 37 users / 4 devices forces pad rows in every bucket split
    mesh = make_mesh(n_data=4, n_model=1)
    got, h_got = ials.dp_ials_train_bucketed(fresh(), bu, bi, data, cfg, 2,
                                             mesh=mesh)
    np.testing.assert_allclose(np.asarray(ref.user_features),
                               np.asarray(got.user_features), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.item_features),
                               np.asarray(got.item_features), atol=1e-5)
    np.testing.assert_allclose(h_ref, h_got, atol=1e-5)

    # DCN-major multislice mesh: identical math, collectives ride both axes
    ms = make_multislice_mesh(n_slices=2, n_data=2, n_model=1)
    got_ms, _ = ials.dp_ials_train_bucketed(fresh(), bu, bi, data, cfg, 2,
                                            mesh=ms)
    np.testing.assert_allclose(np.asarray(ref.user_features),
                               np.asarray(got_ms.user_features), atol=1e-5)


def test_kernelmf_als_with_mesh_matches_single_device():
    """KernelMF(method='als', mesh=...) routes through the sharded solver
    and must match the mesh-free fit (exact alternation either way)."""
    from matrix_factorization_tpu.parallel.mesh import make_mesh

    X, y = lowrank_ratings(n_users=50, n_items=30, n_factors=3,
                           density=0.5, noise_sd=0.05, seed=7)
    kw = dict(n_factors=6, n_epochs=3, method="als", reg=0.1, batch_size=128)
    ref = KernelMF(**kw).fit(X, y)
    got = KernelMF(mesh=make_mesh(n_data=4, n_model=1), **kw).fit(X, y)
    np.testing.assert_allclose(np.asarray(ref.user_features),
                               np.asarray(got.user_features), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref.item_features),
                               np.asarray(got.item_features), atol=1e-4)
    np.testing.assert_allclose(ref.train_rmse, got.train_rmse, atol=1e-4)
    # lifecycle on the mesh-trained model
    recs = got.recommend(user=X["user_id"].iloc[0], amount=4)
    assert len(recs) == 4


def test_gram_dtype_validation_and_highest_path(rng):
    """'highest' requests exact f32 MACs; result must stay close to the
    default path on tiny problems, and bad dtypes raise."""
    n_users, n_items, k, n = 10, 8, 3, 80
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    cfg = SGDConfig(kernel="linear", n_factors=k, reg=0.2, batch_size=32,
                    compute_epoch_rmse=False)
    def fresh():
        return sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg,
                               float(r.mean()))

    data = sgd.pack_ratings(u, i, r, 32)
    bu = ials.group_by_entity_bucketed(u, i, r, n_users)
    bi = ials.group_by_entity_bucketed(i, u, r, n_items)
    base, _ = ials.ials_train_bucketed(fresh(), bu, bi, data, cfg, 1)
    hi, _ = ials.ials_train_bucketed(fresh(), bu, bi, data, cfg, 1,
                                     gram_dtype="highest")
    np.testing.assert_allclose(np.asarray(base.user_features),
                               np.asarray(hi.user_features), atol=1e-4)
    with pytest.raises(ValueError, match="gram_dtype"):
        ials.ials_train_bucketed(fresh(), bu, bi, data, cfg, 1,
                                 gram_dtype="fp8")


def test_native_packing_byte_identical_to_numpy(rng):
    """The native O(n) packer (loader.cpp::mf_pack_grouped, ~13x faster
    at 25M ratings) must produce byte-identical buckets to the numpy
    stable-argsort fallback (VERDICT r1 #10)."""
    from matrix_factorization_tpu.data import loader

    lib = loader.get_native_lib()
    if lib is None:
        pytest.skip("native lib unavailable")

    n, U = 30_000, 700
    u = rng.integers(0, U, n).astype(np.int32)
    # all four native wire-encode branches: {uint16, hi-plane} ids x
    # {int8 half-step, f32} ratings (loader.cpp::mf_pack_grouped_wire)
    for max_other, half in [(300, False), (300, True),
                            (9_000_000, False), (9_000_000, True)]:
        i = rng.integers(0, max_other, n).astype(np.int32)
        r = ((rng.integers(1, 11, n) * 0.5) if half
             else rng.uniform(0.5, 5, n)).astype(np.float32)

        nat_b = ials.group_by_entity_bucketed(u, i, r, U,
                                              max_block_rows=50_000)
        nat_g = ials.group_by_entity(u, i, r, U)
        loader._lib = None
        loader._build_failed = True
        try:
            ref_b = ials.group_by_entity_bucketed(u, i, r, U,
                                                  max_block_rows=50_000)
            ref_g = ials.group_by_entity(u, i, r, U)
        finally:
            loader._lib = lib
            loader._build_failed = False
        assert len(nat_b) == len(ref_b) > 1
        for a, b in zip(nat_b, ref_b):
            for f in a._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
                    err_msg=f"{max_other=} {half=} field={f}")
        for f in nat_g._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(nat_g, f)), np.asarray(getattr(ref_g, f)),
                err_msg=f"{max_other=} {half=} field={f}")


def test_per_obs_reg_scale_matches_numpy_and_bucketed(rng):
    """reg_scale='per_obs' solves per-user ridge with reg*n_obs(u) on the
    diagonal — the ALS counterpart of SGD's per-rating L2 (see
    ops/ials.py::_reg_diag) — and the grouped / bucketed paths agree."""
    n_users, n_items, k, n = 6, 15, 4, 60
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    mu = float(r.mean())
    reg = 0.3

    cfg = SGDConfig(kernel="linear", n_factors=k, reg=reg, batch_size=32,
                    compute_epoch_rmse=False)
    params = sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg, mu)
    by_user = ials.group_by_entity(u, i, r, n_users)
    by_item = ials.group_by_entity(i, u, r, n_items)
    data = sgd.pack_ratings(u, i, r, 32)
    out, _ = ials.jit_ials_train(
        cfg, 1, update_item_params=False, reg_scale="per_obs"
    )(params, by_user, by_item, data)

    Q = np.asarray(params.item_features, np.float64)
    bi_col = sgd.bias_col(cfg, "item")
    for user in range(n_users):
        rows = np.where(u == user)[0]
        X = np.column_stack([Q[i[rows], :k], np.ones(len(rows))])
        y = r[rows].astype(np.float64) - mu - Q[i[rows], bi_col]
        ridge = reg * len(rows) * np.eye(k + 1)
        sol = np.linalg.solve(X.T @ X + ridge, X.T @ y)
        got_p = np.asarray(out.user_features[user, :k], np.float64)
        got_b = float(out.user_features[user, sgd.bias_col(cfg, "user")])
        np.testing.assert_allclose(got_p, sol[:k], atol=2e-3)
        np.testing.assert_allclose(got_b, sol[k], atol=2e-3)

    bu = ials.group_by_entity_bucketed(u, i, r, n_users)
    bi = ials.group_by_entity_bucketed(i, u, r, n_items)
    bucketed, _ = ials.ials_train_bucketed(
        params, bu, bi, data, cfg, 1, update_item_params=False,
        reg_scale="per_obs",
    )
    np.testing.assert_allclose(
        np.asarray(bucketed.user_features), np.asarray(out.user_features),
        atol=2e-4,
    )
    with pytest.raises(ValueError):
        ials.ials_train_bucketed(params, bu, bi, data, cfg, 1,
                                 reg_scale="bogus")
    with pytest.raises(ValueError):
        KernelMF(method="als", reg_scale="bogus")


def test_sigmoid_als_warm_start_beats_cold_sgd():
    """als_warm_start (the ALS/SGD hybrid): one exact logit-space sweep
    should land sigmoid SGD at a far better start than random init."""
    X, y = lowrank_ratings(n_users=120, n_items=90, n_factors=4,
                           density=0.35, noise_sd=0.1, min_rating=0.5,
                           max_rating=5.0, seed=5)
    kw = dict(n_factors=8, n_epochs=3, kernel="sigmoid", lr=0.01,
              reg=0.02, min_rating=0.5, max_rating=5.0, batch_size=512)
    cold = KernelMF(**kw).fit(X, y)
    warm = KernelMF(als_warm_start=1, **kw).fit(X, y)
    # first recorded epoch RMSE reflects the init quality
    assert warm.train_rmse[0] < cold.train_rmse[0] - 0.05, (
        warm.train_rmse, cold.train_rmse)
    assert warm.train_rmse[-1] < cold.train_rmse[-1]
    # linear kernel accepts the flag too
    lin = KernelMF(als_warm_start=1, n_factors=8, n_epochs=2,
                   kernel="linear", lr=0.002, reg=0.02, min_rating=0.5,
                   max_rating=5.0, batch_size=512).fit(X, y)
    assert lin.train_rmse[-1] <= lin.train_rmse[0]
    # als_warm_reg decouples the warm ridge from the SGD reg (at 25M
    # scale the default SGD reg underregularizes the exact solves —
    # benchmarks/sigmoid_warmstart.py).  The knob must be live
    # (different ridge -> different fit) and still a good init.
    strong = KernelMF(als_warm_start=1, als_warm_reg=0.5, **kw).fit(X, y)
    assert strong.train_rmse[0] != warm.train_rmse[0], (
        strong.train_rmse, warm.train_rmse)
    assert strong.train_rmse[0] < cold.train_rmse[0] - 0.05
    with pytest.raises(ValueError):
        KernelMF(kernel="rbf", als_warm_start=1)
    with pytest.raises(ValueError):
        KernelMF(method="als", als_warm_start=1)
    with pytest.raises(ValueError):
        KernelMF(als_warm_start=-1)


def test_als_warm_start_skipped_on_warm_start_continuation():
    """fit(warm_start=True) must continue from the current tables; the
    exact warm sweeps are a FRESH-fit initializer and re-running them
    mid-continuation would overwrite the SGD-refined rows (code-review
    r3 finding #2 — fit_resumable's chunked fits hit this path)."""
    X, y = lowrank_ratings(n_users=80, n_items=60, n_factors=4,
                           density=0.35, noise_sd=0.1, min_rating=0.5,
                           max_rating=5.0, seed=9)
    kw = dict(n_factors=8, kernel="sigmoid", lr=0.01, reg=0.02,
              min_rating=0.5, max_rating=5.0, batch_size=512,
              als_warm_start=1)
    m = KernelMF(n_epochs=2, **kw)
    m.fit(X, y)
    calls = []
    orig = m._run_als_warm_start
    m._run_als_warm_start = lambda *a, **k: calls.append(1) or orig(*a, **k)
    before = np.asarray(m._params.user_features).copy()
    rmse_before = m.train_rmse[-1]
    m.fit(X, y, n_epochs=2, warm_start=True)
    assert not calls, "warm sweeps must not re-run on a continuation fit"
    # the continuation actually trained on from the previous tables
    assert len(m.train_rmse) == 4
    # continuation descends near the previous floor (fresh shuffle keys
    # can wobble it a few 1e-3), instead of restarting from exact solves
    assert m.train_rmse[-1] <= rmse_before + 0.02
    assert not np.array_equal(before, np.asarray(m._params.user_features))


def test_ship_grouped_wire_codec_roundtrip(rng):
    """The compressed bucket wire format (uint16/uint8-plane ids, int8
    half-step ratings, mask rebuilt from counts) must decode to exactly
    the arrays the uncompressed path shipped, on every encode branch."""
    E, L = 7, 8
    counts = rng.integers(0, L + 1, E).astype(np.int32)

    def build(max_id, half_steps):
        oi = np.zeros((E, L), np.int32)
        rr = np.zeros((E, L), np.float32)
        mm = np.zeros((E, L), np.float32)
        for e in range(E):
            c = int(counts[e])
            oi[e, :c] = rng.integers(0, max_id, c)
            vals = (rng.integers(1, 11, c) * 0.5 if half_steps
                    else rng.uniform(0.1, 5.0, c))
            rr[e, :c] = vals
            mm[e, :c] = 1.0
        return oi, rr, mm

    for max_id, half in [(60_000, True),      # uint16 ids + int8 ratings
                         (60_000, False),     # uint16 ids + f32 ratings
                         (9_000_000, True),   # hi-plane ids + int8
                         (9_000_000, False)]:  # hi-plane ids + f32
        oi, rr, mm = build(max_id, half)
        doi, drr, dmm = ials._ship_grouped(oi.copy(), rr.copy(),
                                           counts, E, L)
        np.testing.assert_array_equal(np.asarray(doi), oi, err_msg=str((max_id, half)))
        np.testing.assert_array_equal(np.asarray(drr), rr)
        np.testing.assert_array_equal(np.asarray(dmm), mm)
        assert np.asarray(doi).dtype == np.int32
        assert np.asarray(drr).dtype == np.float32


def test_group_both_sides_matches_sequential(rng):
    """The thread-overlapped two-sided pack must equal two sequential
    group_by_entity_bucketed calls exactly."""
    n, U, I = 20_000, 500, 320
    u = rng.integers(0, U, n).astype(np.int32)
    i = rng.integers(0, I, n).astype(np.int32)
    r = rng.uniform(0.5, 5, n).astype(np.float32)
    bu, bi = ials.group_both_sides_bucketed(u, i, r, U, I,
                                            max_block_rows=40_000)
    su = ials.group_by_entity_bucketed(u, i, r, U, max_block_rows=40_000)
    si = ials.group_by_entity_bucketed(i, u, r, I, max_block_rows=40_000)
    for got, want in ((bu, su), (bi, si)):
        assert len(got) == len(want)
        for a, b in zip(got, want):
            for f in a._fields:
                np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                              np.asarray(getattr(b, f)))
