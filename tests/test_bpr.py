"""BPR pairwise-ranking trainer: oracle step parity, ranking quality,
lifecycle semantics (extension beyond the reference — ops/bpr.py)."""

import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp

from matrix_factorization_tpu import BPR
from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops import bpr as bpr_ops
from matrix_factorization_tpu.ops import segment_sgd as sgd


def _blocky_interactions(n_users=60, n_items=40, per_user=12, seed=0):
    """Two user groups, each strongly preferring one half of the catalog
    (plus a little cross-group noise) — an unambiguous ranking signal."""
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        own = np.arange(0, n_items // 2) if u < n_users // 2 else \
            np.arange(n_items // 2, n_items)
        other = np.setdiff1d(np.arange(n_items), own)
        pos = list(rng.choice(own, size=per_user, replace=False))
        if rng.random() < 0.3:
            pos.append(int(rng.choice(other)))
        rows += [(u, it) for it in dict.fromkeys(pos)]
    df = pd.DataFrame(rows, columns=["user_id", "item_id"])
    return df


def test_bpr_step_matches_numpy_oracle():
    """One triplet minibatch (with duplicate user/item collisions) must
    match a numpy re-derivation of the BPR-Opt gradients exactly."""
    cfg = SGDConfig(kernel="linear", n_factors=4, reg=0.05,
                    min_rating=0.0, max_rating=1.0)
    kp = sgd.padded_width(cfg)
    rng = np.random.default_rng(1)
    n_users, n_items = 6, 5
    params = sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg,
                             global_mean=0.0, init_sd=0.3)
    P0 = np.asarray(params.user_features).copy()
    Q0 = np.asarray(params.item_features).copy()
    # duplicates on every axis, incl. a j == i neutral collision
    u = np.array([0, 0, 2, 3, 3, 5], np.int32)
    i = np.array([1, 2, 2, 0, 4, 3], np.int32)
    j = np.array([3, 3, 1, 4, 4, 3], np.int32)  # last triplet: j == i
    w = np.array([1, 1, 1, 1, 1, 0], np.float32)  # and a padded slot
    lr = 0.1

    (P1, Q1, loss), _ = jax.jit(
        lambda c, b: bpr_ops._bpr_step(c, b, cfg, lr, True)
    )((params.user_features, params.item_features, jnp.float32(0.0)),
      (jnp.asarray(u), jnp.asarray(i), jnp.asarray(j), jnp.asarray(w)))

    # numpy oracle
    pu, qi, qj = P0[u], Q0[i], Q0[j]
    x = np.einsum("nk,nk->n", pu, qi - qj)
    s = w / (1.0 + np.exp(x))
    want_loss = float(np.sum(np.log1p(np.exp(-x)) * w))
    umask = sgd.update_mask(cfg, "user")
    imask = sgd.update_mask(cfg, "item")
    regw = (cfg.reg * w)[:, None]
    gP = (s[:, None] * (qi - qj) - regw * pu) * umask[None, :]
    gQi = (s[:, None] * pu - regw * qi) * imask[None, :]
    gQj = (-s[:, None] * pu - regw * qj) * imask[None, :]
    Pw, Qw = P0.copy(), Q0.copy()
    np.add.at(Pw, u, lr * gP)
    dQ = np.zeros_like(Qw)
    np.add.at(dQ, i, gQi)
    np.add.at(dQ, j, gQj)
    Qw += lr * dQ

    np.testing.assert_allclose(np.asarray(P1), Pw, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Q1), Qw, atol=1e-6)
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-5)
    # invariants: constant columns never move, b_u never moves
    cc_u, cc_i = sgd.const_col(cfg, "user"), sgd.const_col(cfg, "item")
    np.testing.assert_array_equal(np.asarray(P1)[:, cc_u], P0[:, cc_u])
    np.testing.assert_array_equal(np.asarray(Q1)[:, cc_i], Q0[:, cc_i])
    np.testing.assert_array_equal(
        np.asarray(P1)[:, sgd.bias_col(cfg, "user")],
        P0[:, sgd.bias_col(cfg, "user")])


def test_bpr_tiled_trainer_matches_direct_scatter_semantics():
    """The tile-aggregated trainer (fit's single-device default) must be
    the SAME update as per-row scatters on the same pack — tiles may only
    change float summation order.  aggregate=False packs carry identical
    batch layout (the chunk sort already leaves batches user-sorted) but
    no tile metadata, so every op degrades to the per-row path."""
    X = _blocky_interactions(n_users=300, n_items=80, per_user=10)
    u = X["user_id"].to_numpy(np.int32)
    i = X["item_id"].to_numpy(np.int32)
    r = np.ones(len(u), np.float32)
    cfg = SGDConfig(kernel="linear", n_factors=16, reg=0.01,
                    min_rating=0.0, max_rating=1.0)
    params = sgd.init_params(jax.random.PRNGKey(0), 300, 80, cfg,
                             global_mean=0.0, init_sd=0.1)
    packs = [sgd.pack_ratings(u, i, r, 512, shuffle_seed=7, order="user",
                              aggregate=agg, agg_min_gain=-1.0)
             for agg in (True, False)]
    assert packs[0].agg_prim[1] > 0, "tile metadata missing: test is vacuous"
    outs = []
    for data in packs:
        p2, hist = jax.jit(
            lambda p, d, k: bpr_ops.bpr_train_tiled(
                p, d, k, cfg, 4, 0.05, 80)
        )(params, data, jax.random.PRNGKey(5))
        outs.append((np.asarray(p2.user_features),
                     np.asarray(p2.item_features), np.asarray(hist)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=2e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=2e-5)
    np.testing.assert_allclose(outs[0][2], outs[1][2], rtol=1e-5)


def test_bpr_learns_ranking_and_is_deterministic():
    X = _blocky_interactions()
    m = BPR(n_factors=16, n_epochs=40, lr=0.1, reg=0.002, batch_size=256,
            seed=3)
    m.fit(X)
    assert m.train_loss[-1] < m.train_loss[0]
    auc = m.auc(X, n_neg=30, seed=0)
    assert auc > 0.85, auc

    m2 = BPR(n_factors=16, n_epochs=40, lr=0.1, reg=0.002, batch_size=256,
             seed=3).fit(X)
    np.testing.assert_array_equal(m.user_features, m2.user_features)
    np.testing.assert_array_equal(m.item_features, m2.item_features)

    # recommend: own-group items rank above the other group's
    known = set(X.loc[X.user_id == 0, "item_id"])
    recs = m.recommend(user=0, amount=8, items_known=known)
    assert len(recs) == 8
    assert not set(recs["item_id"]) & known
    assert recs["rating_pred"].is_monotonic_decreasing
    own_hits = sum(1 for it in recs["item_id"] if it < 20)
    assert own_hits >= 6, list(recs["item_id"])


def test_bpr_predict_and_cold_start():
    X = _blocky_interactions(n_users=20, n_items=20, per_user=6)
    m = BPR(n_factors=8, n_epochs=20, lr=0.1, batch_size=128, seed=0).fit(X)
    assert m.predict(X.iloc[:0]) == []
    scores = m.predict(X.iloc[:5])
    assert len(scores) == 5 and np.isfinite(scores).all()
    cold = pd.DataFrame({"user_id": ["nope"], "item_id": [X.item_id.iloc[0]]})
    s = m.predict(cold)
    assert m.predictions_possible == [False]
    assert np.isfinite(s).all()


def test_bpr_update_users_freezes_items():
    X = _blocky_interactions()
    m = BPR(n_factors=16, n_epochs=30, lr=0.1, batch_size=256, seed=1).fit(X)
    Q_before = m.item_features.copy()
    # a brand-new user with group-B positives
    upd = pd.DataFrame({"user_id": ["newbie"] * 6,
                        "item_id": [20, 22, 24, 26, 28, 30]})
    m.update_users(upd)
    np.testing.assert_array_equal(m.item_features, Q_before)
    recs = m.recommend(user="newbie", amount=8,
                       items_known=set(upd["item_id"]))
    b_hits = sum(1 for it in recs["item_id"] if it >= 20)
    assert b_hits >= 6, list(recs["item_id"])
    # update whose items are all unknown is a no-op
    Q2 = m.item_features.copy()
    m.update_users(pd.DataFrame({"user_id": ["x"], "item_id": ["ghost"]}))
    np.testing.assert_array_equal(m.item_features, Q2)


def test_dp_bpr_mesh_training():
    """Data-parallel BPR on the 8-device mesh: learns the ranking, is
    deterministic, and the overlap_psum variant is bit-identical to the
    synchronous schedule when each epoch is one batch per device."""
    from matrix_factorization_tpu.parallel.mesh import make_mesh

    X = _blocky_interactions()
    mesh = make_mesh(n_data=8)
    m = BPR(n_factors=16, n_epochs=40, lr=0.1, reg=0.002, batch_size=128,
            seed=3, mesh=mesh)
    m.fit(X)
    assert m.train_loss[-1] < m.train_loss[0]
    assert m.auc(X, n_neg=30, seed=0) > 0.85

    m2 = BPR(n_factors=16, n_epochs=40, lr=0.1, reg=0.002, batch_size=128,
             seed=3, mesh=mesh).fit(X)
    np.testing.assert_array_equal(m.item_features, m2.item_features)

    # overlap knob: converges, and with one batch per device per epoch
    # the deferred psum flushes before anything reads it -> bit-equal
    m3 = BPR(n_factors=16, n_epochs=40, lr=0.1, reg=0.002, batch_size=128,
             seed=3, mesh=mesh, overlap_psum=True).fit(X)
    assert m3.auc(X, n_neg=30, seed=0) > 0.85

    big_bs = 4096  # every per-device epoch is a single padded batch
    a = BPR(n_factors=8, n_epochs=5, lr=0.1, batch_size=big_bs, seed=1,
            mesh=mesh).fit(X)
    b = BPR(n_factors=8, n_epochs=5, lr=0.1, batch_size=big_bs, seed=1,
            mesh=mesh, overlap_psum=True).fit(X)
    np.testing.assert_array_equal(a.item_features, b.item_features)
    np.testing.assert_array_equal(a.user_features, b.user_features)

    with pytest.raises(ValueError, match="overlap_psum"):
        BPR(overlap_psum=True)


def test_bpr_update_users_empty_positive_set_grows_table():
    """Regression: update_users that registers a new user but then
    filters every row out (no positives) must still grow the table —
    otherwise the orphan dense id clamp-gathers another user's row."""
    X = _blocky_interactions()
    m = BPR(n_factors=8, n_epochs=3, lr=0.1, batch_size=256, seed=0).fit(X)
    cap = m._params.user_features.shape[0]
    assert m.n_users <= cap
    new = pd.DataFrame({"user_id": [999990 + k for k in range(cap - m.n_users + 3)],
                        "item_id": [int(X.item_id.iloc[0])] * (cap - m.n_users + 3)})
    m.update_users(new, y=pd.Series(np.zeros(len(new), np.float32)))
    assert m._params.user_features.shape[0] >= m.n_users


def test_bpr_update_users_keeps_factors_of_users_without_positives():
    """Regression: a KNOWN user whose update rows are all non-positive
    gets zero training pairs, so their trained row must NOT be
    re-initialized to random noise (they'd serve random scores)."""
    X = _blocky_interactions()
    m = BPR(n_factors=8, n_epochs=5, lr=0.1, batch_size=256, seed=0).fit(X)
    known = X.user_id.iloc[0]
    other = X.user_id.iloc[-1]
    row_before = np.asarray(
        m._params.user_features[m.user_vocab.encode(
            np.asarray([known], dtype=object))[0]]).copy()
    upd = pd.DataFrame({
        "user_id": [known, other, other],
        "item_id": [int(X.item_id.iloc[0]), int(X.item_id.iloc[1]),
                    int(X.item_id.iloc[2])],
    })
    # known's interaction is non-positive; other has real positives
    m.update_users(upd, y=pd.Series(np.array([0.0, 1.0, 1.0], np.float32)))
    row_after = np.asarray(
        m._params.user_features[m.user_vocab.encode(
            np.asarray([known], dtype=object))[0]])
    np.testing.assert_array_equal(row_after, row_before)


def test_bpr_warm_start_auc_rejects_all_training_positives():
    """Regression: warm segments on different interactions must extend
    (not replace) the AUC negative-rejection pair set."""
    X = _blocky_interactions()
    half = len(X) // 2
    X1, X2 = X.iloc[:half], X.iloc[half:]
    m = BPR(n_factors=8, n_epochs=3, lr=0.1, batch_size=256, seed=0).fit(X)
    n_all = len(m._train_pairs[0])
    m2 = BPR(n_factors=8, n_epochs=3, lr=0.1, batch_size=256, seed=0).fit(X1)
    # warm-continue on rows whose ids are all known (X shares the vocab)
    known_u = set(X1.user_id)
    known_i = set(X1.item_id)
    X2k = X2[X2.user_id.isin(known_u) & X2.item_id.isin(known_i)]
    if len(X2k):
        m2.fit(X2k, warm_start=True)
        assert len(m2._train_pairs[0]) == len(X1) + len(X2k) <= n_all + len(X1)


def test_bpr_validation():
    with pytest.raises(ValueError):
        BPR(serving_dtype="float16")
    X = pd.DataFrame({"user_id": [1, 2], "item_id": [1, 2]})
    with pytest.raises(ValueError, match="positive"):
        BPR().fit(X, pd.Series([0.0, 0.0]))


def test_dp_bpr_tiled_layouts_and_windows():
    """The tiled dp BPR trainer (default mesh layout, VERDICT r3 #5):
    learns the ranking, is deterministic, windows (psum_every) converge,
    and the flat layout remains available and learning."""
    from matrix_factorization_tpu.parallel.mesh import make_mesh

    X = _blocky_interactions()
    mesh = make_mesh(n_data=8)

    m = BPR(n_factors=16, n_epochs=40, lr=0.1, reg=0.002, batch_size=128,
            seed=3, mesh=mesh, dp_layout="tiled")
    m.fit(X)
    assert m.train_loss[-1] < m.train_loss[0]
    assert m.auc(X, n_neg=30, seed=0) > 0.85

    m2 = BPR(n_factors=16, n_epochs=40, lr=0.1, reg=0.002, batch_size=128,
             seed=3, mesh=mesh, dp_layout="tiled").fit(X)
    np.testing.assert_array_equal(m.item_features, m2.item_features)

    # windowed psum + overlap compose on the tiled path
    m3 = BPR(n_factors=16, n_epochs=40, lr=0.1, reg=0.002, batch_size=128,
             seed=3, mesh=mesh, dp_layout="tiled", psum_every="auto",
             overlap_psum=True).fit(X)
    assert m3.auc(X, n_neg=30, seed=0) > 0.85

    mf = BPR(n_factors=16, n_epochs=40, lr=0.1, reg=0.002, batch_size=128,
             seed=3, mesh=mesh, dp_layout="flat").fit(X)
    assert mf.auc(X, n_neg=30, seed=0) > 0.85

    with pytest.raises(ValueError, match="dp_layout"):
        BPR(dp_layout="bogus")
    with pytest.raises(ValueError, match="psum_every"):
        BPR(psum_every=4)
