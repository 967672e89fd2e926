"""EASE (Steck 2019): closed-form oracle parity + lifecycle + checkpoint.

The model is deterministic (one SPD inverse, no stochasticity), so the
oracle is the literal dense formula in float64.
"""

import numpy as np
import pandas as pd
import pytest

from matrix_factorization_tpu.core import checkpoint as ckpt
from matrix_factorization_tpu.models.ease import EASE
from matrix_factorization_tpu.ops import ease as ease_ops


def _toy(n_users=40, n_items=50, n=600, seed=0, half_ratings=False):
    rng = np.random.default_rng(seed)
    pairs = set()
    while len(pairs) < n:
        pairs.add((int(rng.integers(n_users)), int(rng.integers(n_items))))
    u, i = np.array(sorted(pairs)).T
    X = pd.DataFrame({"user_id": [f"u{x}" for x in u],
                      "item_id": [f"i{x}" for x in i]})
    y = pd.Series(rng.uniform(0.5, 5.0, len(u)).astype(np.float32))
    return X, y, u, i


def _dense_oracle(u, i, w, n_users, n_items, lam):
    X = np.zeros((n_users, n_items), np.float64)
    X[u, i] = w
    G = X.T @ X
    P = np.linalg.inv(G + lam * np.eye(n_items))
    B = -P / np.diag(P)[None, :]
    np.fill_diagonal(B, 0.0)
    return X, B


def test_weights_match_dense_oracle():
    X, y, u, i = _toy(n_items=50)  # 50: exercises item padding (not %8)
    m = EASE(reg=10.0).fit(X, y)
    w = np.ones(len(u))
    # model encodes ids in first-seen order; re-encode the oracle's ids
    ud = m.user_vocab.encode(X["user_id"].to_numpy())
    idn = m.item_vocab.encode(X["item_id"].to_numpy())
    Xd, B_ref = _dense_oracle(ud, idn, w, m.n_users, m.n_items, 10.0)
    B = np.asarray(m._params.item_weights)[: m.n_items, : m.n_items]
    assert np.abs(np.diag(B)).max() == 0.0
    np.testing.assert_allclose(B, B_ref, atol=5e-4)
    # catalog scores = X B
    S_ref = Xd @ B_ref
    S = m._catalog_scores_batch(np.arange(m.n_users))
    np.testing.assert_allclose(S, S_ref, atol=5e-4)


def test_weighted_histories_oracle():
    X, y, u, i = _toy(seed=3)
    m = EASE(reg=25.0, binarize=False).fit(X, y)
    ud = m.user_vocab.encode(X["user_id"].to_numpy())
    idn = m.item_vocab.encode(X["item_id"].to_numpy())
    Xd, B_ref = _dense_oracle(ud, idn, np.asarray(y, np.float64),
                              m.n_users, m.n_items, 25.0)
    S = m._catalog_scores_batch(np.arange(m.n_users))
    np.testing.assert_allclose(S, Xd @ B_ref, atol=3e-3)


def test_recommend_semantics():
    X, y, _, _ = _toy(seed=1)
    m = EASE(reg=5.0).fit(X, y)
    uid = X["user_id"].iloc[0]
    known = list(X[X["user_id"] == uid]["item_id"])
    rec = m.recommend(user=uid, amount=8, items_known=known)
    assert len(rec) == 8
    assert not (set(rec["item_id"]) & set(known))
    s = rec["rating_pred"].to_numpy()
    assert (np.diff(s) <= 1e-6).all()
    # the device top-k path agrees with the full score vector
    ud = int(m.user_vocab.encode(np.asarray([uid], dtype=object))[0])
    full = m._catalog_scores(ud)
    vals, idx = m._catalog_topk(np.asarray([ud]), 10)
    order = np.argsort(-full, kind="stable")[:10]
    np.testing.assert_allclose(vals[0], full[order], atol=1e-6)
    # batch recommend matches per-user recommend
    users = X["user_id"].unique()[:5].tolist()
    rb = m.recommend_batch(users, amount=5)
    for usr in users:
        single = m.recommend(user=usr, amount=5, bound_ratings=True)
        got = rb[rb["user_id"] == usr]
        assert got["item_id"].tolist() == single["item_id"].tolist()


def test_predict_pairs_and_cold_start():
    X, y, _, _ = _toy(seed=2)
    m = EASE(reg=5.0).fit(X, y)
    q = pd.DataFrame({
        "user_id": [X["user_id"].iloc[0], "GHOST", X["user_id"].iloc[1]],
        "item_id": [X["item_id"].iloc[0], X["item_id"].iloc[0], "GHOST"],
    })
    preds = m.predict(q, bound_ratings=True)
    assert len(preds) == 3
    assert m.predictions_possible == [True, False, False]
    assert preds[1] == 0.0 and preds[2] == 0.0
    assert all(0.0 <= p <= 1.0 for p in preds)
    ud = int(m.user_vocab.encode(np.asarray([q["user_id"].iloc[0]],
                                            dtype=object))[0])
    idn = int(m.item_vocab.encode(np.asarray([q["item_id"].iloc[0]],
                                             dtype=object))[0])
    full = m._catalog_scores(ud)
    assert abs(np.clip(full[idn], 0, 1) - preds[0]) < 1e-6
    assert m.predict(pd.DataFrame({"user_id": [], "item_id": []})) == []


def test_update_users_bookkeeping():
    X, y, _, _ = _toy(seed=4)
    m = EASE(reg=5.0).fit(X, y)
    items = X["item_id"].drop_duplicates().to_numpy()[:6]
    new = pd.DataFrame({"user_id": ["newbie"] * 6, "item_id": items})
    m.update_users(new, pd.Series(np.ones(6, np.float32)))
    assert m.contains_user("newbie")
    rec = m.recommend(user="newbie", amount=5, items_known=list(items))
    assert len(rec) == 5 and not (set(rec["item_id"]) & set(items))
    # known-user history REPLACED, not appended
    uid = X["user_id"].iloc[0]
    before = m._catalog_scores(
        int(m.user_vocab.encode(np.asarray([uid], dtype=object))[0]))
    upd = pd.DataFrame({"user_id": [uid], "item_id": [items[0]]})
    m.update_users(upd, pd.Series([1.0]))
    ud = int(m.user_vocab.encode(np.asarray([uid], dtype=object))[0])
    s, e = m._indptr[ud], m._indptr[ud + 1]
    assert e - s == 1  # old history gone
    after = m._catalog_scores(ud)
    assert not np.allclose(before, after)
    # update touching only unknown items is a no-op
    ghost = pd.DataFrame({"user_id": ["x"], "item_id": ["GHOST_ITEM"]})
    n_before = m.n_users
    m.update_users(ghost, pd.Series([1.0]))
    assert m.n_users == n_before or not m.contains_user("x")


def test_validation_and_guards():
    X, y, _, _ = _toy()
    with pytest.raises(ValueError):
        EASE(reg=0.0)
    with pytest.raises(ValueError):
        EASE(serving_dtype="fp8")
    with pytest.raises(RuntimeError):
        EASE().recommend(user="u0")
    dup = pd.concat([X.iloc[:1], X.iloc[:1]])
    with pytest.raises(ValueError):
        EASE().fit(dup, pd.Series([1.0, 2.0]))
    with pytest.raises(ValueError):
        EASE(binarize=False).fit(X.iloc[:2], pd.Series([-1.0, 2.0]))
    with pytest.raises(ValueError):
        ease_ops.check_item_budget(10_000_000)


def test_checkpoint_roundtrip(tmp_path):
    X, y, _, _ = _toy(seed=5)
    m = EASE(reg=7.5).fit(X, y)
    ckpt.save_model(m, tmp_path / "ease_ckpt")
    m2 = ckpt.load_model(tmp_path / "ease_ckpt")
    assert isinstance(m2, EASE) and m2.reg == 7.5
    np.testing.assert_array_equal(
        np.asarray(m._params.item_weights),
        np.asarray(m2._params.item_weights))
    users = X["user_id"].unique()[:4].tolist()
    pd.testing.assert_frame_equal(
        m.recommend_batch(users, amount=5),
        m2.recommend_batch(users, amount=5))


def test_bf16_serving_view():
    X, y, _, _ = _toy(seed=6)
    m32 = EASE(reg=5.0).fit(X, y)
    mb = EASE(reg=5.0, serving_dtype="bfloat16").fit(X, y)
    s32 = m32._catalog_scores_batch(np.arange(4))
    sb = mb._catalog_scores_batch(np.arange(4))
    # bf16-rounded B: scores agree to bf16 relative precision
    np.testing.assert_allclose(sb, s32, rtol=2e-2, atol=2e-2)
    # stored state stays f32 (checkpoint fidelity)
    assert str(mb._params.item_weights.dtype) == "float32"


def test_beats_popularity_on_clustered_data():
    """Ranking-quality regression: on data with genuine item-item
    co-occurrence structure (cluster fixture), EASE must beat the
    popularity ranker at leave-one-out hit@10 by a wide margin."""
    from matrix_factorization_tpu.data.synthetic import clustered_interactions

    X, y = clustered_interactions(n_users=300, n_items=240, n_clusters=6,
                                  per_user=16, seed=9)
    rng = np.random.default_rng(0)
    df = X.copy()
    hold_idx = df.groupby("user_id", sort=False).sample(
        n=1, random_state=0).index
    hold = df.loc[hold_idx]
    train = df.drop(hold_idx)
    m = EASE(reg=20.0).fit(train[["user_id", "item_id"]],
                           pd.Series(np.ones(len(train), np.float32)))
    held = dict(zip(hold["user_id"], hold["item_id"]))
    users = train["user_id"].unique()
    known = {u_: set(train[train["user_id"] == u_]["item_id"]) for u_ in users}
    rec = m.recommend_batch(
        users.tolist(), amount=10,
        items_known_map={u_: list(v) for u_, v in known.items()})
    hits = sum(held[u_] in set(rec[rec["user_id"] == u_]["item_id"])
               for u_ in users)
    pop = train["item_id"].value_counts().index.to_numpy()
    pop_hits = sum(
        held[u_] in set([it for it in pop if it not in known[u_]][:10])
        for u_ in users)
    assert hits > 2 * pop_hits, (hits, pop_hits)


def test_ease_weights_multi_matches_single():
    X, y, u, i = _toy(seed=7, n_items=30)
    m = EASE(reg=5.0).fit(X, y)
    w = np.ones(len(u), np.float32)
    ud = m.user_vocab.encode(X["user_id"].to_numpy())
    idn = m.item_vocab.encode(X["item_id"].to_numpy())
    G = ease_ops.item_gram(ud, idn, w, m.n_users, m.n_items)
    regs = [2.0, 10.0, 80.0]
    stack = np.asarray(ease_ops.ease_weights_multi(G, regs))
    for c, lam in enumerate(regs):
        single = np.asarray(ease_ops.ease_weights(G, lam))
        np.testing.assert_allclose(stack[c], single, atol=2e-5)


def test_grid_search_ease_selects_and_refits():
    from matrix_factorization_tpu.data.synthetic import clustered_interactions
    from matrix_factorization_tpu.models.grid_search import grid_search_ease

    X, y = clustered_interactions(n_users=250, n_items=200, n_clusters=5,
                                  per_user=14, seed=11)
    regs = (0.5, 20.0, 50_000.0)
    model, results = grid_search_ease(X, y, regs=regs, k=10, seed=3)
    assert isinstance(model, EASE)
    assert model.reg == results[0]["reg"]
    # results sorted best-first and cover every candidate
    assert [d["reg"] for d in results] != [] and len(results) == len(regs)
    hr = [d["hit_at_k"] for d in results]
    assert hr == sorted(hr, reverse=True)
    # the degenerate over-regularized candidate (B -> 0/noise) must not win
    assert model.reg != 50_000.0
    # refit covers ALL interactions (histories include every pair)
    assert int(model._indptr[-1]) == len(X)
    # the refit model serves
    uid = X["user_id"].iloc[0]
    rec = model.recommend(user=uid, amount=5)
    assert len(rec) == 5


def test_grid_search_ease_validation():
    from matrix_factorization_tpu.models.grid_search import grid_search_ease

    X, y, _, _ = _toy()
    with pytest.raises(ValueError):
        grid_search_ease(X, y, regs=())
    with pytest.raises(ValueError):
        grid_search_ease(X, y, holdout_per_user=0)


def test_dp_gram_matches_single_device():
    from matrix_factorization_tpu.parallel.mesh import make_mesh

    X, y, u, i = _toy(n_users=60, n_items=40, n=800, seed=12)
    m = EASE(reg=5.0).fit(X, y)
    w = np.ones(len(u), np.float32)
    ud = m.user_vocab.encode(X["user_id"].to_numpy())
    idn = m.item_vocab.encode(X["item_id"].to_numpy())
    G1 = np.asarray(ease_ops.item_gram(ud, idn, w, m.n_users, m.n_items))
    mesh = make_mesh(n_data=8, n_model=1)
    G8 = np.asarray(ease_ops.dp_item_gram(ud, idn, w, m.n_users,
                                          m.n_items, mesh))
    # co-occurrence counts are integers: the psum'd partials are exact
    np.testing.assert_array_equal(G1, G8)


def test_mesh_fit_matches_single_device():
    """EASE(mesh=...): dp gram + GSPMD-sharded Schur inverse must score
    the catalog like the single-device closed form."""
    from matrix_factorization_tpu.parallel.mesh import make_mesh

    X, y, _, _ = _toy(n_users=80, n_items=96, n=1200, seed=13)
    m1 = EASE(reg=10.0).fit(X, y)
    mesh = make_mesh(n_data=4, n_model=2)
    m8 = EASE(reg=10.0, mesh=mesh).fit(X, y)
    s1 = m1._catalog_scores_batch(np.arange(16))
    s8 = m8._catalog_scores_batch(np.arange(16))
    np.testing.assert_allclose(s8, s1, atol=5e-4)
    # lifecycle on the sharded-B model
    uid = X["user_id"].iloc[0]
    rec = m8.recommend(user=uid, amount=5)
    assert len(rec) == 5
    # checkpointable: np.asarray gathers the sharded B
    assert np.isfinite(np.asarray(m8._params.item_weights)).all()


def test_newton_schulz_inverse_matches_schur():
    """The >32k-capacity Newton–Schulz path (VERDICT r3 #6) must produce
    the same EASE weights as the Schur recursion."""
    from matrix_factorization_tpu.ops import ease as ease_ops
    from matrix_factorization_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    n_u, n_i = 200, 96
    u = rng.integers(0, n_u, 3000).astype(np.int64)
    i = rng.integers(0, n_i, 3000).astype(np.int64)
    w = np.ones(len(u), np.float32)
    mesh = make_mesh(n_data=8)
    G = ease_ops.dp_item_gram(u, i, w, n_u, n_i, mesh)
    B_schur = np.asarray(ease_ops.ease_weights_sharded(
        G, 25.0, mesh, inverse="schur"))
    B_ns = np.asarray(ease_ops.ease_weights_sharded(
        G, 25.0, mesh, inverse="ns"))
    np.testing.assert_allclose(B_ns, B_schur, atol=5e-4)
    assert np.abs(np.diagonal(B_ns)).max() == 0.0

    with pytest.raises(ValueError, match="inverse"):
        ease_ops.ease_weights_sharded(G, 25.0, mesh, inverse="bogus")


def test_ns_memory_scales_unlike_schur():
    """Memory-analysis evidence for the capacity tiers: at one compile
    size, the Newton–Schulz program's per-device temporaries undercut
    the Schur recursion's (whose concat chains replicate to ~full-matrix
    per device), and a 64k-item NS program lowers with per-device
    temporaries that fit a 16GB v5e."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from matrix_factorization_tpu.ops.spd import spd_inverse_scaled
    from matrix_factorization_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=8)
    shard = NamedSharding(mesh, P("data", None))

    def temp_bytes(fn, ip):
        f = jax.jit(fn, in_shardings=(shard,), out_shardings=shard)
        comp = f.lower(
            jax.ShapeDtypeStruct((ip, ip), np.float32)).compile()
        return comp.memory_analysis().temp_size_in_bytes

    ip = 4096
    full = ip * ip * 4
    t_schur = temp_bytes(
        lambda a: spd_inverse_scaled(a, leaf="xla", spec=shard), ip)
    assert t_schur > full          # the recursion's replication problem

    # the load-bearing bound: ONE shard_map NS step's per-device temp
    # at 64k items stays under a 16GB v5e after the ~3 x 2GB row-shard
    # state (the in-jit GSPMD form measured 21.5GB/device here — the
    # hoisted full-operand all-gather spd_inverse_ns_sharded avoids)
    from matrix_factorization_tpu.ops.spd import (
        _get_ns_fns, spd_inverse_ns_sharded)

    rng2 = np.random.default_rng(0)
    M = rng2.normal(0, 1, (64, 256)).astype(np.float32)
    A_small = M.T @ M + 10.0 * np.eye(256, dtype=np.float32)
    import jax.numpy as jnp

    Pv = np.asarray(spd_inverse_ns_sharded(jnp.asarray(A_small), mesh,
                                           col_block=64))
    resid = np.abs(Pv @ A_small - np.eye(256)).max()
    assert resid < 1e-3, resid

    dp64 = 65536
    step64, _, _ = _get_ns_fns(mesh, dp64, 1024)
    sh = jax.ShapeDtypeStruct((dp64, dp64), np.float32)
    ma = step64.lower(sh, sh).compile().memory_analysis()
    per_dev_state = dp64 * dp64 * 4 // 8  # one row-shard: 2GB
    # inputs (As, P) + output (Pn) are 3 row-shards = 6GB; the step's
    # temporaries (scan double-buffers + slab + eye) measured ~4.6GB —
    # total ~10.6GB/device, inside a 16GB v5e.  The in-jit GSPMD form
    # measured 21.5GB of TEMP alone (full-operand all-gather).
    total = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
             + ma.output_size_in_bytes)
    assert ma.temp_size_in_bytes < 3 * per_dev_state
    assert total < 15 * 2**30, total


def test_ease_guard_tiers():
    """The capacity guard scales with the mesh: 64k passes the bound
    check on an 8-device mesh, is rejected single-chip."""
    from matrix_factorization_tpu.ops import ease as ease_ops

    with pytest.raises(ValueError, match="O\\(items"):
        ease_ops.check_item_budget(65536, item_limit=16384)
    ease_ops.check_item_budget(65536, item_limit=65536)  # no raise
