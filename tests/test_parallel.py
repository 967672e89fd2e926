"""Multi-device tests on the 8-device virtual CPU mesh: data-parallel SGD
equivalence vs the single-device step, sharded fit convergence, and the
distributed top-k merge."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops import segment_sgd as sgd
from matrix_factorization_tpu.ops.scoring import score_catalog
from matrix_factorization_tpu.parallel import distributed as dist
from matrix_factorization_tpu.parallel import topk as ptopk
from matrix_factorization_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh


@pytest.fixture(scope="module")
def ratings():
    rng = np.random.default_rng(0)
    n_users, n_items, n = 30, 20, 400
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    return u, i, r, n_users, n_items


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_one_step_matches_single_device(ratings):
    """One global synchronous step: sharded (4-device) result must equal the
    single-device scatter-add step over the concatenated batch."""
    u, i, r, n_users, n_items = ratings
    mesh = make_mesh(n_data=4, n_model=1)
    ucap = sgd.round_up(n_users, 8 * 4)

    # find per-device pad, then use one batch per device
    _, _, _, _, n_pad = dist.shard_ratings_by_user(u, i, r, ucap, 4, 1)
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.03, reg=0.01,
                    batch_size=n_pad, compute_epoch_rmse=True)

    key = jax.random.PRNGKey(1)
    params0 = sgd.init_params(key, n_users, n_items, cfg, float(r.mean()),
                              user_capacity=ucap)

    # single-device: all ratings in ONE batch (order irrelevant: summed)
    w = jnp.ones_like(jnp.asarray(r))
    expected = sgd.sgd_minibatch_step(
        params0, jnp.asarray(u), jnp.asarray(i), jnp.asarray(r), w, cfg, cfg.lr
    )

    # distributed
    su, si, sr, sw, n_pad2 = dist.shard_ratings_by_user(u, i, r, ucap, 4, n_pad)
    assert n_pad2 == n_pad
    shard = NamedSharding(mesh, P(DATA_AXIS))
    data = dist.ShardedRatings(
        jax.device_put(su, shard), jax.device_put(si, shard),
        jax.device_put(sr, shard), jax.device_put(sw, shard),
    )
    placed = dist.place_params(params0, mesh)
    got, hist = jax.jit(
        lambda p, d, k: dist.dp_sgd_train(p, d, k, cfg, 1, cfg.lr, mesh, len(r))
    )(placed, data, jax.random.PRNGKey(2))

    np.testing.assert_allclose(
        np.asarray(got.user_features), np.asarray(expected.user_features),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.item_features), np.asarray(expected.item_features),
        atol=1e-5,
    )
    # epoch RMSE matches a host-side recomputation on the updated params
    # (biases ride inside the extended-row dot)
    pred = float(expected.global_mean) + np.einsum(
        "nk,nk->n",
        np.asarray(expected.user_features)[u],
        np.asarray(expected.item_features)[i],
    )
    want_rmse = np.sqrt(np.mean((pred - r) ** 2))
    np.testing.assert_allclose(float(hist[0]), want_rmse, rtol=1e-5)


def test_dp_fit_converges(ratings):
    u, i, r, n_users, n_items = ratings
    mesh = make_mesh(n_data=8, n_model=1)
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.03, reg=0.01,
                    batch_size=32)
    params, hist = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=15,
                               lr=cfg.lr, mesh=mesh)
    assert hist[-1] < hist[0]


def _tiled_pack_and_place(u, i, r, cfg, ucap, n_dev, mesh, order="user",
                          seed=0):
    data = sgd.pack_ratings(
        u, i, r, cfg.batch_size, shuffle_seed=seed, order=order,
        n_dev=n_dev, users_per_dev=ucap // n_dev, agg_min_gain=-1.0,
    )
    from matrix_factorization_tpu.parallel.mesh import data_axes_of

    shard = NamedSharding(mesh, P(data_axes_of(mesh)))
    return jax.tree.map(lambda a: jax.device_put(a, shard), data)


def test_dp_tiled_one_device_matches_single_device():
    """dp_sgd_train_tiled on a 1-device mesh over the SAME pack must be
    the single-device tiled trainer up to float summation order (the
    delta-table + psum changes the add order on the item side)."""
    rng = np.random.default_rng(3)
    n_users, n_items, n = 96, 64, 2000
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    cfg = SGDConfig(kernel="sigmoid", n_factors=8, lr=0.02, reg=0.01,
                    batch_size=128, shuffle="none",
                    compute_epoch_rmse=True)
    params = sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg,
                             float(r.mean()), 0.0, 0.1)
    data = sgd.pack_ratings(u, i, r, cfg.batch_size, shuffle_seed=0,
                            order="user", agg_min_gain=-1.0)
    assert data.agg_prim[1] > 0
    p_ref, h_ref = jax.jit(lambda p, d, k: sgd.sgd_train(
        p, d, k, cfg, 3, cfg.lr))(params, data, jax.random.PRNGKey(1))

    mesh1 = make_mesh(n_data=1)
    d1 = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh1, P(DATA_AXIS))),
        data)
    p_dp, h_dp = jax.jit(lambda p, d, k: dist.dp_sgd_train_tiled(
        p, d, k, cfg, 3, cfg.lr, mesh1))(
            dist.place_params(params, mesh1), d1, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h_dp),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_ref.user_features),
                               np.asarray(p_dp.user_features), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_ref.item_features),
                               np.asarray(p_dp.item_features), atol=1e-6)


def test_dp_tiled_converges_and_multislice_matches_flat_mesh():
    """The tiled dp layout trains on the 8-device mesh (tiles engaged),
    tracks the flat dp trainer's convergence, and — like the flat
    trainer — a (2 slice x 4 data) DCN-major mesh runs the EXACT same
    math as a flat 8-device data mesh (the pack depends only on the
    total data-axis size)."""
    from matrix_factorization_tpu.parallel.mesh import make_multislice_mesh

    rng = np.random.default_rng(5)
    n_users, n_items, n = 512, 64, 8000
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.01, reg=0.01,
                    batch_size=128, compute_epoch_rmse=True)
    mesh = make_mesh(n_data=8, n_model=1)
    n_dev = 8
    ucap = sgd.round_up(n_users, 8 * n_dev)
    params = sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg,
                             float(r.mean()), 0.0, 0.1, user_capacity=ucap)
    data = _tiled_pack_and_place(u, i, r, cfg, ucap, n_dev, mesh)
    assert data.agg_prim[1] > 0 or data.agg_sec[1] > 0
    p8, h8 = jax.jit(lambda p, d, k: dist.dp_sgd_train_tiled(
        p, d, k, cfg, 12, 0.03, mesh))(
            dist.place_params(params, mesh), data, jax.random.PRNGKey(1))
    h8 = np.asarray(h8)
    assert h8[-1] < h8[0]

    _, h_flat = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=12,
                            lr=0.03, mesh=mesh, layout="flat")
    assert abs(h8[-1] - np.asarray(h_flat)[-1]) < 0.15

    # end-to-end entry + multislice equivalence
    p_t, h_t = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=5,
                           lr=0.03, mesh=mesh, layout="tiled",
                           pack_order="user")
    ms = make_multislice_mesh(n_slices=2, n_data=4, n_model=1)
    p_m, h_m = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=5,
                           lr=0.03, mesh=ms, layout="tiled",
                           pack_order="user")
    np.testing.assert_allclose(np.asarray(h_t), np.asarray(h_m), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_t.item_features),
                               np.asarray(p_m.item_features), atol=1e-5)

    # overlap variant: converges; bit-identical when each per-device
    # epoch is a single batch (pending deltas flush before any read)
    big = SGDConfig(kernel="linear", n_factors=8, lr=0.01, reg=0.01,
                    batch_size=2048, shuffle="none",
                    compute_epoch_rmse=True)
    d_big = _tiled_pack_and_place(u, i, r, big, ucap, n_dev, mesh)
    pb = sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, big,
                         float(r.mean()), 0.0, 0.1, user_capacity=ucap)
    pb = dist.place_params(pb, mesh)
    a, ha = jax.jit(lambda p, d, k: dist.dp_sgd_train_tiled(
        p, d, k, big, 4, 0.03, mesh))(pb, d_big, jax.random.PRNGKey(1))
    b, hb = jax.jit(lambda p, d, k: dist.dp_sgd_train_tiled(
        p, d, k, big, 4, 0.03, mesh, overlap_psum=True))(
            pb, d_big, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(hb))
    np.testing.assert_array_equal(np.asarray(a.item_features),
                                  np.asarray(b.item_features))
    np.testing.assert_array_equal(np.asarray(a.user_features),
                                  np.asarray(b.user_features))

    with pytest.raises(ValueError, match="layout"):
        dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=1, lr=0.03,
                    mesh=mesh, layout="bogus")


def test_2d_one_step_matches_single_device(ratings):
    """One global synchronous step on a 2x2 (data x model) mesh with BOTH
    tables sharded must equal the single-device step over the whole batch."""
    u, i, r, n_users, n_items = ratings
    mesh = make_mesh(n_data=2, n_model=2)
    ucap = sgd.round_up(n_users, 8 * 2)
    icap = sgd.round_up(n_items, 8 * 2)

    _, _, _, _, n_pad = dist.shard_ratings_2d(u, i, r, ucap, icap, 2, 2, 1)
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.03, reg=0.01,
                    batch_size=n_pad, compute_epoch_rmse=True)
    params0 = sgd.init_params(jax.random.PRNGKey(1), n_users, n_items, cfg,
                              float(r.mean()), user_capacity=ucap,
                              item_capacity=icap)

    w = jnp.ones_like(jnp.asarray(r))
    expected = sgd.sgd_minibatch_step(
        params0, jnp.asarray(u), jnp.asarray(i), jnp.asarray(r), w, cfg, cfg.lr
    )

    su, si, sr, sw, n_pad2 = dist.shard_ratings_2d(
        u, i, r, ucap, icap, 2, 2, n_pad)
    assert n_pad2 == n_pad
    shard = NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))
    data = dist.ShardedRatings(
        jax.device_put(su, shard), jax.device_put(si, shard),
        jax.device_put(sr, shard), jax.device_put(sw, shard),
    )
    placed = dist.place_params_2d(params0, mesh)
    # Q really is sharded: each addressable shard holds 1/n_model rows
    qshard = placed.item_features.addressable_shards[0].data
    assert qshard.shape[0] == icap // 2
    got, hist = jax.jit(
        lambda p, d, k: dist.dp_tp_sgd_train(p, d, k, cfg, 1, cfg.lr, mesh,
                                             len(r))
    )(placed, data, jax.random.PRNGKey(2))

    np.testing.assert_allclose(
        np.asarray(got.user_features), np.asarray(expected.user_features),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.item_features), np.asarray(expected.item_features),
        atol=1e-5,
    )
    pred = float(expected.global_mean) + np.einsum(
        "nk,nk->n",
        np.asarray(expected.user_features)[u],
        np.asarray(expected.item_features)[i],
    )
    want_rmse = np.sqrt(np.mean((pred - r) ** 2))
    np.testing.assert_allclose(float(hist[0]), want_rmse, rtol=1e-5)


def test_2d_fit_converges_and_matches_replicated_q(ratings):
    """dp_tp_fit (sharded Q) trains; with model=1 it must match dp_fit
    (replicated Q) batch-for-batch when shuffling is off."""
    u, i, r, n_users, n_items = ratings
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.03, reg=0.01,
                    batch_size=32, shuffle="none")
    mesh2d = make_mesh(n_data=4, n_model=2)
    params, hist = dist.dp_tp_fit(u, i, r, n_users, n_items, cfg, n_epochs=10,
                                  lr=cfg.lr, mesh=mesh2d)
    assert hist[-1] < hist[0]

    # degenerate model axis == the 1D data-parallel trainer
    mesh1d = make_mesh(n_data=4, n_model=1)
    p2, h2 = dist.dp_tp_fit(u, i, r, n_users, n_items, cfg, n_epochs=3,
                            lr=cfg.lr, mesh=mesh1d)
    p1, h1 = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=3,
                         lr=cfg.lr, mesh=mesh1d)
    np.testing.assert_allclose(h2, h1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p2.item_features),
                               np.asarray(p1.item_features), atol=1e-5)


def test_overlap_psum_exact_with_one_batch_epochs(ratings):
    """With one batch per device per epoch the deferred psum is flushed
    at the epoch boundary before anything reads it — overlap_psum must be
    BIT-identical to the synchronous schedule."""
    u, i, r, n_users, n_items = ratings
    n_dev = 4
    mesh = make_mesh(n_data=n_dev, n_model=1)
    ucap = sgd.round_up(n_users, 8 * n_dev)
    _, _, _, _, n_pad = dist.shard_ratings_by_user(u, i, r, ucap, n_dev, 1)
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.03, reg=0.01,
                    batch_size=n_pad, shuffle="none")
    p_sync, h_sync = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=4,
                                 lr=cfg.lr, mesh=mesh)
    p_ovl, h_ovl = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=4,
                               lr=cfg.lr, mesh=mesh, overlap_psum=True)
    np.testing.assert_array_equal(np.asarray(h_ovl), np.asarray(h_sync))
    np.testing.assert_array_equal(np.asarray(p_ovl.item_features),
                                  np.asarray(p_sync.item_features))
    np.testing.assert_array_equal(np.asarray(p_ovl.user_features),
                                  np.asarray(p_sync.user_features))


def test_overlap_psum_parity_and_determinism(ratings):
    """Multi-batch epochs: item updates land one step late, so the
    trajectory differs — but it must converge to the same neighborhood
    (final-RMSE parity) and stay bit-deterministic across runs."""
    u, i, r, n_users, n_items = ratings
    mesh = make_mesh(n_data=4, n_model=1)
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.03, reg=0.01,
                    batch_size=32, shuffle="none")
    _, h_sync = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=15,
                            lr=cfg.lr, mesh=mesh)
    p1, h1 = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=15,
                         lr=cfg.lr, mesh=mesh, overlap_psum=True)
    p2, h2 = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=15,
                         lr=cfg.lr, mesh=mesh, overlap_psum=True)
    assert h1[-1] < h1[0]
    assert abs(float(h1[-1]) - float(h_sync[-1])) < 5e-3
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(p1.item_features),
                                  np.asarray(p2.item_features))


def test_overlap_psum_2d(ratings):
    """2D mesh: both deferred all-reduces. One-batch epochs are exact vs
    the synchronous 2D trainer; multi-batch converges."""
    u, i, r, n_users, n_items = ratings
    mesh = make_mesh(n_data=2, n_model=2)
    ucap = sgd.round_up(n_users, 8 * 2)
    icap = sgd.round_up(n_items, 8 * 2)
    _, _, _, _, n_pad = dist.shard_ratings_2d(u, i, r, ucap, icap, 2, 2, 1)
    cfg1 = SGDConfig(kernel="linear", n_factors=8, lr=0.03, reg=0.01,
                     batch_size=n_pad, shuffle="none")
    p_s, h_s = dist.dp_tp_fit(u, i, r, n_users, n_items, cfg1, n_epochs=3,
                              lr=cfg1.lr, mesh=mesh)
    p_o, h_o = dist.dp_tp_fit(u, i, r, n_users, n_items, cfg1, n_epochs=3,
                              lr=cfg1.lr, mesh=mesh, overlap_psum=True)
    np.testing.assert_array_equal(np.asarray(h_o), np.asarray(h_s))
    np.testing.assert_array_equal(np.asarray(p_o.item_features),
                                  np.asarray(p_s.item_features))

    cfg2 = SGDConfig(kernel="linear", n_factors=8, lr=0.03, reg=0.01,
                     batch_size=32, shuffle="none")
    _, hist = dist.dp_tp_fit(u, i, r, n_users, n_items, cfg2, n_epochs=10,
                             lr=cfg2.lr, mesh=mesh, overlap_psum=True)
    assert hist[-1] < hist[0]


def test_overlap_psum_model_api_and_validation():
    """KernelMF(overlap_psum=True) trains through the mesh path and beats
    the mean; the flag is rejected without a mesh and with method='als'."""
    from matrix_factorization_tpu import KernelMF
    from matrix_factorization_tpu.data.synthetic import lowrank_ratings
    from matrix_factorization_tpu.utils.metrics import rmse as rmse_m

    with pytest.raises(ValueError, match="overlap_psum"):
        KernelMF(overlap_psum=True)
    with pytest.raises(ValueError, match="overlap_psum"):
        KernelMF(overlap_psum=True, method="als", kernel="linear",
                 mesh=make_mesh(n_data=8))

    X, y = lowrank_ratings(n_users=64, n_items=40, density=0.5, seed=29)
    m = KernelMF(n_factors=8, n_epochs=15, lr=0.03, reg=0.01, batch_size=64,
                 mesh=make_mesh(n_data=8), overlap_psum=True)
    m.fit(X, y)
    assert m.train_rmse[-1] < m.train_rmse[0]
    base = rmse_m(y, np.full(len(y), float(np.mean(y))))
    assert rmse_m(y, m.predict(X)) < base


def test_multislice_dp_matches_flat_dp(ratings):
    """A (2 slice x 2 data) mesh must train EXACTLY like a flat 4-device
    data mesh: the DCN axis only changes where collectives ride, not the
    math (SURVEY §5.8)."""
    from matrix_factorization_tpu.parallel.mesh import make_multislice_mesh

    u, i, r, n_users, n_items = ratings
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.03, reg=0.01,
                    batch_size=32, shuffle="none")
    ms = make_multislice_mesh(n_slices=2, n_data=2, n_model=1)
    p_ms, h_ms = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=5,
                             lr=cfg.lr, mesh=ms)
    flat = make_mesh(n_data=4, n_model=1)
    p_f, h_f = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=5,
                           lr=cfg.lr, mesh=flat)
    np.testing.assert_allclose(h_ms, h_f, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_ms.item_features),
                               np.asarray(p_f.item_features), atol=1e-5)
    assert h_ms[-1] < h_ms[0]


def test_multislice_2d_trains(ratings):
    """Full 3-axis (slice x data x model) mesh: sharded P AND Q with the
    DCN-major outer axis; Q shards replicated across slices."""
    from matrix_factorization_tpu.parallel.mesh import (
        DCN_AXIS, make_multislice_mesh,
    )

    u, i, r, n_users, n_items = ratings
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.03, reg=0.01,
                    batch_size=32)
    ms = make_multislice_mesh(n_slices=2, n_data=2, n_model=2)
    assert ms.shape[DCN_AXIS] == 2
    params, hist = dist.dp_tp_fit(u, i, r, n_users, n_items, cfg,
                                  n_epochs=10, lr=cfg.lr, mesh=ms)
    assert hist[-1] < hist[0]
    # Q is sharded over model only: each shard holds 1/2 the rows
    qshard = params.item_features.addressable_shards[0].data
    assert qshard.shape[0] == params.item_features.shape[0] // 2


def test_distributed_topk_matches_dense(ratings):
    u, i, r, n_users, n_items = ratings
    mesh = make_mesh(n_data=4, n_model=2)
    cfg = SGDConfig(kernel="linear", n_factors=8)
    kp = cfg.padded_factors
    rng = np.random.default_rng(3)
    icap = sgd.round_up(n_items, 8 * 8)
    # extended rows: factors, then [bias | const] columns
    Q = np.zeros((icap, kp), np.float32)
    Q[:n_items, :8] = rng.normal(0, 0.5, (n_items, 8))
    Q[:n_items, sgd.const_col(cfg, "item")] = 1.0
    Q[:n_items, sgd.bias_col(cfg, "item")] = rng.normal(0, 0.2, n_items)
    valid = np.zeros(icap, np.float32)
    valid[:n_items] = 1.0
    B = 6
    pu = np.zeros((B, kp), np.float32)
    pu[:, :8] = rng.normal(0, 0.5, (B, 8))
    pu[:, sgd.const_col(cfg, "user")] = 1.0
    pu[:, sgd.bias_col(cfg, "user")] = rng.normal(0, 0.2, B)
    mu = jnp.float32(3.3)

    vals, idx = jax.jit(
        lambda pu, Q, valid: ptopk.distributed_topk(
            pu, Q, mu, valid, k=5, cfg=cfg, mesh=mesh,
            axes=(DATA_AXIS, MODEL_AXIS),
        )
    )(jnp.asarray(pu), jnp.asarray(Q), jnp.asarray(valid))

    dense = np.asarray(
        score_catalog(cfg, mu, jnp.asarray(pu), jnp.asarray(Q[:n_items]))
    )
    want_idx = np.argsort(-dense, axis=1)[:, :5]
    want_vals = np.take_along_axis(dense, want_idx, axis=1)
    np.testing.assert_allclose(np.asarray(vals), want_vals, atol=1e-5)
    # indices may differ on exact ties; compare via scores
    got_scores = np.take_along_axis(dense, np.asarray(idx), axis=1)
    np.testing.assert_allclose(got_scores, want_vals, atol=1e-5)


def test_graft_entry_and_dryrun():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    ge = importlib.import_module("__graft_entry__")
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out).shape == (256,)
    ge.dryrun_multichip(8)
    ge.dryrun_multichip(4)


def test_graft_dryrun_self_provisions_when_short_on_devices():
    """Asking for more devices than the live backend has must re-exec on
    a virtual CPU mesh of the right size (the driver host has 1 TPU)."""
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    ge = importlib.import_module("__graft_entry__")
    assert len(jax.devices()) < 16
    ge.dryrun_multichip(16)  # completes via the subprocess path or raises


def test_kernelmf_with_mesh_fits_and_serves():
    """The model API trains data-parallel when given a mesh and serves
    from the gathered parameters."""
    from matrix_factorization_tpu import KernelMF
    from matrix_factorization_tpu.data.synthetic import lowrank_ratings
    from matrix_factorization_tpu.utils.metrics import rmse as rmse_m

    X, y = lowrank_ratings(n_users=64, n_items=40, density=0.5, seed=17)
    mesh = make_mesh(n_data=8)
    m = KernelMF(n_factors=8, n_epochs=15, lr=0.03, reg=0.01,
                 batch_size=64, mesh=mesh)
    m.fit(X, y)
    assert m.train_rmse[-1] < m.train_rmse[0]
    err = rmse_m(y, m.predict(X))
    base = rmse_m(y, np.full(len(y), float(np.mean(y))))
    assert err < base
    recs = m.recommend(user=X["user_id"].iloc[0], amount=5)
    assert len(recs) == 5


def test_kernelmf_keep_sharded_serves_from_resident_shards():
    """keep_sharded=True: Q stays model-sharded after a 2D fit, and
    recommend / recommend_batch route through the distributed top-k —
    results must match brute-force scoring of the gathered tables."""
    from matrix_factorization_tpu import KernelMF
    from matrix_factorization_tpu.data.synthetic import lowrank_ratings

    X, y = lowrank_ratings(n_users=64, n_items=40, density=0.5, seed=21)
    mesh = make_mesh(n_data=4, n_model=2)
    m = KernelMF(n_factors=8, n_epochs=10, lr=0.03, reg=0.01,
                 batch_size=64, mesh=mesh, keep_sharded=True)
    m.fit(X, y)
    assert m._topk_catalog is not None
    # Q resident sharded: each device holds a row shard, never the table
    shard_rows = m._params.item_features.addressable_shards[0].data.shape[0]
    assert shard_rows == m._params.item_features.shape[0] // 2

    # brute force on gathered copies
    P_all = np.asarray(m._params.user_features)
    Q_all = np.asarray(m._params.item_features)[: m.n_items]
    mu = float(np.asarray(m._params.global_mean))
    users = [X["user_id"].iloc[0], X["user_id"].iloc[1]]
    u_dense = m.user_vocab.encode(np.asarray(users, dtype=object))
    scores = mu + P_all[u_dense] @ Q_all.T  # linear kernel, bias folded

    out = m.recommend_batch(users, amount=5, bound_ratings=False)
    for row, user in enumerate(users):
        got = out[out["user_id"] == user]
        exp_order = np.argsort(-scores[row], kind="stable")[:5]
        exp_items = [m.item_vocab.raw_ids[j] for j in exp_order]
        assert list(got["item_id"]) == exp_items
        np.testing.assert_allclose(
            got["rating_pred"].to_numpy(), scores[row][exp_order], rtol=1e-5
        )

    # single-user recommend excludes known items and stays sorted
    known = set(X.loc[X["user_id"] == users[0], "item_id"])
    recs = m.recommend(user=users[0], amount=5, items_known=known)
    assert len(recs) == 5
    assert not set(recs["item_id"]) & known
    assert recs["rating_pred"].is_monotonic_decreasing

    # predict still works against resident-sharded tables
    preds = m.predict(X.iloc[:10])
    assert np.isfinite(np.asarray(preds)).all()


def test_keep_sharded_warm_start_rebuilds_catalog():
    """fit(warm_start=True) on a keep_sharded model trains on the
    single-device branch; the resident catalog must be rebuilt from the
    NEW item table, not keep serving the stale padded Q copy (ADVICE r2
    medium: checkpoint-resume via fit_resumable hits this path)."""
    from matrix_factorization_tpu import KernelMF
    from matrix_factorization_tpu.data.synthetic import lowrank_ratings

    X, y = lowrank_ratings(n_users=64, n_items=40, density=0.5, seed=23)
    mesh = make_mesh(n_data=4, n_model=2)
    m = KernelMF(n_factors=8, n_epochs=5, lr=0.03, reg=0.01,
                 batch_size=64, mesh=mesh, keep_sharded=True)
    m.fit(X, y)
    stale = m._topk_catalog
    assert stale is not None
    m.fit(X, y, n_epochs=5, warm_start=True)
    assert m._topk_catalog is not stale  # rebuilt, not the old copy

    # served scores must match brute force on the CURRENT tables
    P_all = np.asarray(m._params.user_features)
    Q_all = np.asarray(m._params.item_features)[: m.n_items]
    mu = float(np.asarray(m._params.global_mean))
    user = X["user_id"].iloc[0]
    ud = m.user_vocab.encode(np.asarray([user], dtype=object))[0]
    scores = mu + P_all[ud] @ Q_all.T
    recs = m.recommend(user=user, amount=5, bound_ratings=False)
    exp = np.argsort(-scores, kind="stable")[:5]
    assert list(recs["item_id"]) == [m.item_vocab.raw_ids[j] for j in exp]
    np.testing.assert_allclose(recs["rating_pred"].to_numpy(),
                               scores[exp], rtol=1e-5)


def test_keep_sharded_without_mesh_raises():
    from matrix_factorization_tpu import KernelMF
    import pytest

    with pytest.raises(ValueError, match="keep_sharded"):
        KernelMF(keep_sharded=True)


# ---------------------------------------------------------------------------
# psum_every: windowed item-delta accumulation (VERDICT r3 #1)
# ---------------------------------------------------------------------------


def _windowed_oracle(params0, cfg, su, si, sr, sw, ucap, n_dev, T, lr,
                     n_epochs):
    """Numpy reference for the windowed stale-read schedule of
    ``dp_sgd_train(psum_every=T)``: within each T-step window every
    device reads the item table as of the last flush, user rows update
    fresh (device-local), and the accumulated item deltas land in one
    sum at the window end.  Devices own disjoint user ranges, so
    simulating them sequentially inside a step is exact."""
    P = np.asarray(params0.user_features).copy()
    Q = np.asarray(params0.item_features).copy()
    mu = float(np.asarray(params0.global_mean))
    users_per = ucap // n_dev
    n_pad = len(su) // n_dev
    nb = n_pad // cfg.batch_size
    uu = su.reshape(n_dev, nb, cfg.batch_size)
    ii = si.reshape(n_dev, nb, cfg.batch_size)
    rr = sr.reshape(n_dev, nb, cfg.batch_size)
    ww = sw.reshape(n_dev, nb, cfg.batch_size)
    umask = sgd.update_mask(cfg, "user")
    imask = sgd.update_mask(cfg, "item")
    for _ in range(n_epochs):
        for w0 in range(0, nb, T):
            Qf = Q.copy()
            dQ = np.zeros_like(Q)
            for t in range(w0, w0 + T):
                for d in range(n_dev):
                    ug = uu[d, t] + d * users_per
                    pu = P[ug]
                    qi = Qf[ii[d, t]]
                    pred, d_pu, d_qi = sgd.ext_forward_and_rowgrads(
                        cfg, mu, jnp.asarray(pu), jnp.asarray(qi))
                    err = (np.asarray(pred) - rr[d, t]) * ww[d, t]
                    g = (err[:, None] * np.asarray(d_pu)
                         + (cfg.reg * ww[d, t])[:, None] * pu) * umask
                    np.add.at(P, ug, -lr * g)
                    g = (err[:, None] * np.asarray(d_qi)
                         + (cfg.reg * ww[d, t])[:, None] * qi) * imask
                    np.add.at(dQ, ii[d, t], -lr * g)
            Q = Q + dQ
    return P, Q


def test_psum_every_matches_numpy_oracle(ratings):
    """dp_sgd_train(psum_every=2) on a 4-device mesh must reproduce the
    windowed stale-read schedule exactly (numpy oracle)."""
    u, i, r, n_users, n_items = ratings
    n_dev, T = 4, 2
    mesh = make_mesh(n_data=n_dev, n_model=1)
    ucap = sgd.round_up(n_users, 8 * n_dev)
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.03, reg=0.01,
                    batch_size=8, shuffle="none")
    su, si, sr, sw, n_pad = dist.shard_ratings_by_user(
        u, i, r, ucap, n_dev, cfg.batch_size)
    nb = n_pad // cfg.batch_size
    assert nb % T == 0 and nb > T  # windows are real AND multiple per epoch
    params0 = sgd.init_params(jax.random.PRNGKey(4), n_users, n_items, cfg,
                              float(r.mean()), user_capacity=ucap)
    shard = NamedSharding(mesh, P(DATA_AXIS))
    data = dist.ShardedRatings(
        jax.device_put(su, shard), jax.device_put(si, shard),
        jax.device_put(sr, shard), jax.device_put(sw, shard))
    got, _ = jax.jit(lambda p, d, k: dist.dp_sgd_train(
        p, d, k, cfg, 2, cfg.lr, mesh, len(r), psum_every=T))(
            dist.place_params(params0, mesh), data, jax.random.PRNGKey(2))
    P_exp, Q_exp = _windowed_oracle(params0, cfg, su, si, sr, sw, ucap,
                                    n_dev, T, cfg.lr, n_epochs=2)
    np.testing.assert_allclose(np.asarray(got.user_features), P_exp,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.item_features), Q_exp,
                               atol=1e-5)


def test_psum_every_flat_parity_determinism_and_validation(ratings):
    """Windowed flat dp: converges to the synchronous neighborhood, is
    bit-deterministic, resolves 'auto'/'epoch', rejects non-divisors."""
    u, i, r, n_users, n_items = ratings
    mesh = make_mesh(n_data=4, n_model=1)
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.03, reg=0.01,
                    batch_size=8, shuffle="none")
    _, h_sync = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=15,
                            lr=cfg.lr, mesh=mesh)
    p1, h1 = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=15,
                         lr=cfg.lr, mesh=mesh, psum_every=2)
    p2, h2 = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=15,
                         lr=cfg.lr, mesh=mesh, psum_every=2)
    assert h1[-1] < h1[0]
    assert abs(float(h1[-1]) - float(h_sync[-1])) < 5e-3
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(p1.item_features),
                                  np.asarray(p2.item_features))

    # 'auto' and 'epoch' resolve; overlap composes with windows
    _, ha = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=10,
                        lr=cfg.lr, mesh=mesh, psum_every="auto",
                        overlap_psum=True)
    assert ha[-1] < ha[0]
    _, he = dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=10,
                        lr=cfg.lr, mesh=mesh, psum_every="epoch")
    assert he[-1] < he[0]

    with pytest.raises(ValueError, match="psum_every"):
        dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=1,
                    lr=cfg.lr, mesh=mesh, psum_every=4)  # nb=14: non-divisor
    with pytest.raises(ValueError, match="psum_every"):
        dist.dp_fit(u, i, r, n_users, n_items, cfg, n_epochs=1,
                    lr=cfg.lr, mesh=mesh, psum_every=0)


def test_psum_every_tiled_and_single_window_overlap_exact():
    """Tiled dp with psum_every: converges with windows engaged; with a
    single window per epoch the overlap schedule is bit-identical to the
    non-overlap one (flush happens before any read either way)."""
    rng = np.random.default_rng(7)
    n_users, n_items, n = 512, 64, 8000
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.01, reg=0.01,
                    batch_size=128, shuffle="none",
                    compute_epoch_rmse=True)
    mesh = make_mesh(n_data=8, n_model=1)
    n_dev = 8
    ucap = sgd.round_up(n_users, 8 * n_dev)
    params = sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg,
                             float(r.mean()), 0.0, 0.1, user_capacity=ucap)
    data = _tiled_pack_and_place(u, i, r, cfg, ucap, n_dev, mesh)
    placed = dist.place_params(params, mesh)
    nb_local = data.user_ids.shape[0] // n_dev
    assert nb_local % 3 == 0 and nb_local > 3

    _, h1 = jax.jit(lambda p, d, k: dist.dp_sgd_train_tiled(
        p, d, k, cfg, 10, 0.03, mesh))(placed, data, jax.random.PRNGKey(1))
    pw, hw = jax.jit(lambda p, d, k: dist.dp_sgd_train_tiled(
        p, d, k, cfg, 10, 0.03, mesh, psum_every=3))(
            placed, data, jax.random.PRNGKey(1))
    hw = np.asarray(hw)
    assert hw[-1] < hw[0]
    # T=3 staleness shifts the trajectory; bound the destination drift
    # (~0.007 observed on this 8k-rating toy — far looser than the real
    # budget at production batch sizes, see benchmarks/config3_multistep)
    assert abs(float(hw[-1]) - float(np.asarray(h1)[-1])) < 2e-2

    a, ha = jax.jit(lambda p, d, k: dist.dp_sgd_train_tiled(
        p, d, k, cfg, 4, 0.03, mesh, psum_every="epoch"))(
            placed, data, jax.random.PRNGKey(1))
    b, hb = jax.jit(lambda p, d, k: dist.dp_sgd_train_tiled(
        p, d, k, cfg, 4, 0.03, mesh, psum_every="epoch",
        overlap_psum=True))(placed, data, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(hb))
    np.testing.assert_array_equal(np.asarray(a.item_features),
                                  np.asarray(b.item_features))
    np.testing.assert_array_equal(np.asarray(a.user_features),
                                  np.asarray(b.user_features))


def test_psum_every_2d(ratings):
    """2D trainer with windowed accumulation: converges, and the
    single-window overlap schedule is exact vs non-overlap."""
    u, i, r, n_users, n_items = ratings
    mesh = make_mesh(n_data=2, n_model=2)
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.03, reg=0.01,
                    batch_size=32, shuffle="none")
    _, h_sync = dist.dp_tp_fit(u, i, r, n_users, n_items, cfg, n_epochs=10,
                               lr=cfg.lr, mesh=mesh)
    _, hw = dist.dp_tp_fit(u, i, r, n_users, n_items, cfg, n_epochs=10,
                           lr=cfg.lr, mesh=mesh, psum_every=2)
    assert hw[-1] < hw[0]
    assert abs(float(hw[-1]) - float(h_sync[-1])) < 5e-3

    p_a, h_a = dist.dp_tp_fit(u, i, r, n_users, n_items, cfg, n_epochs=4,
                              lr=cfg.lr, mesh=mesh, psum_every="epoch")
    p_b, h_b = dist.dp_tp_fit(u, i, r, n_users, n_items, cfg, n_epochs=4,
                              lr=cfg.lr, mesh=mesh, psum_every="epoch",
                              overlap_psum=True)
    np.testing.assert_array_equal(np.asarray(h_a), np.asarray(h_b))
    np.testing.assert_array_equal(np.asarray(p_a.item_features),
                                  np.asarray(p_b.item_features))


def test_psum_every_model_api_and_validation():
    """KernelMF(psum_every=...) trains through the mesh path; the flag is
    rejected without a mesh and with method='als'."""
    from matrix_factorization_tpu import KernelMF
    from matrix_factorization_tpu.data.synthetic import lowrank_ratings
    from matrix_factorization_tpu.utils.metrics import rmse as rmse_m

    with pytest.raises(ValueError, match="psum_every"):
        KernelMF(psum_every=4)
    with pytest.raises(ValueError, match="psum_every"):
        KernelMF(psum_every="auto", method="als", kernel="linear",
                 mesh=make_mesh(n_data=8))

    X, y = lowrank_ratings(n_users=64, n_items=40, density=0.5, seed=31)
    m = KernelMF(n_factors=8, n_epochs=15, lr=0.03, reg=0.01, batch_size=64,
                 mesh=make_mesh(n_data=8), psum_every="auto")
    m.fit(X, y)
    assert m.train_rmse[-1] < m.train_rmse[0]
    base = rmse_m(y, np.full(len(y), float(np.mean(y))))
    assert rmse_m(y, m.predict(X)) < base
