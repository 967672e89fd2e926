"""Equivalence tests for the fused Pallas SGD step (``ops/pallas_sgd.py``).

The fused kernel must be the SAME minibatch update as the XLA einsum
path (``segment_sgd._minibatch_update``) up to float regrouping: every
row reads the pre-step tables, deltas sum.  Verified here in interpret
mode on the CPU suite (``FUSED_STEP='interpret'`` forces the fused
branch on regardless of backend); the real-TPU lowering is exercised by
``benchmarks/run_configs.py`` and the verify drive.

Reference counterpart of the semantics under test: the per-rating
updates in ``kernels.py:108-327``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops import segment_sgd as sgd
from matrix_factorization_tpu.ops import pallas_sgd


def _data(n=1500, n_users=200, n_items=120, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    return u, i, r


def _pack(u, i, r, bs=256, order="user"):
    return sgd.pack_ratings(u, i, r, bs, shuffle_seed=3, order=order,
                            aggregate=True, agg_min_gain=-1.0)


def _train(p0, data, cfg, allow_fused, epochs=2, lr=0.05):
    fn = jax.jit(
        lambda p, d: sgd.sgd_train(p, d, jax.random.PRNGKey(1), cfg,
                                   epochs, lr, allow_fused=allow_fused))
    out, hist = fn(p0, data)
    return out, np.asarray(hist)


@pytest.mark.parametrize("kernel", ["linear", "sigmoid", "rbf"])
def test_fused_step_matches_einsum_path(kernel, monkeypatch):
    monkeypatch.setattr(sgd, "FUSED_STEP", "interpret")
    # f32 deltas for the exact comparison: the CPU einsum path keeps
    # f32 operands, unlike TPU's bf16 default (see the bf16 test below)
    monkeypatch.setattr(sgd, "FUSED_SEC_BF16", False)
    u, i, r = _data()
    n_users, n_items = 200, 120
    cfg = SGDConfig(kernel=kernel, n_factors=12, reg=0.02, shuffle="none",
                    compute_epoch_rmse=True, min_rating=1, max_rating=5)
    data = _pack(u, i, r)
    assert data.agg_prim[1] > 0
    p0 = sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg, 3.0)
    assert sgd._fused_step_enabled(cfg, data)
    a, ha = _train(p0, data, cfg, allow_fused=True)
    b, hb = _train(p0, data, cfg, allow_fused=False)
    np.testing.assert_allclose(np.asarray(a.user_features),
                               np.asarray(b.user_features), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a.item_features),
                               np.asarray(b.item_features), atol=2e-5)
    np.testing.assert_allclose(ha, hb, rtol=1e-5)


def test_fused_sec_bf16_deltas_close(monkeypatch):
    """bf16 secondary deltas (the TPU default — its tile einsum reads
    bf16 operands either way) must track the f32-delta trajectory to
    bf16-rounding accumulation scale."""
    monkeypatch.setattr(sgd, "FUSED_STEP", "interpret")
    u, i, r = _data()
    cfg = SGDConfig(kernel="linear", n_factors=12, reg=0.02,
                    shuffle="none", compute_epoch_rmse=True,
                    min_rating=1, max_rating=5)
    data = _pack(u, i, r)
    assert data.agg_sec[1] > 0  # the bf16 emission rides the tile path
    p0 = sgd.init_params(jax.random.PRNGKey(0), 200, 120, cfg, 3.0)
    monkeypatch.setattr(sgd, "FUSED_SEC_BF16", True)
    a, ha = _train(p0, data, cfg, allow_fused=True)
    monkeypatch.setattr(sgd, "FUSED_SEC_BF16", False)
    b, hb = _train(p0, data, cfg, allow_fused=True)
    np.testing.assert_allclose(np.asarray(a.item_features),
                               np.asarray(b.item_features), atol=3e-3)
    np.testing.assert_allclose(np.asarray(a.user_features),
                               np.asarray(b.user_features), atol=3e-3)
    np.testing.assert_allclose(ha, hb, rtol=1e-2)


def test_fused_step_item_primary(monkeypatch):
    """order='item' exercises the item-primary orientation (the stash
    rides in the USER rows there)."""
    monkeypatch.setattr(sgd, "FUSED_STEP", "interpret")
    monkeypatch.setattr(sgd, "FUSED_SEC_BF16", False)
    u, i, r = _data(n_items=150)
    cfg = SGDConfig(kernel="linear", n_factors=12, reg=0.02,
                    shuffle="none", compute_epoch_rmse=False)
    data = _pack(u, i, r, order="item")
    assert data.primary == "item" and data.agg_prim[1] > 0
    p0 = sgd.init_params(jax.random.PRNGKey(0), 200, 150, cfg, 3.0)
    a, _ = _train(p0, data, cfg, allow_fused=True, epochs=1)
    b, _ = _train(p0, data, cfg, allow_fused=False, epochs=1)
    np.testing.assert_allclose(np.asarray(a.item_features),
                               np.asarray(b.item_features), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.user_features),
                               np.asarray(b.user_features), atol=1e-5)


def test_fused_step_batch_shuffle_and_padding(monkeypatch):
    """Batch-order shuffle plus weight-0 pad rows (n not a multiple of
    bs) must not perturb fused-vs-einsum agreement."""
    monkeypatch.setattr(sgd, "FUSED_STEP", "interpret")
    monkeypatch.setattr(sgd, "FUSED_SEC_BF16", False)
    u, i, r = _data(n=1777)
    cfg = SGDConfig(kernel="sigmoid", n_factors=12, reg=0.02,
                    shuffle="batch", compute_epoch_rmse=True,
                    min_rating=1, max_rating=5)
    data = _pack(u, i, r)
    p0 = sgd.init_params(jax.random.PRNGKey(0), 200, 120, cfg, 3.0)
    a, ha = _train(p0, data, cfg, allow_fused=True)
    b, hb = _train(p0, data, cfg, allow_fused=False)
    np.testing.assert_allclose(np.asarray(a.user_features),
                               np.asarray(b.user_features), atol=2e-5)
    np.testing.assert_allclose(ha, hb, rtol=1e-5)


def test_dp_tile_step_fused_matches_unfused(monkeypatch):
    """The dp tiled trainer's fused branch (``_tile_step_acc``) must be
    the same per-step update as its einsum branch.  Tested on the step
    function directly: the mesh plumbing (windowing, psum flushes) is
    byte-identical between the branches, and interpret-mode Pallas
    cannot run under shard_map's vma checking in this jax version (the
    interpreter's own block slicing mixes varying and unvaried avals).
    The on-mesh activation is exercised on real TPU via the dp bench."""
    from matrix_factorization_tpu.parallel import distributed as dist

    monkeypatch.setattr(sgd, "FUSED_SEC_BF16", False)
    monkeypatch.setattr(sgd, "FUSED_STEP", "interpret")
    rng = np.random.default_rng(5)
    n_users, n_items, n = 256, 160, 4000
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    cfg = SGDConfig(kernel="sigmoid", n_factors=8, lr=0.02, reg=0.01,
                    batch_size=256, shuffle="none",
                    compute_epoch_rmse=False, min_rating=1, max_rating=5)
    params = sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg,
                             float(r.mean()))
    data = sgd.pack_ratings(u, i, r, cfg.batch_size, shuffle_seed=0,
                            order="user", agg_min_gain=-1.0)
    assert data.agg_prim[1] > 0 and data.agg_sec[1] > 0
    xs, agg_prim, agg_sec, expand_prim = sgd.epoch_xs(data, cfg)
    b = {k: v[0] for k, v in xs.items()}
    P0 = params.user_features
    Q0 = params.item_features
    dQ0 = jnp.zeros_like(Q0)

    def run(use_fused):
        step = jax.jit(lambda c: dist._tile_step_acc(
            c, b, Q0, params.global_mean, cfg, cfg.lr, agg_prim,
            agg_sec, data.primary, expand_prim, use_fused=use_fused))
        return step((P0, dQ0))

    Pf, dQf = run(True)
    Pe, dQe = run(False)
    np.testing.assert_allclose(np.asarray(Pf), np.asarray(Pe), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dQf), np.asarray(dQe),
                               atol=1e-6)


def test_fused_gate_conditions():
    """The fused branch must stay off when its preconditions fail."""
    u, i, r = _data()
    cfg = SGDConfig(kernel="linear", n_factors=12)
    data = _pack(u, i, r)
    p0 = sgd.init_params(jax.random.PRNGKey(0), 200, 120, cfg, 3.0)
    # frozen side -> off (the kernel always writes both sides)
    frozen = SGDConfig(kernel="linear", n_factors=12,
                       update_item_params=False)
    assert not sgd._fused_step_enabled(frozen, data)
    # full shuffle -> off (scatter path, no tile metadata at trace time)
    full = SGDConfig(kernel="linear", n_factors=12, shuffle="full")
    assert not sgd._fused_step_enabled(full, data)
    # no tile metadata -> off
    plain = sgd.pack_ratings(u, i, r, 256, shuffle_seed=3, order="user",
                             aggregate=False)
    assert not sgd._fused_step_enabled(cfg, plain)
    # no spare stash lanes -> off (k=126 fills all 128 columns)
    tight = SGDConfig(kernel="linear", n_factors=126)
    assert not pallas_sgd.has_stash_room(tight)
    assert not sgd._fused_step_enabled(tight, data)
    # ample lanes at the shipped shapes
    for k in (64, 100, 200):
        assert pallas_sgd.has_stash_room(SGDConfig(n_factors=k))
    # on real backends, small batches stay on the einsum path (the
    # kernel's per-batch dispatch loses below FUSED_MIN_BATCH) while
    # large ones ride the kernel
    monkeypatch = pytest.MonkeyPatch()
    try:
        monkeypatch.setattr(sgd.jax, "default_backend", lambda: "tpu")
        auto_cfg = SGDConfig(kernel="linear", n_factors=12)
        # the gate reads the PACK's batch width (256 here), not
        # cfg.batch_size — small packs stay on the einsum path
        assert data.user_ids.shape[1] < sgd.FUSED_MIN_BATCH
        assert not sgd._fused_step_enabled(auto_cfg, data)
        wide = jax.tree.map(lambda a: a, data)
        wide = wide.replace(
            user_ids=jnp.zeros((1, sgd.FUSED_MIN_BATCH), jnp.int32),
            agg_prim=data.agg_prim)
        assert sgd._fused_step_enabled(auto_cfg, wide)
    finally:
        monkeypatch.undo()
