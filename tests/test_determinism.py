"""Determinism: the replacement for the reference's serial-execution
correctness story (SURVEY.md §5.2) — identical seeds produce identical
parameters, and intra-batch collisions resolve by order-invariant sums."""

import numpy as np
import jax
import jax.numpy as jnp

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops import segment_sgd as sgd


def _data(rng, n=500, nu=20, ni=15):
    return (
        rng.integers(0, nu, n).astype(np.int32),
        rng.integers(0, ni, n).astype(np.int32),
        rng.uniform(1, 5, n).astype(np.float32),
    )


def test_same_seed_bitwise_identical():
    rng = np.random.default_rng(0)
    u, i, r = _data(rng)
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.05, reg=0.01,
                    batch_size=64)

    def run():
        params = sgd.init_params(jax.random.PRNGKey(5), 20, 15, cfg, 3.0)
        data = sgd.pack_ratings(u, i, r, cfg.batch_size, shuffle_seed=0)
        out, hist = sgd.jit_sgd_train(cfg, 5)(params, data,
                                               jax.random.PRNGKey(9), cfg.lr)
        return np.asarray(out.user_features), np.asarray(hist)

    a_p, a_h = run()
    b_p, b_h = run()
    np.testing.assert_array_equal(a_p, b_p)
    np.testing.assert_array_equal(a_h, b_h)


def test_collision_updates_are_order_invariant():
    """All ratings hitting the SAME (user, item): the batched delta is the
    sum of per-example deltas, independent of row order within the batch."""
    cfg = SGDConfig(kernel="linear", n_factors=4, lr=0.1, reg=0.0,
                    batch_size=8)
    kp = cfg.padded_factors
    uf = jnp.zeros((8, kp)).at[:, :4].set(0.5)
    uf = uf.at[:, sgd.const_col(cfg, "user")].set(1.0)
    itf = jnp.zeros((8, kp)).at[:, :4].set(0.25)
    itf = itf.at[:, sgd.const_col(cfg, "item")].set(1.0)
    params = sgd.MFParams(uf, itf, jnp.float32(3.0))

    u = jnp.zeros(8, jnp.int32)
    i = jnp.zeros(8, jnp.int32)
    r = jnp.asarray(np.arange(8, dtype=np.float32) / 2 + 1)
    w = jnp.ones(8, jnp.float32)

    out1 = sgd.sgd_minibatch_step(params, u, i, r, w, cfg, cfg.lr)
    perm = np.array([3, 1, 7, 0, 5, 2, 6, 4])
    out2 = sgd.sgd_minibatch_step(params, u, i, r[perm], w, cfg, cfg.lr)
    np.testing.assert_allclose(
        np.asarray(out1.user_features), np.asarray(out2.user_features),
        atol=1e-6,
    )
