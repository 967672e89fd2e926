"""Kernel forward/gradient math vs a float64 numpy oracle implementing the
reference's formulas (kernels.py:21-105 forwards, :108-327 gradients,
including its omission of the outer `c` factor in sigmoid/rbf derivs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from matrix_factorization_tpu.ops import kernels as K


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


@pytest.fixture
def batch(rng):
    B, k = 17, 9
    return (
        rng.normal(0, 0.5, B),  # bu
        rng.normal(0, 0.5, B),  # bi
        rng.normal(0, 0.4, (B, k)),  # pu
        rng.normal(0, 0.4, (B, k)),  # qi
    )


def test_linear_forward(batch):
    bu, bi, pu, qi = batch
    got = K.forward("linear", 3.1, jnp.asarray(bu), jnp.asarray(bi),
                    jnp.asarray(pu), jnp.asarray(qi), 0.1, 0.0, 5.0)
    want = 3.1 + bu + bi + np.einsum("bk,bk->b", pu, qi)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_sigmoid_forward(batch):
    bu, bi, pu, qi = batch
    got = K.forward("sigmoid", 3.1, jnp.asarray(bu), jnp.asarray(bi),
                    jnp.asarray(pu), jnp.asarray(qi), 0.1, 1.0, 4.0)
    x = 3.1 + bu + bi + np.einsum("bk,bk->b", pu, qi)
    want = 1.0 + 4.0 * _sigmoid(x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_rbf_forward_has_no_bias_terms(batch):
    bu, bi, pu, qi = batch
    got = K.forward("rbf", 3.1, jnp.asarray(bu), jnp.asarray(bi),
                    jnp.asarray(pu), jnp.asarray(qi), 0.07, 1.0, 4.0)
    power = -0.07 * np.sum((pu - qi) ** 2, axis=1)
    want = 1.0 + 4.0 * np.exp(power)  # biases and mean deliberately absent
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


@pytest.mark.parametrize("kernel", ["linear", "sigmoid", "rbf"])
def test_grads_match_reference_convention(batch, kernel):
    bu, bi, pu, qi = batch
    mu, gamma, a, c = 3.1, 0.07, 1.0, 4.0
    pred, g = K.forward_and_grads(
        kernel, mu, jnp.asarray(bu), jnp.asarray(bi),
        jnp.asarray(pu), jnp.asarray(qi), gamma, a, c,
    )
    x = mu + bu + bi + np.einsum("bk,bk->b", pu, qi)
    if kernel == "linear":
        want_bias = np.ones_like(bu)
        want_dpu, want_dqi = qi, pu
    elif kernel == "sigmoid":
        s = _sigmoid(x)
        base = s * s * np.exp(-x)  # reference kernels.py:236
        want_bias = base
        want_dpu = qi * base[:, None]
        want_dqi = pu * base[:, None]
    else:
        power = -gamma * np.sum((pu - qi) ** 2, axis=1)
        base = 2.0 * gamma * np.exp(power)  # reference kernels.py:310
        want_bias = np.zeros_like(bu)
        want_dpu = (qi - pu) * base[:, None]
        want_dqi = (pu - qi) * base[:, None]
    np.testing.assert_allclose(np.asarray(g.d_bias), want_bias, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.d_pu), want_dpu, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.d_qi), want_dqi, rtol=1e-4, atol=1e-6)


def test_unknown_kernel_raises():
    with pytest.raises(ValueError):
        K.forward("poly", 0, jnp.zeros(1), jnp.zeros(1),
                  jnp.zeros((1, 2)), jnp.zeros((1, 2)), 0.1, 0, 5)


def test_pack_ratings_wire_format_lossless():
    """Narrow wire dtypes (uint16 ids, int8 half-step ratings, uint8
    weights) must round-trip losslessly; non-representable values ship
    full width (ROADMAP r2 transfer lever)."""
    import numpy as np
    import jax.numpy as jnp
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    # half-step ratings -> int8 on the wire, exact f32 back
    r = np.asarray([0.5, 5.0, 3.5, 2.0], np.float32)
    out = sgd._ship_ratings(r)
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out), r)
    # non-half-step ratings stay f32 (lossless always wins over bytes)
    r2 = np.asarray([0.51, 3.14], np.float32)
    np.testing.assert_array_equal(np.asarray(sgd._ship_ratings(r2)), r2)

    ids_small = np.asarray([0, 65535, 7], np.int32)
    out = sgd._ship_ids(ids_small)
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), ids_small)
    ids_big = np.asarray([0, 70000], np.int32)
    np.testing.assert_array_equal(np.asarray(sgd._ship_ids(ids_big)), ids_big)

    w = np.asarray([1.0, 0.0, 1.0], np.float32)
    outw = sgd._ship_weights(w)
    assert outw.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(outw), w)

    # end to end: packed batches decode to the same id/rating content
    rng = np.random.default_rng(0)
    u = rng.integers(0, 500, 1000).astype(np.int32)
    i = rng.integers(0, 300, 1000).astype(np.int32)
    rr = (rng.integers(1, 11, 1000) / 2).astype(np.float32)
    data = sgd.pack_ratings(u, i, rr, 256)
    got = {}
    for name, arr in (("u", data.user_ids), ("i", data.item_ids),
                      ("r", data.ratings)):
        flat = np.asarray(arr).ravel()
        got[name] = flat[np.asarray(data.weights).ravel() > 0]
    # multiset equality (pack shuffles/sorts)
    assert sorted(zip(got["u"].tolist(), got["i"].tolist(),
                      got["r"].tolist())) == sorted(
        zip(u.tolist(), i.tolist(), rr.tolist()))
