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
