"""Batched kernel forwards and gradients for kernel matrix factorization.

The reference implements these as scalar Numba functions called once per
rating (``matrix_factorization/kernels.py:21-105`` forwards,
``:108-327`` SGD updates, with explicit per-factor loops).  Here every
function is **batched over a vector of (user, item) pairs** so the whole
mini-batch runs on the VPU/MXU in one shot; the per-factor loop becomes a
lane-dimension reduction.

Gradient parity note: the reference's sigmoid/rbf updates omit the kernel's
outer scale factor ``c`` from ``deriv_base`` (``kernels.py:236`` uses
``sigmoid**2 * exp(-x)`` = sigma'(x), and ``:310`` uses ``2*gamma*exp(power)``
— mathematically the true d(pred)/dx would carry an extra ``c``).  The
learning rate absorbs it, so to reproduce the reference's optimization
trajectory for the same hyper-parameters we keep the same convention.

Shapes: ``pu, qi`` are ``(B, K)`` gathered factor rows; ``bu, bi`` are
``(B,)`` biases; outputs are ``(B,)`` predictions and per-parameter
prediction-gradients.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

KERNELS = ("linear", "sigmoid", "rbf")


class KernelGrads(NamedTuple):
    """d(pred)/d(param) per pair; ``d_bias`` broadcasts to both biases."""

    d_bias: jax.Array  # (B,)
    d_pu: jax.Array  # (B, K)
    d_qi: jax.Array  # (B, K)


def _pair_dot(pu: jax.Array, qi: jax.Array) -> jax.Array:
    # Row-wise dot over the (padded) factor axis — a VPU multiply + lane
    # reduction.  f32 accumulation regardless of storage dtype.
    return jnp.sum(pu.astype(jnp.float32) * qi.astype(jnp.float32), axis=-1)


def linear_forward(mu, bu, bi, pu, qi) -> jax.Array:
    """mu + b_u + b_i + <p_u, q_i>   (reference kernels.py:21-45)."""
    return mu + bu + bi + _pair_dot(pu, qi)


def sigmoid_forward(mu, bu, bi, pu, qi, a, c) -> jax.Array:
    """a + c * sigma(linear_sum)   (reference kernels.py:48-78)."""
    x = mu + bu + bi + _pair_dot(pu, qi)
    return a + c * jax.nn.sigmoid(x)


def rbf_forward(pu, qi, gamma, a, c) -> jax.Array:
    """a + c * exp(-gamma * ||p-q||^2); no bias/mean terms
    (reference kernels.py:81-105)."""
    d = pu.astype(jnp.float32) - qi.astype(jnp.float32)
    power = -gamma * jnp.sum(d * d, axis=-1)
    return a + c * jnp.exp(power)


def forward(kernel: str, mu, bu, bi, pu, qi, gamma, a, c) -> jax.Array:
    if kernel == "linear":
        return linear_forward(mu, bu, bi, pu, qi)
    if kernel == "sigmoid":
        return sigmoid_forward(mu, bu, bi, pu, qi, a, c)
    if kernel == "rbf":
        return rbf_forward(pu, qi, gamma, a, c)
    raise ValueError(f"Kernel must be one of {KERNELS}, got {kernel!r}")


def forward_and_grads(
    kernel: str, mu, bu, bi, pu, qi, gamma, a, c
) -> Tuple[jax.Array, KernelGrads]:
    """Predictions plus reference-parity prediction gradients.

    linear  (kernels.py:108-180):  d_bias=1, d_pu=q_i, d_qi=p_u
    sigmoid (kernels.py:183-262):  deriv_base = sigma(x)(1-sigma(x))
                                   (== sigma^2 * e^-x, written stably)
    rbf     (kernels.py:265-327):  deriv_base = 2*gamma*exp(power);
                                   d_pu = deriv_base*(q-p); no bias grads
    """
    pu32 = pu.astype(jnp.float32)
    qi32 = qi.astype(jnp.float32)
    if kernel == "linear":
        pred = mu + bu + bi + jnp.sum(pu32 * qi32, axis=-1)
        ones = jnp.ones_like(pred)
        return pred, KernelGrads(ones, qi32, pu32)
    if kernel == "sigmoid":
        x = mu + bu + bi + jnp.sum(pu32 * qi32, axis=-1)
        sig = jax.nn.sigmoid(x)
        pred = a + c * sig
        deriv_base = sig * (1.0 - sig)
        return pred, KernelGrads(
            deriv_base, qi32 * deriv_base[:, None], pu32 * deriv_base[:, None]
        )
    if kernel == "rbf":
        d = pu32 - qi32
        power = -gamma * jnp.sum(d * d, axis=-1)
        e = jnp.exp(power)
        pred = a + c * e
        deriv_base = (2.0 * gamma) * e
        d_pu = -d * deriv_base[:, None]  # (q - p) * deriv_base
        return pred, KernelGrads(jnp.zeros_like(pred), d_pu, -d_pu)
    raise ValueError(f"Kernel must be one of {KERNELS}, got {kernel!r}")
