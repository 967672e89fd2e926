"""Full-catalog scoring as tiled MXU matmuls with fused kernel epilogues.

The reference's ``recommend`` scores candidates one pair at a time through
``_predict`` (``recommender_base.py:253-254`` -> per-pair numba forward).
On TPU the whole (users x items) score block is one matmul:

* linear : mu + b_u + b_i + P Q^T
* sigmoid: a + c * sigma(mu + b_u + b_i + P Q^T)
* rbf    : a + c * exp(-gamma * (|p|^2 + |q|^2 - 2 P Q^T))  — the squared
  distance expanded so the MXU does the heavy term.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def score_catalog(
    kernel: str,
    mu: jax.Array,
    bu: jax.Array,  # (B,)
    bi: jax.Array,  # (I,)
    pu: jax.Array,  # (B, K)
    Q: jax.Array,  # (I, K)
    gamma: float,
    a: float,
    c: float,
) -> jax.Array:
    """Scores of every item for each queried user: (B, I)."""
    dots = jnp.dot(pu, Q.T, preferred_element_type=jnp.float32)
    if kernel == "linear":
        return mu + bu[:, None] + bi[None, :] + dots
    if kernel == "sigmoid":
        return a + c * jax.nn.sigmoid(mu + bu[:, None] + bi[None, :] + dots)
    if kernel == "rbf":
        sq = (
            jnp.sum(pu * pu, axis=1)[:, None]
            + jnp.sum(Q * Q, axis=1)[None, :]
            - 2.0 * dots
        )
        return a + c * jnp.exp(-gamma * jnp.maximum(sq, 0.0))
    raise ValueError(f"unknown kernel {kernel!r}")
