"""Full-catalog scoring as tiled MXU matmuls with fused kernel epilogues.

The reference's ``recommend`` scores candidates one pair at a time through
``_predict`` (``recommender_base.py:253-254`` -> per-pair numba forward).
On TPU the whole (users x items) score block is one matmul over the
bias-folded extended rows (see ``ops/segment_sgd.py``): the user/item
biases ride inside ``P_ext Q_ext^T``, so

* linear : mu + P_ext Q_ext^T
* sigmoid: a + c * sigma(mu + P_ext Q_ext^T)
* rbf    : a + c * exp(-gamma * (|p|^2 + |q|^2 - 2 P Q^T)) — extension
  columns are zero for rbf, so the expansion is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from matrix_factorization_tpu.core.config import SGDConfig


def score_catalog(
    cfg: SGDConfig,
    mu: jax.Array,
    pu: jax.Array,  # (B, Kp) extended user rows
    Q: jax.Array,  # (I, Kp) extended item rows
) -> jax.Array:
    """Scores of every item for each queried user: (B, I)."""
    dots = jnp.dot(pu, Q.T, preferred_element_type=jnp.float32)
    if cfg.kernel == "linear":
        return mu + dots
    if cfg.kernel == "sigmoid":
        return cfg.a + cfg.c * jax.nn.sigmoid(mu + dots)
    if cfg.kernel == "rbf":
        sq = (
            jnp.sum(pu * pu, axis=1)[:, None]
            + jnp.sum(Q * Q, axis=1)[None, :]
            - 2.0 * dots
        )
        return cfg.a + cfg.c * jnp.exp(-cfg.gamma * jnp.maximum(sq, 0.0))
    raise ValueError(f"unknown kernel {cfg.kernel!r}")
