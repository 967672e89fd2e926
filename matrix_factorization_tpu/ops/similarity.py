"""Similarity matrices and neighborhood scoring on the MXU.

Replaces the reference's sklearn ``cosine_similarity`` calls
(``collaborative_filtering.py:80-96`` user-user, ``:259-274`` item-item)
and its per-pair ``iterrows`` prediction loops (``:115``, ``:293``) with:

* one scatter to build the dense rating matrix,
* one normalized matmul for the full similarity matrix (MXU),
* a batched masked ``lax.top_k`` neighborhood predictor.

The reference's exact statistical conventions are preserved: missing
ratings are filled with 0, per-row/column means are taken **over the
filled matrix** (i.e. divided by the full axis length), and centering
subtracts that mean everywhere — see ``collaborative_filtering.py:62-96``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class CFState(NamedTuple):
    """Dense CF state: ratings matrix, similarity matrix, means."""

    ratings: jax.Array  # (U, I) 0-filled
    sim: jax.Array  # (U, U) or (I, I)
    means: jax.Array  # (U,) or (I,)
    global_mean: jax.Array  # scalar


def build_rating_matrix(
    u: jax.Array, i: jax.Array, r: jax.Array, n_users: int, n_items: int
) -> jax.Array:
    return jnp.zeros((n_users, n_items), jnp.float32).at[u, i].set(r)


def cosine_rows(m: jax.Array) -> jax.Array:
    """Row-wise cosine similarity: normalize then one MXU matmul."""
    norms = jnp.sqrt(jnp.sum(m * m, axis=1, keepdims=True))
    normed = m / jnp.maximum(norms, 1e-12)
    return jnp.dot(normed, normed.T, preferred_element_type=jnp.float32)


def user_cf_fit(u, i, r, n_users: int, n_items: int) -> CFState:
    R = build_rating_matrix(u, i, r, n_users, n_items)
    means = jnp.mean(R, axis=1)  # over the filled row, as the reference
    sim = cosine_rows(R - means[:, None])
    return CFState(R, sim, means, jnp.mean(r))


def item_cf_fit(u, i, r, n_users: int, n_items: int) -> CFState:
    R = build_rating_matrix(u, i, r, n_users, n_items)
    means = jnp.mean(R, axis=0)
    sim = cosine_rows((R - means[None, :]).T)
    return CFState(R, sim, means, jnp.mean(r))


def _neighborhood_predict(
    sims: jax.Array,  # (B, N) similarity of the query entity to all N
    ratings: jax.Array,  # (B, N) candidate ratings (0 = missing)
    cand_means: jax.Array,  # (B, N) means of the candidate entities
    self_mean: jax.Array,  # (B,) mean of the query-side entity
    self_idx: jax.Array,  # (B,) index to exclude (the query entity itself)
    n_neighbors: int,
) -> jax.Array:
    """pred = self_mean + sum(sim * (r - cand_mean)) / sum(|sim|) over the
    top-``n_neighbors`` raters by signed similarity
    (reference ``collaborative_filtering.py:173-188``)."""
    n = sims.shape[1]
    rated = ratings > 0
    col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    valid = rated & (col != self_idx[:, None])
    masked = jnp.where(valid, sims, -jnp.inf)

    k = min(n_neighbors, n)
    top_sims, top_idx = jax.lax.top_k(masked, k)
    picked = top_sims > -jnp.inf
    top_sims = jnp.where(picked, top_sims, 0.0)
    top_r = jnp.take_along_axis(ratings, top_idx, axis=1)
    top_m = jnp.take_along_axis(cand_means, top_idx, axis=1)

    num = jnp.sum(top_sims * (top_r - top_m) * picked, axis=1)
    den = jnp.sum(jnp.abs(top_sims) * picked, axis=1)
    has_rater = jnp.any(valid, axis=1)
    pred = self_mean + jnp.where(den > 0, num / jnp.maximum(den, 1e-12), 0.0)
    # no rater at all, or zero similarity mass -> entity mean fallback
    return jnp.where(has_rater & (den > 0), pred, self_mean)


def user_cf_predict(
    state: CFState,
    u: jax.Array,
    i: jax.Array,
    n_neighbors: int,
    min_rating: float,
    max_rating: float,
    bound_ratings: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Batched UserUserCF prediction; unknown ids (-1) get the global mean
    (reference ``collaborative_filtering.py:119-121``)."""
    uv, iv = u >= 0, i >= 0
    us, isafe = jnp.maximum(u, 0), jnp.maximum(i, 0)
    sims = state.sim[us]  # (B, U)
    ratings = state.ratings[:, isafe].T  # (B, U)
    n_users = state.ratings.shape[0]
    cand_means = jnp.broadcast_to(state.means[None, :], (u.shape[0], n_users))
    pred = _neighborhood_predict(
        sims, ratings, cand_means, state.means[us], us, n_neighbors
    )
    pred = jnp.where(uv & iv, pred, state.global_mean)
    if bound_ratings:
        pred = jnp.clip(pred, min_rating, max_rating)
    return pred, uv & iv


def item_cf_predict(
    state: CFState,
    u: jax.Array,
    i: jax.Array,
    n_neighbors: int,
    min_rating: float,
    max_rating: float,
    bound_ratings: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Batched ItemItemCF prediction (reference ``:311-368``)."""
    uv, iv = u >= 0, i >= 0
    us, isafe = jnp.maximum(u, 0), jnp.maximum(i, 0)
    sims = state.sim[isafe]  # (B, I)
    ratings = state.ratings[us]  # (B, I)
    n_items = state.ratings.shape[1]
    cand_means = jnp.broadcast_to(state.means[None, :], (i.shape[0], n_items))
    pred = _neighborhood_predict(
        sims, ratings, cand_means, state.means[isafe], isafe, n_neighbors
    )
    pred = jnp.where(uv & iv, pred, state.global_mean)
    if bound_ratings:
        pred = jnp.clip(pred, min_rating, max_rating)
    return pred, uv & iv
