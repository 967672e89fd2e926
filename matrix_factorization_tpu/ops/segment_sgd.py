"""Vectorized mini-batch SGD with segment-sum gradient accumulation.

This module replaces the reference's sequential per-rating Numba loops
(``kernel_matrix_factorization.py:320-445`` epoch loop dispatching to the
single-step updates in ``kernels.py:108-327``) with a TPU-native design:

* An **epoch** is one traced program: a fresh ``jax.random.permutation`` of
  the rating stream (the reference reshuffles in-place each epoch,
  ``kernel_matrix_factorization.py:371``) followed by a ``lax.scan`` over
  fixed-size mini-batches.
* A **mini-batch step** gathers the touched factor rows, evaluates the
  kernel forward + gradients for the whole batch on the VPU (one lane-axis
  reduction instead of the reference's per-factor scalar loop), and
  scatter-adds the parameter deltas back.  Duplicate users/items inside a
  batch accumulate by summation — the explicit, deterministic replacement
  for the reference's serial in-place updates (its docstring records that
  thread-parallel updates *degraded* results, ``kernels.py:127``).
* Ratings are padded to a whole number of batches with ``weight=0`` rows so
  every shape is static under ``jit``.

Semantics note: per-rating SGD and mini-batch SGD follow slightly different
trajectories; parity with the reference is *final-metric* parity (RMSE/MAE)
— `batch_size=1` reproduces the reference trajectory exactly (modulo
shuffle order) and is kept as a debugging mode.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from matrix_factorization_tpu.core.config import SGDConfig, SUBLANE
from matrix_factorization_tpu.ops import kernels as K


class MFParams(NamedTuple):
    """Device-resident model state (capacity-padded tables).

    ``user_features (U, Kp)``, ``item_features (I, Kp)`` with the factor
    axis padded to the lane width; padding columns are zero-initialized and
    stay zero under training (their gradients are identically zero).
    """

    user_features: jax.Array
    item_features: jax.Array
    user_biases: jax.Array
    item_biases: jax.Array
    global_mean: jax.Array  # f32 scalar


@struct.dataclass
class RatingBatches:
    """Rating stream shaped (n_batches * batch_size,) with pad weights.

    ``n_real`` is static metadata (not a traced leaf) so jitted code can use
    it as a Python int.
    """

    user_ids: jax.Array  # int32
    item_ids: jax.Array  # int32
    ratings: jax.Array  # f32
    weights: jax.Array  # f32, 1.0 real / 0.0 pad
    n_real: int = struct.field(pytree_node=False)  # number of real ratings


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def init_params(
    key: jax.Array,
    n_users: int,
    n_items: int,
    cfg: SGDConfig,
    global_mean: float,
    init_mean: float = 0.0,
    init_sd: float = 0.1,
    user_capacity: Optional[int] = None,
    item_capacity: Optional[int] = None,
    dtype=jnp.float32,
) -> MFParams:
    """Zero biases + N(init_mean, init_sd) factors
    (reference kernel_matrix_factorization.py:93-102), laid out on
    capacity-padded, lane-aligned tables."""
    ucap = round_up(user_capacity or n_users, SUBLANE)
    icap = round_up(item_capacity or n_items, SUBLANE)
    kp = cfg.padded_factors
    ku, ki = jax.random.split(key)

    def factors(k, cap):
        f = init_mean + init_sd * jax.random.normal(k, (cap, kp), dtype=jnp.float32)
        # zero the factor padding columns and rows beyond the live range
        col_ok = jnp.arange(kp) < cfg.n_factors
        f = jnp.where(col_ok[None, :], f, 0.0)
        return f.astype(dtype)

    return MFParams(
        user_features=factors(ku, ucap),
        item_features=factors(ki, icap),
        user_biases=jnp.zeros((ucap,), jnp.float32),
        item_biases=jnp.zeros((icap,), jnp.float32),
        global_mean=jnp.asarray(global_mean, jnp.float32),
    )


def pack_ratings(
    user_ids: np.ndarray,
    item_ids: np.ndarray,
    ratings: np.ndarray,
    batch_size: int,
) -> RatingBatches:
    """Host-side packing of the rating stream into static-shape batches."""
    n = int(len(ratings))
    n_pad = max(batch_size, round_up(n, batch_size))
    pad = n_pad - n
    u = np.concatenate([user_ids.astype(np.int32), np.zeros(pad, np.int32)])
    i = np.concatenate([item_ids.astype(np.int32), np.zeros(pad, np.int32)])
    r = np.concatenate([ratings.astype(np.float32), np.zeros(pad, np.float32)])
    w = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    return RatingBatches(jnp.asarray(u), jnp.asarray(i), jnp.asarray(r), jnp.asarray(w), n)


# ---------------------------------------------------------------------------
# Single mini-batch update
# ---------------------------------------------------------------------------


def sgd_minibatch_step(
    params: MFParams,
    u: jax.Array,
    i: jax.Array,
    r: jax.Array,
    w: jax.Array,
    cfg: SGDConfig,
    lr: float | jax.Array,
) -> MFParams:
    """One synchronous mini-batch update with summed per-example deltas.

    For each rating: ``delta_p = -lr * (err * dpred/dp + reg * p)`` exactly
    as the reference single-step updates (``kernels.py:156-178`` et al.);
    deltas of colliding rows sum via scatter-add.
    """
    pu = params.user_features[u]
    qi = params.item_features[i]
    bu = params.user_biases[u]
    bi = params.item_biases[i]

    pred, g = K.forward_and_grads(
        cfg.kernel, params.global_mean, bu, bi, pu, qi, cfg.gamma, cfg.a, cfg.c
    )
    err = (pred - r) * w  # pads contribute nothing

    new = params
    storage_dtype = params.user_features.dtype
    if cfg.update_user_params:
        d_pu = (err[:, None] * g.d_pu + (cfg.reg * w)[:, None] * pu.astype(jnp.float32))
        new = new._replace(
            user_features=new.user_features.at[u].add(
                (-lr * d_pu).astype(storage_dtype), mode="drop"
            )
        )
        if cfg.kernel != "rbf":  # rbf has no bias terms (kernels.py:81-105)
            d_bu = err * g.d_bias + cfg.reg * w * bu
            new = new._replace(
                user_biases=new.user_biases.at[u].add(-lr * d_bu, mode="drop")
            )
    if cfg.update_item_params:
        d_qi = (err[:, None] * g.d_qi + (cfg.reg * w)[:, None] * qi.astype(jnp.float32))
        new = new._replace(
            item_features=new.item_features.at[i].add(
                (-lr * d_qi).astype(storage_dtype), mode="drop"
            )
        )
        if cfg.kernel != "rbf":
            d_bi = err * g.d_bias + cfg.reg * w * bi
            new = new._replace(
                item_biases=new.item_biases.at[i].add(-lr * d_bi, mode="drop")
            )
    return new


# ---------------------------------------------------------------------------
# Epoch and multi-epoch drivers
# ---------------------------------------------------------------------------


def _epoch(params: MFParams, key: jax.Array, data: RatingBatches, cfg: SGDConfig, lr):
    n_pad = data.user_ids.shape[0]
    nb = n_pad // cfg.batch_size
    perm = jax.random.permutation(key, n_pad)
    xs = (
        data.user_ids[perm].reshape(nb, cfg.batch_size),
        data.item_ids[perm].reshape(nb, cfg.batch_size),
        data.ratings[perm].reshape(nb, cfg.batch_size),
        data.weights[perm].reshape(nb, cfg.batch_size),
    )

    def body(p, batch):
        u, i, r, w = batch
        return sgd_minibatch_step(p, u, i, r, w, cfg, lr), None

    params, _ = jax.lax.scan(body, params, xs)
    return params


def masked_sse(params: MFParams, data: RatingBatches, cfg: SGDConfig) -> jax.Array:
    """Sum of squared errors over the (padded) rating stream, batched to
    bound the gather working set. Mirrors the reference's per-epoch full
    train pass (``kernel_matrix_factorization.py:428-440``)."""
    n_pad = data.user_ids.shape[0]
    nb = n_pad // cfg.batch_size
    xs = (
        data.user_ids.reshape(nb, cfg.batch_size),
        data.item_ids.reshape(nb, cfg.batch_size),
        data.ratings.reshape(nb, cfg.batch_size),
        data.weights.reshape(nb, cfg.batch_size),
    )

    def body(acc, batch):
        u, i, r, w = batch
        pred = K.forward(
            cfg.kernel,
            params.global_mean,
            params.user_biases[u],
            params.item_biases[i],
            params.user_features[u],
            params.item_features[i],
            cfg.gamma,
            cfg.a,
            cfg.c,
        )
        e = (pred - r) * w
        return acc + jnp.sum(e * e), None

    sse, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
    return sse


def sgd_train(
    params: MFParams,
    data: RatingBatches,
    key: jax.Array,
    cfg: SGDConfig,
    n_epochs: int,
    lr: float,
) -> Tuple[MFParams, jax.Array]:
    """Run ``n_epochs`` epochs; returns (params, per-epoch train RMSE).

    The whole multi-epoch fit is a single traced program (scan over epochs)
    so the device never round-trips to the host.
    """
    keys = jax.random.split(key, n_epochs)

    def body(p, k):
        p = _epoch(p, k, data, cfg, lr)
        if cfg.compute_epoch_rmse:
            rmse = jnp.sqrt(masked_sse(p, data, cfg) / max(data.n_real, 1))
        else:
            rmse = jnp.float32(0.0)
        return p, rmse

    return jax.lax.scan(body, params, keys)


_train_cache: dict = {}


def jit_sgd_train(cfg: SGDConfig, n_epochs: int):
    """Cached jit of the multi-epoch trainer keyed on static config."""
    key = (cfg, n_epochs)
    if key not in _train_cache:
        _train_cache[key] = jax.jit(
            lambda p, d, k, lr: sgd_train(p, d, k, cfg, n_epochs, lr)
        )
    return _train_cache[key]


# ---------------------------------------------------------------------------
# Prediction
# ---------------------------------------------------------------------------


def predict_pairs(
    params: MFParams,
    u: jax.Array,
    i: jax.Array,
    cfg: SGDConfig,
    bound_ratings: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Cold-start-safe batched prediction.

    Unknown ids arrive as ``-1`` (reference ``recommender_base.py:166-168``)
    and are masked to bias 0 + zero factor vector — the reference's
    fallback (``kernel_matrix_factorization.py:486-499``) expressed as
    ``where`` masks instead of branches.  Returns (predictions,
    predictions_possible).
    """
    uv = u >= 0
    iv = i >= 0
    us = jnp.maximum(u, 0)
    isafe = jnp.maximum(i, 0)
    bu = jnp.where(uv, params.user_biases[us], 0.0)
    bi = jnp.where(iv, params.item_biases[isafe], 0.0)
    pu = jnp.where(uv[:, None], params.user_features[us], 0.0)
    qi = jnp.where(iv[:, None], params.item_features[isafe], 0.0)
    pred = K.forward(
        cfg.kernel, params.global_mean, bu, bi, pu, qi, cfg.gamma, cfg.a, cfg.c
    )
    if bound_ratings:
        pred = jnp.clip(pred, cfg.min_rating, cfg.max_rating)
    return pred, uv & iv


_predict_cache: dict = {}


def jit_predict_pairs(cfg: SGDConfig, bound_ratings: bool):
    key = (cfg, bound_ratings)
    if key not in _predict_cache:
        _predict_cache[key] = jax.jit(
            lambda p, u, i: predict_pairs(p, u, i, cfg, bound_ratings)
        )
    return _predict_cache[key]
