"""Vectorized mini-batch SGD with segment-sum gradient accumulation.

This module replaces the reference's sequential per-rating Numba loops
(``kernel_matrix_factorization.py:320-445`` epoch loop dispatching to the
single-step updates in ``kernels.py:108-327``) with a TPU-native design:

* **Bias folding.** The factor tables are lane-padded anyway (K=100 ->
  128), so the user/item biases live in two of the padding columns:
  ``user_ext = [p_0..p_K, b_u, 1]`` and ``item_ext = [q_0..q_K, 1, b_i]``.
  The kernel's linear sum ``mu + b_u + b_i + <p,q>`` becomes a single
  row dot, and the bias SGD update is the ordinary factor update under a
  column mask — eliminating two gather and two scatter row-ops per rating
  (row-ops, not bytes, are the TPU scatter bottleneck: ~6ns/row
  regardless of dtype or row width, measured on v5e).
  For the rbf kernel (which has no bias/mean terms at all, reference
  ``kernels.py:81-105``) the extension columns stay zero.
* **An epoch** is a ``lax.scan`` over pre-packed mini-batches.  The rating
  stream is shuffled once on the host at pack time; per epoch only the
  *batch order* is reshuffled on device (contiguous block gathers, free)
  — per-element re-permutation would cost as many random row-ops as the
  updates themselves.  ``shuffle='full'`` restores the reference's exact
  per-epoch element shuffle (``kernel_matrix_factorization.py:371``) at
  ~2x cost.
* **A mini-batch step** gathers the touched rows, evaluates the kernel
  forward + gradient for the whole batch on the VPU, and scatter-adds the
  deltas back.  Duplicate users/items inside a batch accumulate by
  summation — the explicit, deterministic replacement for the reference's
  serial in-place updates (its docstring records that thread-parallel
  updates *degraded* results, ``kernels.py:127``).

Semantics: per-rating SGD and mini-batch SGD follow slightly different
trajectories; parity with the reference is *final-metric* parity
(RMSE/MAE).  ``batch_size=1`` + ``shuffle='none'`` reproduces the
reference trajectory exactly and is kept as a debugging mode.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from matrix_factorization_tpu.core.config import SGDConfig, SUBLANE


class MFParams(NamedTuple):
    """Device-resident model state (capacity-padded, bias-folded tables).

    ``user_features (U, Kp)`` / ``item_features (I, Kp)``: columns
    ``[0, n_factors)`` are the latent factors, column ``n_factors`` holds
    the user bias / the constant 1, column ``n_factors+1`` holds the
    constant 1 / the item bias (zero for rbf).  Remaining padding columns
    are zero and stay zero under training.
    """

    user_features: jax.Array
    item_features: jax.Array
    global_mean: jax.Array  # f32 scalar


@struct.dataclass
class RatingBatches:
    """Rating stream packed as (n_batches, batch_size) blocks.

    ``n_real`` is static metadata (not a traced leaf) so jitted code can
    use it as a Python int.
    """

    user_ids: jax.Array  # (nb, bs) int32
    item_ids: jax.Array  # (nb, bs) int32
    ratings: jax.Array  # (nb, bs) f32
    weights: jax.Array  # (nb, bs) f32, 1.0 real / 0.0 pad
    n_real: int = struct.field(pytree_node=False)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bias_col(cfg: SGDConfig, side: str) -> int:
    """Column index of the bias in the extended factor row."""
    return cfg.n_factors if side == "user" else cfg.n_factors + 1


def const_col(cfg: SGDConfig, side: str) -> int:
    return cfg.n_factors + 1 if side == "user" else cfg.n_factors


def padded_width(cfg: SGDConfig) -> int:
    """Lane-padded row width with room for the two extension columns."""
    return cfg.padded_factors


def update_mask(cfg: SGDConfig, side: str) -> np.ndarray:
    """1.0 on columns this side may update (factors + own bias), 0 on the
    constant column and padding."""
    kp = padded_width(cfg)
    m = np.zeros(kp, np.float32)
    m[: cfg.n_factors] = 1.0
    if cfg.kernel != "rbf":
        m[bias_col(cfg, side)] = 1.0
    return m


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
) -> MFParams:
    """Zero biases + N(init_mean, init_sd) factors
    (reference kernel_matrix_factorization.py:93-102), bias-folded."""
    ucap = round_up(user_capacity or n_users, SUBLANE)
    icap = round_up(item_capacity or n_items, SUBLANE)
    kp = padded_width(cfg)
    ku, ki = jax.random.split(key)

    def table(k, cap, side):
        f = init_mean + init_sd * jax.random.normal(k, (cap, kp), jnp.float32)
        col_ok = jnp.arange(kp) < cfg.n_factors
        f = jnp.where(col_ok[None, :], f, 0.0)
        if cfg.kernel != "rbf":
            f = f.at[:, const_col(cfg, side)].set(1.0)
        return f

    return MFParams(
        user_features=table(ku, ucap, "user"),
        item_features=table(ki, icap, "item"),
        global_mean=jnp.asarray(global_mean, jnp.float32),
    )


def fresh_user_rows(key: jax.Array, n: int, cfg: SGDConfig,
                    init_mean: float, init_sd: float) -> jax.Array:
    """Rows for new/re-initialized users: zero bias, fresh factors
    (reference kernel_matrix_factorization.py:189-210)."""
    kp = padded_width(cfg)
    f = init_mean + init_sd * jax.random.normal(key, (n, kp), jnp.float32)
    f = jnp.where(jnp.arange(kp)[None, :] < cfg.n_factors, f, 0.0)
    if cfg.kernel != "rbf":
        f = f.at[:, const_col(cfg, "user")].set(1.0)
    return f


def pack_ratings(
    user_ids: np.ndarray,
    item_ids: np.ndarray,
    ratings: np.ndarray,
    batch_size: int,
    shuffle_seed: Optional[int] = 0,
) -> RatingBatches:
    """Host-side packing into (nb, bs) blocks, pre-shuffled once."""
    n = int(len(ratings))
    if shuffle_seed is not None and n > 1:
        perm = np.random.default_rng(shuffle_seed).permutation(n)
        user_ids, item_ids, ratings = (
            user_ids[perm], item_ids[perm], ratings[perm],
        )
    n_pad = max(batch_size, round_up(n, batch_size))
    pad = n_pad - n
    nb = n_pad // batch_size
    u = np.concatenate([user_ids.astype(np.int32), np.zeros(pad, np.int32)])
    i = np.concatenate([item_ids.astype(np.int32), np.zeros(pad, np.int32)])
    r = np.concatenate([ratings.astype(np.float32), np.zeros(pad, np.float32)])
    w = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    return RatingBatches(
        jnp.asarray(u.reshape(nb, batch_size)),
        jnp.asarray(i.reshape(nb, batch_size)),
        jnp.asarray(r.reshape(nb, batch_size)),
        jnp.asarray(w.reshape(nb, batch_size)),
        n,
    )


# ---------------------------------------------------------------------------
# Forward + gradients on extended rows
# ---------------------------------------------------------------------------


def ext_forward(cfg: SGDConfig, mu, pu, qi) -> jax.Array:
    """Kernel forward on bias-folded rows (biases ride inside the dot)."""
    if cfg.kernel == "rbf":
        d = pu - qi
        power = -cfg.gamma * jnp.sum(d * d, axis=-1)
        return cfg.a + cfg.c * jnp.exp(power)
    x = mu + jnp.sum(pu * qi, axis=-1)
    if cfg.kernel == "linear":
        return x
    if cfg.kernel == "sigmoid":
        return cfg.a + cfg.c * jax.nn.sigmoid(x)
    raise ValueError(f"unknown kernel {cfg.kernel!r}")


def ext_forward_and_rowgrads(cfg: SGDConfig, mu, pu, qi):
    """(pred, d_pu, d_qi) with the reference's gradient convention
    (``c`` omitted from sigmoid/rbf deriv_base — PARITY.md #4)."""
    if cfg.kernel == "rbf":
        d = pu - qi
        power = -cfg.gamma * jnp.sum(d * d, axis=-1)
        e = jnp.exp(power)
        pred = cfg.a + cfg.c * e
        base = (2.0 * cfg.gamma) * e
        d_pu = -d * base[:, None]
        return pred, d_pu, -d_pu
    x = mu + jnp.sum(pu * qi, axis=-1)
    if cfg.kernel == "linear":
        return x, qi, pu
    if cfg.kernel == "sigmoid":
        sig = jax.nn.sigmoid(x)
        pred = cfg.a + cfg.c * sig
        base = sig * (1.0 - sig)
        return pred, qi * base[:, None], pu * base[:, None]
    raise ValueError(f"unknown kernel {cfg.kernel!r}")


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

    Per rating: ``delta_p = -lr * (err * dpred/dp + reg * p)`` exactly as
    the reference single-step updates (``kernels.py:156-178`` et al.);
    deltas of colliding rows sum via scatter-add.  The column masks keep
    the constant-1 extension column and the padding frozen.
    """
    # ids are vocab-encoded (pads use row 0): skip the bounds-clamp logic
    pu = params.user_features.at[u].get(mode="promise_in_bounds")
    qi = params.item_features.at[i].get(mode="promise_in_bounds")
    pred, d_pu, d_qi = ext_forward_and_rowgrads(cfg, params.global_mean, pu, qi)
    err = (pred - r) * w

    new = params
    if cfg.update_user_params:
        umask = jnp.asarray(update_mask(cfg, "user"))
        g = (err[:, None] * d_pu + (cfg.reg * w)[:, None] * pu) * umask[None, :]
        new = new._replace(
            user_features=new.user_features.at[u].add(
                -lr * g, mode="promise_in_bounds"
            )
        )
    if cfg.update_item_params:
        imask = jnp.asarray(update_mask(cfg, "item"))
        g = (err[:, None] * d_qi + (cfg.reg * w)[:, None] * qi) * imask[None, :]
        new = new._replace(
            item_features=new.item_features.at[i].add(
                -lr * g, mode="promise_in_bounds"
            )
        )
    return new


# ---------------------------------------------------------------------------
# Epoch and multi-epoch drivers
# ---------------------------------------------------------------------------


def _epoch(params: MFParams, key: jax.Array, data: RatingBatches,
           cfg: SGDConfig, lr):
    nb = data.user_ids.shape[0]
    if cfg.shuffle == "full":
        n_pad = nb * cfg.batch_size
        perm = jax.random.permutation(key, n_pad)
        xs = tuple(
            x.reshape(-1)[perm].reshape(nb, cfg.batch_size)
            for x in (data.user_ids, data.item_ids, data.ratings, data.weights)
        )
    elif cfg.shuffle == "batch":
        bperm = jax.random.permutation(key, nb)
        xs = tuple(
            x[bperm]
            for x in (data.user_ids, data.item_ids, data.ratings, data.weights)
        )
    else:  # 'none'
        xs = (data.user_ids, data.item_ids, data.ratings, data.weights)

    def body(p, batch):
        uu, ii, rr, ww = batch
        return sgd_minibatch_step(p, uu, ii, rr, ww, cfg, lr), None

    params, _ = jax.lax.scan(body, params, xs)
    return params


def masked_sse(params: MFParams, data: RatingBatches, cfg: SGDConfig) -> jax.Array:
    """Sum of squared errors over the (padded) rating stream, batched to
    bound the gather working set. Mirrors the reference's per-epoch full
    train pass (``kernel_matrix_factorization.py:428-440``)."""
    xs = (data.user_ids, data.item_ids, data.ratings, data.weights)

    def body(acc, batch):
        u, i, r, w = batch
        pred = ext_forward(
            cfg, params.global_mean,
            params.user_features.at[u].get(mode="promise_in_bounds"),
            params.item_features.at[i].get(mode="promise_in_bounds"),
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
            lambda p, d, k, lr: sgd_train(p, d, k, cfg, n_epochs, lr),
            donate_argnums=(0,),
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
    and fall back to bias 0 + zero factor vector — the reference's
    behavior (``kernel_matrix_factorization.py:486-499``) expressed as
    ``where`` masks.  With bias folding, the unknown side's row becomes
    the pure-constant row (factors 0, bias 0, const 1).  Returns
    (predictions, predictions_possible).
    """
    kp = params.user_features.shape[1]
    uv, iv = u >= 0, i >= 0
    us, isafe = jnp.maximum(u, 0), jnp.maximum(i, 0)
    pu = params.user_features[us]
    qi = params.item_features[isafe]
    if cfg.kernel != "rbf":
        cold_u = jnp.zeros((kp,), jnp.float32).at[const_col(cfg, "user")].set(1.0)
        cold_i = jnp.zeros((kp,), jnp.float32).at[const_col(cfg, "item")].set(1.0)
    else:
        cold_u = jnp.zeros((kp,), jnp.float32)
        cold_i = jnp.zeros((kp,), jnp.float32)
    pu = jnp.where(uv[:, None], pu, cold_u[None, :])
    qi = jnp.where(iv[:, None], qi, cold_i[None, :])
    pred = ext_forward(cfg, params.global_mean, pu, qi)
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
