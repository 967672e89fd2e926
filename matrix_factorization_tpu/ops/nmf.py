"""Non-negative matrix factorization on the observed-ratings mask.

An extension model family (the reference has no NMF): the classic
Lee–Seung multiplicative-update rule restricted to observed entries,
with per-entity-count L2 regularization — the standard recommender NMF
formulation (Luo et al., "An efficient non-negative matrix-factorization-
based approach to collaborative filtering", IEEE TII 2014; also the
`surprise` library's NMF).  Factors stay non-negative by construction,
which buys interpretable part-based embeddings (topics of items, user
affinity mixtures) — the property PMF/SGD factorizations lack.

Per-factor update (user side; item side symmetric)::

    p_uf <- p_uf * (sum_{i in I_u} q_if * r_ui)
                  / (sum_{i in I_u} q_if * est_ui  +  reg * |I_u| * p_uf)

with ``est = p_u . q_i`` read from the PRE-epoch tables for every rating
(a Jacobi schedule: both numerator/denominator sums for BOTH sides are
accumulated in one pass, then both tables update simultaneously).

TPU design (vs the per-rating loops such updates are usually written as):

* **One pass per epoch, zero sequential dependencies.**  The epoch is a
  ``lax.scan`` over the packed rating batches that only ACCUMULATES —
  per batch, gather ``p_u``/``q_i`` rows, form ``est``, and scatter-add
  the per-side ``[q*r ‖ q*est]`` contributions into ``(cap, 2k)``
  accumulators.  The multiplicative update itself is one elementwise op
  per table.  Because the schedule is full-batch Jacobi, the math is
  batch-size invariant (batches only tile the segment sums) — no
  batching-parity question arises, unlike SGD.
* **Static entity counts.**  ``|I_u|`` / ``|U_i|`` never change within a
  fit, so they are host ``bincount``s shipped once, not recomputed.
* **Zero-observation rows are preserved**, not zeroed: the update is
  masked to ``count > 0`` (an unguarded multiplicative update would
  multiply untouched rows by 0/eps).
* **Standard extended-row tables** (`segment_sgd.MFParams`, linear
  kernel, global_mean = 0, bias columns pinned at 0, constant columns
  1) so every downstream consumer — ``predict_pairs``, the catalog
  scorers, device top-k, bf16 serving, checkpointing — works unchanged:
  the served linear score ``mu + b_u + b_i + p.q`` degenerates to the
  NMF score ``p.q``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops import segment_sgd as sgd

_train_cache: dict = {}


def init_nmf_params(
    key: jax.Array,
    n_users: int,
    n_items: int,
    cfg: SGDConfig,
    init_low: float = 0.0,
    init_high: float = 1.0,
    user_capacity: Optional[int] = None,
    item_capacity: Optional[int] = None,
) -> sgd.MFParams:
    """Uniform[init_low, init_high) non-negative factors in extended rows
    (bias columns 0, constant columns 1, ``global_mean`` 0)."""
    if init_low < 0 or init_high <= init_low:
        raise ValueError("need 0 <= init_low < init_high")
    ucap = sgd.round_up(user_capacity or n_users, 8)
    icap = sgd.round_up(item_capacity or n_items, 8)
    kp = sgd.padded_width(cfg)
    ku, ki = jax.random.split(key)

    def table(k, cap, side):
        f = jax.random.uniform(k, (cap, kp), jnp.float32,
                               minval=init_low, maxval=init_high)
        f = jnp.where(jnp.arange(kp)[None, :] < cfg.n_factors, f, 0.0)
        return f.at[:, sgd.const_col(cfg, side)].set(1.0)

    return sgd.MFParams(
        user_features=table(ku, ucap, "user"),
        item_features=table(ki, icap, "item"),
        global_mean=jnp.float32(0.0),
    )


def fresh_nmf_user_rows(key: jax.Array, n: int, cfg: SGDConfig,
                        init_low: float, init_high: float) -> jax.Array:
    """Rows for new/re-initialized users (non-negative uniform factors)."""
    kp = sgd.padded_width(cfg)
    f = jax.random.uniform(key, (n, kp), jnp.float32,
                           minval=init_low, maxval=init_high)
    f = jnp.where(jnp.arange(kp)[None, :] < cfg.n_factors, f, 0.0)
    return f.at[:, sgd.const_col(cfg, "user")].set(1.0)


def _epoch_accumulate(P, Q, data: sgd.RatingBatches, k: int,
                      update_user: bool, update_item: bool):
    """One read-only pass over the rating stream: per-side (cap, 2k)
    ``[sum q*r ‖ sum q*est]`` accumulators via scatter-add."""
    acc_u = jnp.zeros((P.shape[0], 2 * k), jnp.float32)
    acc_i = jnp.zeros((Q.shape[0], 2 * k), jnp.float32)
    xs = (data.user_ids, data.item_ids, data.ratings, data.weights)

    def body(acc, batch):
        au, ai = acc
        u, i, r, w = batch
        pu = P.at[u].get(mode="promise_in_bounds")[:, :k]
        qi = Q.at[i].get(mode="promise_in_bounds")[:, :k]
        est = jnp.einsum("nk,nk->n", pu, qi)
        rw = (r * w)[:, None]
        ew = (est * w)[:, None]
        if update_user:
            au = au.at[u].add(
                jnp.concatenate([qi * rw, qi * ew], axis=1),
                mode="promise_in_bounds")
        if update_item:
            ai = ai.at[i].add(
                jnp.concatenate([pu * rw, pu * ew], axis=1),
                mode="promise_in_bounds")
        return (au, ai), None

    (acc_u, acc_i), _ = jax.lax.scan(body, (acc_u, acc_i), xs)
    return acc_u, acc_i


def _apply_mult_update(table, acc, cnt, k: int, reg: float, eps: float):
    """Masked multiplicative update on the factor slice of an extended
    table: rows with zero observations keep their current values."""
    num = acc[:, :k]
    den = acc[:, k:]
    f = table[:, :k]
    new_f = f * num / (den + reg * cnt[:, None] * f + eps)
    seen = (cnt > 0)[:, None]
    return table.at[:, :k].set(jnp.where(seen, new_f, f))


def nmf_train(
    params: sgd.MFParams,
    data: sgd.RatingBatches,
    cnt_u: jax.Array,  # (Ucap,) f32 observation counts (static per fit)
    cnt_i: jax.Array,  # (Icap,) f32
    cfg: SGDConfig,
    n_epochs: int,
    reg_pu: float,
    reg_qi: float,
    update_user_params: bool = True,
    update_item_params: bool = True,
    eps: float = 1e-8,
) -> Tuple[sgd.MFParams, jax.Array]:
    """Multi-epoch multiplicative-update NMF; returns
    ``(params, per-epoch train RMSE)`` — one traced program, no host
    round-trips (same contract as ``segment_sgd.sgd_train``)."""
    k = cfg.n_factors

    def epoch(p: sgd.MFParams, _):
        acc_u, acc_i = _epoch_accumulate(
            p.user_features, p.item_features, data,
            k, update_user_params, update_item_params)
        P, Q = p.user_features, p.item_features
        if update_user_params:
            P = _apply_mult_update(P, acc_u, cnt_u, k, reg_pu, eps)
        if update_item_params:
            Q = _apply_mult_update(Q, acc_i, cnt_i, k, reg_qi, eps)
        p = p._replace(user_features=P, item_features=Q)
        if cfg.compute_epoch_rmse:
            rmse = jnp.sqrt(sgd.masked_sse(p, data, cfg)
                            / max(data.n_real, 1))
        else:
            rmse = jnp.float32(0.0)
        return p, rmse

    return jax.lax.scan(epoch, params, None, length=n_epochs)


def jit_nmf_train(cfg: SGDConfig, n_epochs: int, reg_pu: float,
                  reg_qi: float, update_user_params: bool = True,
                  update_item_params: bool = True, eps: float = 1e-8):
    """Cached jit of :func:`nmf_train` keyed on the static config."""
    key = (cfg, n_epochs, reg_pu, reg_qi, update_user_params,
           update_item_params, eps)
    fn = _train_cache.get(key)
    if fn is None:
        fn = jax.jit(
            lambda p, d, cu, ci: nmf_train(
                p, d, cu, ci, cfg, n_epochs, reg_pu, reg_qi,
                update_user_params, update_item_params, eps,
            ),
            donate_argnums=(0,),
        )
        _train_cache[key] = fn
    return fn
