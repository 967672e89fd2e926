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

with an ALTERNATING (Gauss–Seidel) schedule: the user pass accumulates
its sums against the pre-epoch ``Q`` and updates ``P``; the item pass
then accumulates against the FRESH ``P``.  Alternation is what carries
Lee–Seung's monotone-descent guarantee — a simultaneous (Jacobi) update
of both sides has no such guarantee and measurably zigzags (train RMSE
oscillating above the rating range on ML-100K shapes), while the
alternating run descends monotonically and reaches the same loss in
fewer epochs despite costing two passes.

TPU design (vs the per-rating loops such updates are usually written as):

* **Two read-only passes per epoch, zero sequential dependencies.**
  Each pass is a ``lax.scan`` over the packed rating batches that only
  ACCUMULATES — per batch, gather ``p_u``/``q_i`` rows, form ``est``,
  and scatter-add one side's ``[q*r ‖ q*est]`` contributions into a
  ``(cap, 2k)`` accumulator.  The multiplicative update itself is one
  elementwise op per table.  Because each pass is full-batch, the math
  is batch-size invariant (batches only tile the segment sums) — no
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


def _accumulate_side(P, Q, data: sgd.RatingBatches, k: int, side: str,
                     acc_init: Optional[jax.Array] = None):
    """One read-only pass over the rating stream: the (cap, 2k)
    ``[sum other*r ‖ sum other*est]`` accumulator for ``side``.

    ``acc_init`` overrides the zeros carry — the dp trainer passes a
    device-varying zeros block so the scan carry type-checks under
    ``shard_map``.

    Rides the shared tile helpers (``segment_sgd.tile_*`` — the MXU
    one-hot einsum path; raw per-row XLA scatter is the row-op
    bottleneck the SGD trainer already measured and engineered around),
    with the pack accepted in EITHER orientation: when ``side`` is the
    pack's primary its one-hot is shared between gather and scatter,
    otherwise the contributions are permuted to sorted order for the
    secondary tiles.  Each helper degrades to the plain per-row op when
    the pack carries no tiles."""
    cap = (P if side == "user" else Q).shape[0]
    prim_is_user = data.primary == "user"
    side_is_prim = side == data.primary
    prim_key, sec_key = ("u", "i") if prim_is_user else ("i", "u")
    prim_tbl, sec_tbl = (P, Q) if prim_is_user else (Q, P)
    xs, agg_prim, agg_sec = sgd.tile_batch_xs(
        data, include_sec=not side_is_prim, primary=None)

    def body(acc, b):
        oh_prim = sgd.tile_prim_onehot(b, agg_prim, key=prim_key)
        prim_rows = sgd.tile_prim_gather(prim_tbl, b, oh_prim, agg_prim,
                                         data.expand_prim, key=prim_key)
        sec_rows = sec_tbl.at[b[sec_key]].get(mode="promise_in_bounds")
        pu, qi = ((prim_rows, sec_rows) if prim_is_user
                  else (sec_rows, prim_rows))
        pu, qi = pu[:, :k], qi[:, :k]
        est = jnp.einsum("nk,nk->n", pu, qi)
        rw = (b["r"] * b["w"])[:, None]
        ew = (est * b["w"])[:, None]
        other = qi if side == "user" else pu
        rows = jnp.concatenate([other * rw, other * ew], axis=1)
        if side_is_prim:
            acc = sgd.tile_prim_scatter(acc, rows, b, oh_prim, agg_prim,
                                        key=prim_key)
        else:
            acc = sgd.tile_sec_scatter(acc, rows, b, agg_sec,
                                       key=sec_key)
        return acc, None

    acc0 = (jnp.zeros((cap, 2 * k), jnp.float32)
            if acc_init is None else acc_init)
    acc, _ = jax.lax.scan(body, acc0, xs)
    return acc


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
    """Multi-epoch multiplicative-update NMF (alternating schedule: the
    item pass sees the epoch's fresh user factors); returns
    ``(params, per-epoch train RMSE)`` — one traced program, no host
    round-trips (same contract as ``segment_sgd.sgd_train``)."""
    k = cfg.n_factors

    def epoch(p: sgd.MFParams, _):
        P, Q = p.user_features, p.item_features
        if update_user_params:
            acc_u = _accumulate_side(P, Q, data, k, "user")
            P = _apply_mult_update(P, acc_u, cnt_u, k, reg_pu, eps)
        if update_item_params:
            acc_i = _accumulate_side(P, Q, data, k, "item")
            Q = _apply_mult_update(Q, acc_i, cnt_i, k, reg_qi, eps)
        p = p._replace(user_features=P, item_features=Q)
        if cfg.compute_epoch_rmse:
            rmse = jnp.sqrt(sgd.masked_sse(p, data, cfg)
                            / max(data.n_real, 1))
        else:
            rmse = jnp.float32(0.0)
        return p, rmse

    return jax.lax.scan(epoch, params, None, length=n_epochs)


def dp_nmf_train(
    params: sgd.MFParams,
    data: sgd.RatingBatches,
    cnt_u: jax.Array,  # (Ucap,) f32, row-sharded like P
    cnt_i: jax.Array,  # (Icap,) f32, replicated (GLOBAL counts)
    cfg: SGDConfig,
    n_epochs: int,
    reg_pu: float,
    reg_qi: float,
    mesh,
    eps: float = 1e-8,
) -> Tuple[sgd.MFParams, jax.Array]:
    """Data-parallel alternating NMF under ``shard_map``.

    Layout contract of :func:`parallel.distributed.dp_fit` (tiled):
    P row-sharded over the mesh's data axes with LOCAL user ids in the
    device-major pack (``pack_ratings(n_dev=...)``), Q replicated.  The
    user pass is communication-free (each user's ratings live on its
    owning device, so the user accumulator is exactly the local rows);
    the item pass psums ONE (Icap, 2k) accumulator per epoch — the
    multiplicative update then replays identically on every device, so Q
    replicas stay bit-identical.  Because each pass is a full-batch
    segment sum, the dp schedule is EQUAL to the single-device schedule
    up to float reassociation (equivalence-tested) — unlike SGD there is
    no global-batch semantics change.
    """
    from matrix_factorization_tpu.parallel.mesh import data_axes_of
    from jax.sharding import PartitionSpec as Pspec

    data_axes = data_axes_of(mesh)
    k = cfg.n_factors
    n_real = data.n_real

    def local_train(P_l, Q, mu, ldata, cu_l, ci):
        def vzeros(cap):
            return jax.lax.pcast(jnp.zeros((cap, 2 * k), jnp.float32),
                                 data_axes, to="varying")

        def epoch(carry, _):
            P_l, Q = carry
            acc_u = _accumulate_side(P_l, Q, ldata, k, "user",
                                     acc_init=vzeros(P_l.shape[0]))
            P_l = _apply_mult_update(P_l, acc_u, cu_l, k, reg_pu, eps)
            acc_i = _accumulate_side(P_l, Q, ldata, k, "item",
                                     acc_init=vzeros(Q.shape[0]))
            acc_i = jax.lax.psum(acc_i, data_axes)
            Q = _apply_mult_update(Q, acc_i, ci, k, reg_qi, eps)
            if cfg.compute_epoch_rmse:
                sse = sgd.masked_sse(
                    sgd.MFParams(P_l, Q, mu), ldata, cfg,
                    init=jax.lax.pcast(jnp.float32(0.0), data_axes,
                                       to="varying"))
                rmse = jnp.sqrt(jax.lax.psum(sse, data_axes)
                                / max(n_real, 1))
            else:
                rmse = jnp.float32(0.0)
            return (P_l, Q), rmse

        (P_l, Q), hist = jax.lax.scan(epoch, (P_l, Q), None,
                                      length=n_epochs)
        return P_l, Q, hist

    shard = Pspec(data_axes)
    rep = Pspec()
    fn = jax.shard_map(
        local_train,
        mesh=mesh,
        in_specs=(shard, rep, rep, shard, shard, rep),
        out_specs=(shard, rep, rep),
    )
    P_new, Q_new, hist = fn(
        params.user_features, params.item_features, params.global_mean,
        data, cnt_u, cnt_i,
    )
    return sgd.MFParams(P_new, Q_new, params.global_mean), hist


def jit_dp_nmf_train(cfg: SGDConfig, n_epochs: int, reg_pu: float,
                     reg_qi: float, mesh, eps: float = 1e-8):
    """Cached jit of :func:`dp_nmf_train` (mesh in the static key)."""
    key = ("dp", cfg, n_epochs, reg_pu, reg_qi, mesh, eps)
    fn = _train_cache.get(key)
    if fn is None:
        fn = jax.jit(
            lambda p, d, cu, ci: dp_nmf_train(
                p, d, cu, ci, cfg, n_epochs, reg_pu, reg_qi, mesh, eps,
            ),
            donate_argnums=(0,),
        )
        _train_cache[key] = fn
    return fn


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
