"""SVD++ (Koren, KDD 2008): matrix factorization with implicit-feedback
factor terms — an extension beyond the reference's surface (the
reference's richest model is plain KernelMF,
``matrix_factorization/kernel_matrix_factorization.py``).

Model:  r_hat(u,i) = mu + b_u + b_i + q_i . (p_u + |N(u)|^-1/2 * sum_{j in N(u)} y_j)

where N(u) is the set of items user u interacted with.  The classic
per-rating SGD updates every y_j in N(u) for every visited rating — an
O(nnz * |N|) scalar-loop algorithm that maps terribly onto a batch
accelerator.  The TPU design here restructures the *schedule*, not the
objective:

* the implicit sum ``s_u`` is computed once per epoch from the full
  rating stream with ONE O(nnz) gather + segment scatter-add (the
  "epoch-cached implicit factors"), and held fixed for the epoch's
  forward passes;
* ``p_u``, ``q_i`` and both biases update per mini-batch exactly as in
  the summed-minibatch SGD the rest of the framework uses;
* the y-gradient is algebraically regrouped: summed over a batch,
  dL/dy_j = sum_{u: j in N(u)} |N(u)|^-1/2 * G_u  with
  G_u = sum_{ratings (u,i) in batch} e_ui * q_i.  G_u is accumulated
  per user during the epoch (one segment-sum per batch), and since
  "j in N(u)" is exactly the observed-pair relation, the epoch-end
  y update is ONE more O(nnz) gather + scatter over the rating stream
  itself — no ragged neighborhood tables, no per-row loops.

Total per-epoch cost: one standard minibatch sweep + two O(nnz)
segment passes.  The deviation from per-rating SGD (y one epoch stale,
p/q batch-fresh) is a documented staleness schedule in the same spirit
as the shipped multi-step batching study (benchmarks/RESULTS.md); the
numpy oracle in tests/test_svdpp.py implements the SAME schedule and
the trajectories agree to float tolerance.

Bias folding matches ``segment_sgd.MFParams``: user rows are
[factors..., b_u, 1, 0-pad], item rows [factors..., 1, b_i, 0-pad], and
the implicit table ``y`` is nonzero ONLY in the factor columns — so
q_i . (p_u + s_u) prices the biases exactly once and serving can reuse
every linear-kernel scorer by substituting the effective user table
P + S.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops import segment_sgd as sgd


class SVDppParams(NamedTuple):
    """MFParams plus the implicit item-factor table ``implicit_features``
    ((Icap, Kp) like ``item_features``; factor columns only) and the
    materialized per-user implicit sums ``user_implicit_sums``
    ((Ucap, Kp) — s_u = |N(u)|^-1/2 * sum y_j, refreshed at fit end and
    per cohort in ``update_users``).  Keeping S in the params means the
    serving view P + S and checkpoint round-trips need no access to the
    historical interaction stream."""

    user_features: jax.Array
    item_features: jax.Array
    implicit_features: jax.Array
    user_implicit_sums: jax.Array
    global_mean: jax.Array

    @property
    def as_mf(self) -> sgd.MFParams:
        """Effective serving view: S is zero outside the factor columns,
        so P + S prices biases exactly once under every linear scorer."""
        return sgd.MFParams(self.user_features + self.user_implicit_sums,
                            self.item_features, self.global_mean)


def init_params(key: jax.Array, n_users: int, n_items: int, cfg: SGDConfig,
                global_mean: float, init_mean: float = 0.0,
                init_sd: float = 0.1,
                user_capacity: int = None) -> SVDppParams:
    base = sgd.init_params(key, n_users, n_items, cfg, global_mean,
                           init_mean, init_sd, user_capacity=user_capacity)
    # y starts at zero (Koren's initialization): epoch 1 is exactly plain
    # biased MF, the implicit terms grow from the data
    return SVDppParams(
        user_features=base.user_features,
        item_features=base.item_features,
        implicit_features=jnp.zeros_like(base.item_features),
        user_implicit_sums=jnp.zeros_like(base.user_features),
        global_mean=base.global_mean,
    )


def pack_pairs(u: np.ndarray, i: np.ndarray, r: np.ndarray,
               batch_size: int) -> Tuple[np.ndarray, ...]:
    """Pad the rating stream to whole batches; returns
    (u, i, r, w) each (n_pad,) plus the CLAMPED batch size
    (``min(batch_size, n)``) — not the real rating count."""
    n = len(u)
    bs = min(batch_size, max(1, n))
    n_pad = sgd.round_up(n, bs)
    up = np.zeros(n_pad, np.int32)
    ip = np.zeros(n_pad, np.int32)
    rp = np.zeros(n_pad, np.float32)
    wp = np.zeros(n_pad, np.float32)
    up[:n], ip[:n], rp[:n], wp[:n] = u, i, r, 1.0
    return up, ip, rp, wp, bs


def _neighbor_weights(u: np.ndarray, n_users: int, cap: int) -> np.ndarray:
    """|N(u)|^-1/2 per user row (0 for users with no interactions)."""
    counts = np.bincount(u, minlength=n_users).astype(np.float32)
    w = np.zeros(cap, np.float32)
    w[:n_users] = np.where(counts > 0, 1.0 / np.sqrt(np.maximum(counts, 1)),
                           0.0)
    return w


def implicit_sum(Y: jax.Array, u: jax.Array, i: jax.Array, w: jax.Array,
                 wvec: jax.Array, chunk: int = 0,
                 data_axes: tuple = ()) -> jax.Array:
    """S[u] = |N(u)|^-1/2 * sum_{j in N(u)} y_j — one gather + one
    segment scatter-add over the (padded) pair stream.  ``chunk`` > 0
    processes the stream in (chunk, Kp) slices under a ``lax.scan`` so
    the gathered rows never materialize at (nnz, Kp) — 25.8GB at
    ML-25M x Kp=256, past a v5e's HBM.  ``data_axes`` marks the scan
    carry device-varying when called inside ``shard_map`` (the
    accumulator holds this device's local rows)."""
    S = jnp.zeros((wvec.shape[0], Y.shape[1]), Y.dtype)
    if data_axes:
        S = jax.lax.pcast(S, data_axes, to="varying")
    n = u.shape[0]
    if chunk <= 0 or chunk >= n:
        S = S.at[u].add(Y.at[i].get(mode="promise_in_bounds") * w[:, None],
                        mode="promise_in_bounds")
    else:
        nc = n // chunk

        def body(acc, sl):
            uu, ii, ww = sl
            rows = Y.at[ii].get(mode="promise_in_bounds") * ww[:, None]
            return acc.at[uu].add(rows, mode="promise_in_bounds"), None

        S, _ = jax.lax.scan(
            body, S,
            (u[: nc * chunk].reshape(nc, chunk),
             i[: nc * chunk].reshape(nc, chunk),
             w[: nc * chunk].reshape(nc, chunk)),
        )
        tail = n - nc * chunk
        if tail:
            S = S.at[u[nc * chunk:]].add(
                Y.at[i[nc * chunk:]].get(mode="promise_in_bounds")
                * w[nc * chunk:, None],
                mode="promise_in_bounds")
    return S * wvec[:, None]


def _scatter_pair_grads(A: jax.Array, Y_like: jax.Array, u: jax.Array,
                        i: jax.Array, w: jax.Array, wvec: jax.Array,
                        chunk: int, data_axes: tuple = ()) -> jax.Array:
    """gY[j] = sum over observed pairs (u, j) of |N(u)|^-1/2 * A_u —
    the transposed twin of ``implicit_sum``, chunked the same way."""
    gY = jnp.zeros_like(Y_like)
    if data_axes:
        gY = jax.lax.pcast(gY, data_axes, to="varying")
    n = u.shape[0]
    if chunk <= 0 or chunk >= n:
        rows = (A.at[u].get(mode="promise_in_bounds")
                * wvec.at[u].get(mode="promise_in_bounds")[:, None]
                * w[:, None])
        return gY.at[i].add(rows, mode="promise_in_bounds")
    nc = n // chunk

    def body(acc, sl):
        uu, ii, ww = sl
        rows = (A.at[uu].get(mode="promise_in_bounds")
                * wvec.at[uu].get(mode="promise_in_bounds")[:, None]
                * ww[:, None])
        return acc.at[ii].add(rows, mode="promise_in_bounds"), None

    gY, _ = jax.lax.scan(
        body, gY,
        (u[: nc * chunk].reshape(nc, chunk),
         i[: nc * chunk].reshape(nc, chunk),
         w[: nc * chunk].reshape(nc, chunk)),
    )
    tail = n - nc * chunk
    if tail:
        sl = slice(nc * chunk, None)
        rows = (A.at[u[sl]].get(mode="promise_in_bounds")
                * wvec.at[u[sl]].get(mode="promise_in_bounds")[:, None]
                * w[sl][:, None])
        gY = gY.at[i[sl]].add(rows, mode="promise_in_bounds")
    return gY


def svdpp_train(
    params: SVDppParams,
    u_all: jax.Array,  # (n_pad,) padded pair stream (also the y index)
    i_all: jax.Array,
    r_all: jax.Array,
    w_all: jax.Array,
    wvec: jax.Array,       # (Ucap,) |N(u)|^-1/2
    item_deg: jax.Array,   # (Icap,) pair count per item (for the y ridge)
    key: jax.Array,
    cfg: SGDConfig,
    n_epochs: int,
    lr_y: float,
    reg_y: float,
    batch_size: int,
    n_real: int,
) -> Tuple[SVDppParams, jax.Array]:
    """Train under the epoch-cached schedule (module docstring).  Returns
    (params, per-epoch train RMSE history)."""
    n_pad = u_all.shape[0]
    nb = n_pad // batch_size
    umask = jnp.asarray(sgd.update_mask(cfg, "user"))
    imask = jnp.asarray(sgd.update_mask(cfg, "item"))
    kp = params.user_features.shape[1]
    fmask = jnp.asarray((np.arange(kp) < cfg.n_factors).astype(np.float32))
    mu = params.global_mean

    def batch_step(carry, batch):
        P, Q, S, A, sse = carry
        u, i, r, w = batch
        pu = P.at[u].get(mode="promise_in_bounds")
        qi = Q.at[i].get(mode="promise_in_bounds")
        su = S.at[u].get(mode="promise_in_bounds")
        eff = pu + su
        pred = mu + jnp.einsum("nk,nk->n", eff, qi)
        e = (r - pred) * w
        sse = sse + jnp.sum(e * e)
        reg_w = (cfg.reg * w)[:, None]
        gp = (e[:, None] * qi - reg_w * pu) * umask[None, :]
        gq = (e[:, None] * eff - reg_w * qi) * imask[None, :]
        # G_u accumulates with the PRE-update q_i (read above)
        A = A.at[u].add(e[:, None] * qi * fmask[None, :],
                        mode="promise_in_bounds")
        P = P.at[u].add(cfg.lr * gp, mode="promise_in_bounds")
        Q = Q.at[i].add(cfg.lr * gq, mode="promise_in_bounds")
        return (P, Q, S, A, sse), None

    def epoch(carry, k):
        P, Q, Y = carry
        S = implicit_sum(Y, u_all, i_all, w_all, wvec, chunk=batch_size)
        perm = jax.random.permutation(k, n_pad)
        xs = (
            u_all[perm].reshape(nb, batch_size),
            i_all[perm].reshape(nb, batch_size),
            r_all[perm].reshape(nb, batch_size),
            w_all[perm].reshape(nb, batch_size),
        )
        A0 = jnp.zeros_like(P)
        (P, Q, _, A, sse), _ = jax.lax.scan(
            batch_step, (P, Q, S, A0, jnp.float32(0.0)), xs)
        # deferred y update: dL/dy_j = sum over observed pairs (u, j) of
        # |N(u)|^-1/2 * G_u, ridge applied once per pair appearance
        gY = _scatter_pair_grads(A, Y, u_all, i_all, w_all, wvec,
                                 chunk=batch_size)
        Y = Y + lr_y * (gY - reg_y * item_deg[:, None] * Y) * fmask[None, :]
        rmse = jnp.sqrt(sse / max(n_real, 1))
        return (P, Q, Y), rmse

    keys = jax.random.split(key, n_epochs)
    (P, Q, Y), hist = jax.lax.scan(
        epoch,
        (params.user_features, params.item_features,
         params.implicit_features),
        keys,
    )
    # refresh the materialized sums against the FINAL y table so the
    # serving view P + S reflects the last deferred update
    S = implicit_sum(Y, u_all, i_all, w_all, wvec, chunk=batch_size)
    return params._replace(user_features=P, item_features=Q,
                           implicit_features=Y,
                           user_implicit_sums=S), hist


# ---------------------------------------------------------------------------
# Tile-aggregated trainer (the roadmap's "route p/q through the
# segment_sgd tile machinery" lever)
# ---------------------------------------------------------------------------


# shared with ops/bpr.py — see segment_sgd's tile_batch_* helpers
_batch_xs = sgd.tile_batch_xs
_prim_onehot = sgd.tile_prim_onehot
_prim_gather = sgd.tile_prim_gather
_prim_scatter = sgd.tile_prim_scatter
_sec_scatter = sgd.tile_sec_scatter


def implicit_sum_batched(Y: jax.Array, data: sgd.RatingBatches,
                         wvec: jax.Array, data_axes: tuple = ()) -> jax.Array:
    """S = wvec * scatter_u(Y[i]) over user-primary batches: the S
    scatter rides the primary tile machinery (C/S-fold fewer row ops);
    the Y gather stays per-row (item side is unsorted in storage
    order — see segment_sgd.RatingBatches on why un-permuting an expand
    buys nothing).  ``data_axes`` marks the accumulator device-varying
    when called inside ``shard_map`` (it holds local user rows)."""
    xs, agg_prim, _ = _batch_xs(data, include_sec=False)
    S0 = jnp.zeros((wvec.shape[0], Y.shape[1]), Y.dtype)
    if data_axes:
        S0 = jax.lax.pcast(S0, data_axes, to="varying")

    def body(S, b):
        rows = Y.at[b["i"]].get(mode="promise_in_bounds") * b["w"][:, None]
        return _prim_scatter(S, rows, b, _prim_onehot(b, agg_prim),
                             agg_prim), None

    S, _ = jax.lax.scan(body, S0, xs)
    return S * wvec[:, None]


def _pair_grads_batched(A: jax.Array, Y_like: jax.Array,
                        data: sgd.RatingBatches, wvec: jax.Array,
                        expand_prim: bool,
                        data_axes: tuple = ()) -> jax.Array:
    """gY[j] = sum over observed pairs (u, j) of wvec_u * A_u, batched:
    A is pre-scaled by wvec ONCE at table level (no per-row scalar
    gathers), its rows ride the primary gather-expand, and the gY
    scatter rides the secondary (item-sorted) tiles.  ``data_axes``
    marks the accumulator device-varying inside ``shard_map`` (each
    device accumulates its rating shard's contribution; the caller
    psums)."""
    xs, agg_prim, agg_sec = _batch_xs(data)
    Aw = A * wvec[:, None]
    gY0 = jnp.zeros_like(Y_like)
    if data_axes:
        gY0 = jax.lax.pcast(gY0, data_axes, to="varying")

    def body(gY, b):
        rows = _prim_gather(Aw, b, _prim_onehot(b, agg_prim), agg_prim,
                            expand_prim) * b["w"][:, None]
        return _sec_scatter(gY, rows, b, agg_sec), None

    gY, _ = jax.lax.scan(body, gY0, xs)
    return gY


def svdpp_train_batched(
    params: SVDppParams,
    data: sgd.RatingBatches,
    wvec: jax.Array,       # (Ucap,) |N(u)|^-1/2
    item_deg: jax.Array,   # (Icap,) pair count per item (y ridge)
    key: jax.Array,
    cfg: SGDConfig,
    n_epochs: int,
    lr_y: float,
    reg_y: float,
) -> Tuple[SVDppParams, jax.Array]:
    """Tile-aggregated SVD++ under the epoch-cached schedule.

    Same objective/schedule as :func:`svdpp_train` (module docstring),
    different data layout: ``pack_ratings(order='user')`` batches, so
    the THREE user-side table ops per rating (P gather, P scatter,
    A scatter — plus the S gather) all ride ONE shared one-hot per batch
    on the MXU, and the Q-delta scatter rides the secondary tiles.  The
    per-epoch O(nnz) passes (S build, y gradient) reuse the same batch
    metadata.  Remaining per-row ops: the Q and Y gathers (2/rating).

    Epoch order: batch-order shuffle (the framework's standard layout-
    preserving shuffle, ``SGDConfig.shuffle='batch'``); with a single
    batch the trajectory is identical to the flat trainer's.
    """
    xs_all, agg_prim, agg_sec = _batch_xs(data)
    nb = data.user_ids.shape[0]
    expand = data.expand_prim
    umask = jnp.asarray(sgd.update_mask(cfg, "user"))
    imask = jnp.asarray(sgd.update_mask(cfg, "item"))
    kp = params.user_features.shape[1]
    fmask = jnp.asarray((np.arange(kp) < cfg.n_factors).astype(np.float32))
    mu = params.global_mean
    n_real = data.n_real

    def batch_step(carry, b):
        P, Q, S, A, sse = carry
        oh = _prim_onehot(b, agg_prim)
        pu = _prim_gather(P, b, oh, agg_prim, expand)
        su = _prim_gather(S, b, oh, agg_prim, expand)
        qi = Q.at[b["i"]].get(mode="promise_in_bounds")
        eff = pu + su
        e = (b["r"] - (mu + jnp.einsum("nk,nk->n", eff, qi))) * b["w"]
        sse = sse + jnp.sum(e * e)
        reg_w = (cfg.reg * b["w"])[:, None]
        gp = (e[:, None] * qi - reg_w * pu) * umask[None, :]
        gq = (e[:, None] * eff - reg_w * qi) * imask[None, :]
        A = _prim_scatter(A, e[:, None] * qi * fmask[None, :], b, oh,
                          agg_prim)
        P = _prim_scatter(P, cfg.lr * gp, b, oh, agg_prim)
        Q = _sec_scatter(Q, cfg.lr * gq, b, agg_sec)
        return (P, Q, S, A, sse), None

    def epoch(carry, k):
        P, Q, Y = carry
        S = implicit_sum_batched(Y, data, wvec)
        bperm = jax.random.permutation(k, nb)
        xs = {kk: v[bperm] for kk, v in xs_all.items()}
        A0 = jnp.zeros_like(P)
        (P, Q, _, A, sse), _ = jax.lax.scan(
            batch_step, (P, Q, S, A0, jnp.float32(0.0)), xs)
        gY = _pair_grads_batched(A, Y, data, wvec, expand)
        Y = Y + lr_y * (gY - reg_y * item_deg[:, None] * Y) * fmask[None, :]
        rmse = jnp.sqrt(sse / max(n_real, 1))
        return (P, Q, Y), rmse

    keys = jax.random.split(key, n_epochs)
    (P, Q, Y), hist = jax.lax.scan(
        epoch,
        (params.user_features, params.item_features,
         params.implicit_features),
        keys,
    )
    S = implicit_sum_batched(Y, data, wvec)
    return params._replace(user_features=P, item_features=Q,
                           implicit_features=Y,
                           user_implicit_sums=S), hist


_batched_cache: dict = {}


def jit_svdpp_train_batched(cfg: SGDConfig, n_epochs: int, lr_y: float,
                            reg_y: float):
    """Cached jit of the tile-aggregated trainer; RatingBatches' static
    fields (tile shapes, primary side) key further retraces."""
    key = (cfg, n_epochs, lr_y, reg_y)
    fn = _batched_cache.get(key)
    if fn is None:
        fn = jax.jit(
            lambda p, d, wv, deg, k: svdpp_train_batched(
                p, d, wv, deg, k, cfg, n_epochs, lr_y, reg_y,
            )
        )
        _batched_cache[key] = fn
    return fn


_train_cache: dict = {}


def jit_svdpp_train(cfg: SGDConfig, n_epochs: int, lr_y: float, reg_y: float,
                    batch_size: int, n_real: int, n_pad: int):
    key = (cfg, n_epochs, lr_y, reg_y, batch_size, n_real, n_pad)
    fn = _train_cache.get(key)
    if fn is None:
        fn = jax.jit(
            lambda p, u, i, r, w, wv, deg, k: svdpp_train(
                p, u, i, r, w, wv, deg, k, cfg, n_epochs, lr_y, reg_y,
                batch_size, n_real,
            )
        )
        _train_cache[key] = fn
    return fn


def user_refit(
    params: SVDppParams,
    u_all: jax.Array,
    i_all: jax.Array,
    r_all: jax.Array,
    w_all: jax.Array,
    wvec: jax.Array,
    key: jax.Array,
    cfg: SGDConfig,
    n_epochs: int,
    batch_size: int,
) -> SVDppParams:
    """``update_users``: P rows retrain against FROZEN Q and Y.  The
    cohort's implicit sums come from its own interactions (the rows were
    re-initialized, their history is the update set) and stay fixed —
    Y does not move, so S is computed once; the touched rows replace the
    stored ``user_implicit_sums`` so serving sees the cohort's sums."""
    n_pad = u_all.shape[0]
    nb = n_pad // batch_size
    umask = jnp.asarray(sgd.update_mask(cfg, "user"))
    mu = params.global_mean
    Q = params.item_features
    S = implicit_sum(params.implicit_features, u_all, i_all, w_all, wvec,
                     chunk=batch_size)

    def batch_step(P, batch):
        u, i, r, w = batch
        pu = P.at[u].get(mode="promise_in_bounds")
        qi = Q.at[i].get(mode="promise_in_bounds")
        su = S.at[u].get(mode="promise_in_bounds")
        pred = mu + jnp.einsum("nk,nk->n", pu + su, qi)
        e = (r - pred) * w
        gp = (e[:, None] * qi - (cfg.reg * w)[:, None] * pu) * umask[None, :]
        return P.at[u].add(cfg.lr * gp, mode="promise_in_bounds"), None

    def epoch(P, k):
        perm = jax.random.permutation(k, n_pad)
        xs = (
            u_all[perm].reshape(nb, batch_size),
            i_all[perm].reshape(nb, batch_size),
            r_all[perm].reshape(nb, batch_size),
            w_all[perm].reshape(nb, batch_size),
        )
        P, _ = jax.lax.scan(batch_step, P, xs)
        return P, None

    P, _ = jax.lax.scan(epoch, params.user_features,
                        jax.random.split(key, n_epochs))
    touched = jnp.zeros(P.shape[0], jnp.float32).at[u_all].max(
        w_all, mode="promise_in_bounds")
    S_new = jnp.where(touched[:, None] > 0, S, params.user_implicit_sums)
    return params._replace(user_features=P, user_implicit_sums=S_new)


def jit_dp_svdpp_train(cfg: SGDConfig, n_epochs: int, lr_y: float,
                       reg_y: float, batch_size: int, n_real: int,
                       mesh, overlap_psum: bool = False):
    """Cached jit of :func:`dp_svdpp_train` (mesh in the static key —
    repeated mesh fits of one shape reuse the trace)."""
    key = ("dp", cfg, n_epochs, lr_y, reg_y, batch_size, n_real, mesh,
           overlap_psum)
    fn = _train_cache.get(key)
    if fn is None:
        fn = jax.jit(
            lambda p, uu, ii, rr, ww, wv, dg, k: dp_svdpp_train(
                p, uu, ii, rr, ww, wv, dg, k, cfg, n_epochs, lr_y, reg_y,
                batch_size, n_real, mesh, overlap_psum=overlap_psum,
            )
        )
        _train_cache[key] = fn
    return fn


def dp_svdpp_train(
    params: SVDppParams,
    u_all: jax.Array,  # device-major LOCAL user ids (shard_ratings_by_user)
    i_all: jax.Array,
    r_all: jax.Array,
    w_all: jax.Array,
    wvec: jax.Array,      # (Ucap,) |N(u)|^-1/2, row-sharded like P
    item_deg: jax.Array,  # (Icap,) replicated
    key: jax.Array,
    cfg: SGDConfig,
    n_epochs: int,
    lr_y: float,
    reg_y: float,
    batch_size: int,
    n_real: int,
    mesh,
    overlap_psum: bool = False,
) -> Tuple[SVDppParams, jax.Array]:
    """Data-parallel SVD++ under ``shard_map`` — the same layout contract
    as ``parallel.distributed``: P (and S, and the A accumulator)
    row-sharded over the mesh's data axes with ratings pre-sharded by
    user range (every user-side op is local), Q and Y replicated.  Per
    epoch the collectives are the per-step ``psum`` of Q deltas (the one
    unavoidable collective of synchronous SGD, optionally one-step
    deferred via ``overlap_psum``) plus ONE ``psum`` of the (Icap, Kp)
    y-gradient — the deferred schedule means the implicit table costs a
    single extra all-reduce per epoch, not per step.  Replicas stay
    bit-identical; the per-device epoch shuffle folds the device index
    so the run is deterministic.
    """
    from jax.sharding import PartitionSpec as P
    from matrix_factorization_tpu.parallel.mesh import (
        data_axes_of, data_size_of, device_index,
    )

    data_axes = data_axes_of(mesh)
    n_pad_local = u_all.shape[0] // data_size_of(mesh)
    nb = n_pad_local // batch_size
    umask = jnp.asarray(sgd.update_mask(cfg, "user"))
    imask = jnp.asarray(sgd.update_mask(cfg, "item"))
    kp = params.user_features.shape[1]
    fmask = jnp.asarray((np.arange(kp) < cfg.n_factors).astype(np.float32))
    mu = params.global_mean

    def local_train(P_l, Q, Y, u_l, i_l, r_l, w_l, wv_l, deg, keys):
        dev = device_index(mesh)

        def batch_step(carry, batch):
            P_l, Q, S_l, A_l, dQ_pend, sse = carry
            u, i, r, w = batch
            if overlap_psum:
                Q_next = Q + jax.lax.psum(dQ_pend, data_axes)
            pu = P_l.at[u].get(mode="promise_in_bounds")
            qi = Q.at[i].get(mode="promise_in_bounds")
            su = S_l.at[u].get(mode="promise_in_bounds")
            eff = pu + su
            e = (r - (mu + jnp.einsum("nk,nk->n", eff, qi))) * w
            sse = sse + jnp.sum(e * e)
            reg_w = (cfg.reg * w)[:, None]
            gp = (e[:, None] * qi - reg_w * pu) * umask[None, :]
            gq = (e[:, None] * eff - reg_w * qi) * imask[None, :]
            A_l = A_l.at[u].add(e[:, None] * qi * fmask[None, :],
                                mode="promise_in_bounds")
            P_l = P_l.at[u].add(cfg.lr * gp, mode="promise_in_bounds")
            dQ = jnp.zeros_like(Q).at[i].add(cfg.lr * gq,
                                             mode="promise_in_bounds")
            if overlap_psum:
                return (P_l, Q_next, S_l, A_l, dQ, sse), None
            Q = Q + jax.lax.psum(dQ, data_axes)
            return (P_l, Q, S_l, A_l, dQ_pend, sse), None

        def epoch(carry, k):
            P_l, Q, Y = carry
            S_l = implicit_sum(Y, u_l, i_l, w_l, wv_l, chunk=batch_size,
                               data_axes=data_axes)
            k = jax.random.fold_in(k, dev)
            perm = jax.random.permutation(k, n_pad_local)
            xs = (
                u_l[perm].reshape(nb, batch_size),
                i_l[perm].reshape(nb, batch_size),
                r_l[perm].reshape(nb, batch_size),
                w_l[perm].reshape(nb, batch_size),
            )
            dq0 = jax.lax.pcast(jnp.zeros_like(Q), data_axes, to="varying")
            sse0 = jax.lax.pcast(jnp.float32(0.0), data_axes, to="varying")
            A0 = jnp.zeros_like(P_l)
            (P_l, Q, _, A_l, dq, sse), _ = jax.lax.scan(
                batch_step, (P_l, Q, S_l, A0, dq0, sse0), xs)
            if overlap_psum:
                Q = Q + jax.lax.psum(dq, data_axes)
            gY_l = _scatter_pair_grads(A_l, Y, u_l, i_l, w_l, wv_l,
                                       chunk=batch_size,
                                       data_axes=data_axes)
            gY = jax.lax.psum(gY_l, data_axes)
            Y = Y + lr_y * (gY - reg_y * deg[:, None] * Y) * fmask[None, :]
            rmse = jnp.sqrt(jax.lax.psum(sse, data_axes) / max(n_real, 1))
            return (P_l, Q, Y), rmse

        (P_l, Q, Y), hist = jax.lax.scan(epoch, (P_l, Q, Y), keys)
        S_l = implicit_sum(Y, u_l, i_l, w_l, wv_l, chunk=batch_size,
                           data_axes=data_axes)
        return P_l, Q, Y, S_l, hist

    shard = P(data_axes)
    rep = P()
    fn = jax.shard_map(
        local_train, mesh=mesh,
        in_specs=(shard, rep, rep, shard, shard, shard, shard, shard, rep,
                  rep),
        out_specs=(shard, rep, rep, shard, rep),
    )
    keys = jax.random.split(key, n_epochs)
    P_new, Q_new, Y_new, S_new, hist = fn(
        params.user_features, params.item_features,
        params.implicit_features, u_all, i_all, r_all, w_all, wvec,
        item_deg, keys,
    )
    return params._replace(user_features=P_new, item_features=Q_new,
                           implicit_features=Y_new,
                           user_implicit_sums=S_new), hist


def dp_svdpp_train_batched(
    params: SVDppParams,
    data: sgd.RatingBatches,  # dev-sharded user-primary pack (LOCAL ids)
    wvec: jax.Array,          # (Ucap,) |N(u)|^-1/2, row-sharded like P
    item_deg: jax.Array,      # (Icap,) replicated
    key: jax.Array,
    cfg: SGDConfig,
    n_epochs: int,
    lr_y: float,
    reg_y: float,
    mesh,
    overlap_psum: bool = False,
    psum_every: int = 1,
) -> Tuple[SVDppParams, jax.Array]:
    """Data-parallel SVD++ riding the MXU tile machinery (VERDICT r3 #5).

    Same layout contract as :func:`dp_svdpp_train` (P/S/A row-sharded
    over the data axes with LOCAL user ids, Q and Y replicated), but
    each local step is the tile-aggregated :func:`svdpp_train_batched`
    step: the P gather, P scatter, S gather and A scatter share one
    one-hot per batch, and the Q-delta scatter rides the secondary
    tiles.  Per epoch the collectives are one Q-delta ``psum`` per
    ``psum_every``-step window (reads up to T steps stale within a
    window — the framework's windowed regime) plus ONE psum'd (Icap, Kp)
    y-gradient; ``overlap_psum`` defers each window's all-reduce behind
    the next window's compute.  S is epoch-frozen exactly as in the
    single-device batched trainer.
    """
    from jax.sharding import PartitionSpec as P
    from matrix_factorization_tpu.parallel.distributed import (
        _check_psum_every,
    )
    from matrix_factorization_tpu.parallel.mesh import (
        data_axes_of, data_size_of, device_index,
    )

    data_axes = data_axes_of(mesh)
    n_dev = data_size_of(mesh)
    nb_local = data.user_ids.shape[0] // n_dev
    n_real = data.n_real
    T = _check_psum_every(psum_every, nb_local)
    n_win = nb_local // T
    umask = jnp.asarray(sgd.update_mask(cfg, "user"))
    imask = jnp.asarray(sgd.update_mask(cfg, "item"))
    kp = params.user_features.shape[1]
    fmask = jnp.asarray((np.arange(kp) < cfg.n_factors).astype(np.float32))
    mu = params.global_mean

    def local_train(P_l, Q, Y, ldata, wv_l, deg, keys):
        dev = device_index(mesh)
        xs_all, agg_prim, agg_sec = _batch_xs(ldata)
        expand = ldata.expand_prim

        def make_step(S_l):
            def step_acc(c, b, Q_read):
                P_l, A_l, dQ, sse = c
                oh = _prim_onehot(b, agg_prim)
                pu = _prim_gather(P_l, b, oh, agg_prim, expand)
                su = _prim_gather(S_l, b, oh, agg_prim, expand)
                qi = Q_read.at[b["i"]].get(mode="promise_in_bounds")
                eff = pu + su
                e = (b["r"] - (mu + jnp.einsum("nk,nk->n", eff, qi))
                     ) * b["w"]
                sse = sse + jnp.sum(e * e)
                reg_w = (cfg.reg * b["w"])[:, None]
                gp = (e[:, None] * qi - reg_w * pu) * umask[None, :]
                gq = (e[:, None] * eff - reg_w * qi) * imask[None, :]
                A_l = _prim_scatter(A_l, e[:, None] * qi * fmask[None, :],
                                    b, oh, agg_prim)
                P_l = _prim_scatter(P_l, cfg.lr * gp, b, oh, agg_prim)
                dQ = _sec_scatter(dQ, cfg.lr * gq, b, agg_sec)
                return P_l, A_l, dQ, sse

            return step_acc

        def dq0(q):
            return jax.lax.pcast(jnp.zeros_like(q), data_axes,
                                 to="varying")

        def epoch(carry, k):
            P_l, Q, Y = carry
            S_l = implicit_sum_batched(Y, ldata, wv_l,
                                       data_axes=data_axes)
            step_acc = make_step(S_l)
            k = jax.random.fold_in(k, dev)
            bperm = jax.random.permutation(k, nb_local)
            xs = {kk: v[bperm] for kk, v in xs_all.items()}
            xs = jax.tree.map(
                lambda a: a.reshape(n_win, T, *a.shape[1:]), xs)
            A0 = jnp.zeros_like(P_l)
            sse0 = jax.lax.pcast(jnp.float32(0.0), data_axes,
                                 to="varying")
            if overlap_psum:

                def window(c, xw):
                    p, q, a, dq_pend, sse = c
                    q_next = q + jax.lax.psum(dq_pend, data_axes)
                    (p, a, dq, sse), _ = jax.lax.scan(
                        lambda ic, b: (step_acc(ic, b, q), None),
                        (p, a, dq0(q), sse), xw)
                    return (p, q_next, a, dq, sse), None

                (P_l, Q, A_l, dq, sse), _ = jax.lax.scan(
                    window, (P_l, Q, A0, dq0(Q), sse0), xs)
                Q = Q + jax.lax.psum(dq, data_axes)
            else:

                def window(c, xw):
                    p, q, a, sse = c
                    (p, a, dq, sse), _ = jax.lax.scan(
                        lambda ic, b: (step_acc(ic, b, q), None),
                        (p, a, dq0(q), sse), xw)
                    return (p, q + jax.lax.psum(dq, data_axes), a,
                            sse), None

                (P_l, Q, A_l, sse), _ = jax.lax.scan(
                    window, (P_l, Q, A0, sse0), xs)
            gY_l = _pair_grads_batched(A_l, Y, ldata, wv_l, expand,
                                       data_axes=data_axes)
            gY = jax.lax.psum(gY_l, data_axes)
            Y = Y + lr_y * (gY - reg_y * deg[:, None] * Y) * fmask[None, :]
            rmse = jnp.sqrt(jax.lax.psum(sse, data_axes) / max(n_real, 1))
            return (P_l, Q, Y), rmse

        (P_l, Q, Y), hist = jax.lax.scan(epoch, (P_l, Q, Y), keys)
        S_l = implicit_sum_batched(Y, ldata, wv_l, data_axes=data_axes)
        return P_l, Q, Y, S_l, hist

    shard = P(data_axes)
    rep = P()
    fn = jax.shard_map(
        local_train, mesh=mesh,
        in_specs=(shard, rep, rep, shard, shard, rep, rep),
        out_specs=(shard, rep, rep, shard, rep),
    )
    keys = jax.random.split(key, n_epochs)
    P_new, Q_new, Y_new, S_new, hist = fn(
        params.user_features, params.item_features,
        params.implicit_features, data, wvec, item_deg, keys,
    )
    return params._replace(user_features=P_new, item_features=Q_new,
                           implicit_features=Y_new,
                           user_implicit_sums=S_new), hist


def jit_dp_svdpp_train_batched(cfg: SGDConfig, n_epochs: int, lr_y: float,
                               reg_y: float, mesh,
                               overlap_psum: bool = False,
                               psum_every: int = 1):
    """Cached jit of :func:`dp_svdpp_train_batched`."""
    key = ("dpt", cfg, n_epochs, lr_y, reg_y, mesh, overlap_psum,
           psum_every)
    fn = _train_cache.get(key)
    if fn is None:
        fn = jax.jit(
            lambda p, d, wv, dg, k: dp_svdpp_train_batched(
                p, d, wv, dg, k, cfg, n_epochs, lr_y, reg_y, mesh,
                overlap_psum=overlap_psum, psum_every=psum_every,
            )
        )
        _train_cache[key] = fn
    return fn


_refit_cache: dict = {}


def jit_user_refit(cfg: SGDConfig, n_epochs: int, batch_size: int,
                   n_pad: int):
    key = (cfg, n_epochs, batch_size, n_pad)
    fn = _refit_cache.get(key)
    if fn is None:
        fn = jax.jit(
            lambda p, u, i, r, w, wv, k: user_refit(
                p, u, i, r, w, wv, k, cfg, n_epochs, batch_size,
            )
        )
        _refit_cache[key] = fn
    return fn


