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

    When tile-aggregation metadata is present (the default), each batch is
    stored sorted by item id and carries, per side, tile bases plus a
    user-sort permutation, letting the minibatch step replace the two
    per-row scatters (~6ns/row on v5e, the round-1 throughput ceiling)
    with per-tile one-hot einsums on the MXU and a C/S-times-smaller
    block scatter.  ``agg_item``/``agg_user`` are static ``(S, C)`` tile
    shapes; ``(0, 0)`` disables that side.
    """

    user_ids: jax.Array  # (nb, bs) int32
    item_ids: jax.Array  # (nb, bs) int32
    ratings: jax.Array  # (nb, bs) f32
    weights: jax.Array  # (nb, bs) f32, 1.0 real / 0.0 pad
    n_real: int = struct.field(pytree_node=False)
    item_tile_base: Optional[jax.Array] = None  # (nb, bs/S_i) int32
    user_ids_sorted: Optional[jax.Array] = None  # (nb, bs) int32
    user_perm: Optional[jax.Array] = None  # (nb, bs) int32
    user_tile_base: Optional[jax.Array] = None  # (nb, bs/S_u) int32
    agg_item: Tuple[int, int] = struct.field(pytree_node=False, default=(0, 0))
    agg_user: Tuple[int, int] = struct.field(pytree_node=False, default=(0, 0))


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


_SCATTER_NS_PER_ROW = 6.0  # measured v5e (benchmarks/micro_rowops.py)
_EINSUM_NS_PER_ENTRY_COL = 0.0013  # K=128 MAC on MXU, f32
_ONEHOT_NS_PER_ENTRY_COL = 0.0005  # one-hot build (fused into the einsum)


_TILE_CANDIDATES = (2048, 1024, 512, 256, 128)  # large-to-small


def _tile_meta(
    ids_2d: np.ndarray, bs: int, c_max: int, max_id: int,
    min_gain: float = 0.2, row_width: int = 128,
) -> Optional[Tuple[np.ndarray, int, int]]:
    """Pick the (S, C) tile shape minimizing the modeled update cost for
    per-row-SORTED ``ids_2d`` (nb, bs); returns (tile_bases, S, C) or None
    when a plain scatter is modeled cheaper (or the id space is tiny).
    ``min_gain`` is the required modeled advantage over the plain scatter
    (negative forces tiling on, for tests)."""
    best = None
    best_cost = _SCATTER_NS_PER_ROW * bs * (1.0 - min_gain)
    for S in _TILE_CANDIDATES:
        if bs % S or S > bs:
            continue
        tiles = ids_2d.reshape(ids_2d.shape[0], -1, S)
        span = int((tiles[:, :, -1] - tiles[:, :, 0]).max()) + 1
        C = round_up(span, 32)
        if C > c_max or C > max_id + 1:
            continue
        # einsum work scales with the row width; one-hot build does not
        cost = (bs // S) * C * _SCATTER_NS_PER_ROW + bs * C * (
            _EINSUM_NS_PER_ENTRY_COL * (row_width / 128.0)
            + _ONEHOT_NS_PER_ENTRY_COL
        )
        # require a strict 3% gain to move to a smaller tile: on ties,
        # larger tiles win empirically (fewer, wider scatter blocks)
        if cost < best_cost * (0.97 if best is not None else 1.0):
            best_cost = cost
            base = np.minimum(tiles[:, :, 0], max_id + 1 - C).astype(np.int32)
            best = (base, S, C)
    return best


def pack_ratings(
    user_ids: np.ndarray,
    item_ids: np.ndarray,
    ratings: np.ndarray,
    batch_size: int,
    shuffle_seed: Optional[int] = 0,
    order: str = "shuffle",
    aggregate: bool = True,
    c_max: int = 512,
    agg_min_gain: float = 0.2,
    item_sort_chunks: int = 8,
    row_width: int = 128,
) -> RatingBatches:
    """Host-side packing into (nb, bs) blocks, pre-shuffled once.

    ``order='item'`` splits the (shuffled) stream into
    ``item_sort_chunks`` chunks and sorts each by item id, so batches
    cover narrow item windows (tiny aggregation tiles) while every item
    still receives multiple spread-out updates per epoch — a full sort
    collapses each item to one update/epoch and measurably degrades
    fixed-epoch RMSE.  ``order='user'`` is the symmetric layout (narrow
    USER windows — better when the user axis is the bigger id space);
    ``order='auto'`` picks the side with more ids.  Visit order still
    deviates from the reference's random shuffle; oracle parity is
    regression-tested
    (``tests/test_parity_oracle.py::test_item_order_rmse_parity_vs_oracle``).
    ``aggregate`` precomputes the per-batch tile metadata (in-batch
    item sort + user sort permutation); within-batch order is
    irrelevant to the summed minibatch update, so this never changes
    semantics beyond float summation order.
    """
    n = int(len(ratings))
    if shuffle_seed is not None and n > 1:
        perm = np.random.default_rng(shuffle_seed).permutation(n)
        user_ids, item_ids, ratings = (
            user_ids[perm], item_ids[perm], ratings[perm],
        )
    if order == "auto" and n > 0:
        order = "user" if int(user_ids.max()) > int(item_ids.max()) else "item"
    elif order == "auto":
        order = "item"
    if order not in ("shuffle", "item", "user"):
        raise ValueError(f"unknown pack order {order!r}")
    n_pad = max(batch_size, round_up(n, batch_size))
    pad = n_pad - n
    nb = n_pad // batch_size
    # pads resample the TAIL of the real stream cyclically (weight 0 makes
    # them no-ops): they follow the local id distribution of the chunk
    # they land in, so the pad-heavy last batch keeps the same sorted-tile
    # spans as full batches instead of leaving its few real ids spread
    # thin (which would blow up the C bound)
    tail = min(n, max(pad, 1))
    pad_u = (np.resize(user_ids[n - tail:].astype(np.int32), pad) if n
             else np.zeros(pad, np.int32))
    pad_i = (np.resize(item_ids[n - tail:].astype(np.int32), pad) if n
             else np.zeros(pad, np.int32))
    u = np.concatenate([user_ids.astype(np.int32), pad_u])
    i = np.concatenate([item_ids.astype(np.int32), pad_i])
    r = np.concatenate([ratings.astype(np.float32), np.zeros(pad, np.float32)])
    w = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    if order in ("item", "user") and n > 1:
        # sort whole-batch chunks by the chosen id: chunk bounds are batch
        # boundaries, so no aggregation tile ever straddles two chunks
        # (a mixed tile would span the whole id space and disable the
        # tile path); pads carry weight 0, sorting them in is harmless
        sort_key = i if order == "item" else u
        chunks = max(1, min(item_sort_chunks, nb))
        for lo_b in range(0, nb, -(-nb // chunks)):
            lo = lo_b * batch_size
            hi = min(lo + -(-nb // chunks) * batch_size, n_pad)
            srt = np.argsort(sort_key[lo:hi], kind="stable")
            u[lo:hi] = u[lo:hi][srt]
            i[lo:hi] = i[lo:hi][srt]
            r[lo:hi] = r[lo:hi][srt]
            w[lo:hi] = w[lo:hi][srt]
    u = u.reshape(nb, batch_size)
    i = i.reshape(nb, batch_size)
    r = r.reshape(nb, batch_size)
    w = w.reshape(nb, batch_size)

    kw: dict = {}
    agg_item = agg_user = (0, 0)
    if aggregate and n > 0:
        # store each batch item-sorted; the item side then needs no perm
        isort = np.argsort(i, axis=1, kind="stable")
        u = np.take_along_axis(u, isort, axis=1)
        i = np.take_along_axis(i, isort, axis=1)
        r = np.take_along_axis(r, isort, axis=1)
        w = np.take_along_axis(w, isort, axis=1)
        mi = _tile_meta(i, batch_size, c_max, int(i.max()), agg_min_gain,
                        row_width)
        if mi is not None:
            kw["item_tile_base"] = jnp.asarray(mi[0])
            agg_item = (mi[1], mi[2])
        usort = np.argsort(u, axis=1, kind="stable").astype(np.int32)
        us = np.take_along_axis(u, usort, axis=1)
        mu_ = _tile_meta(us, batch_size, c_max, int(u.max()), agg_min_gain,
                         row_width)
        if mu_ is not None:
            kw["user_ids_sorted"] = jnp.asarray(us)
            kw["user_perm"] = jnp.asarray(usort)
            kw["user_tile_base"] = jnp.asarray(mu_[0])
            agg_user = (mu_[1], mu_[2])

    return RatingBatches(
        jnp.asarray(u),
        jnp.asarray(i),
        jnp.asarray(r),
        jnp.asarray(w),
        n,
        agg_item=agg_item,
        agg_user=agg_user,
        **kw,
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
# Tile-aggregated updates (MXU one-hot einsum instead of per-row scatter)
# ---------------------------------------------------------------------------


def _tile_scatter_add(
    table: jax.Array,
    rows: jax.Array,
    ids_sorted: jax.Array,
    tile_base: jax.Array,
    S: int,
    C: int,
) -> jax.Array:
    """``table.at[ids_sorted].add(rows)`` for per-tile-sorted ids.

    Each tile of ``S`` consecutive (sorted) entries spans < ``C`` ids, so
    its row deltas collapse onto a (C, width) block via a one-hot matmul
    on the MXU, and only ``C/S`` as many rows hit the XLA scatter (the
    ~6ns/row bottleneck).  Bases are pre-clamped so ``base + C`` never
    exceeds the id space; one-hot columns past a tile's actual ids are
    all-zero, so the extra block rows add exact zeros.
    """
    bs, kp = rows.shape
    T = bs // S
    lidx = ids_sorted.reshape(T, S) - tile_base[:, None]
    oh = (
        lidx[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
    ).astype(rows.dtype)
    agg = jnp.einsum(
        "tsc,tsk->tck", oh, rows.reshape(T, S, kp),
        preferred_element_type=jnp.float32,
    )
    idx = (tile_base[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :])
    return table.at[idx.reshape(-1)].add(
        agg.reshape(-1, kp), mode="promise_in_bounds"
    )


def _minibatch_update(
    params: MFParams,
    b: dict,
    cfg: SGDConfig,
    lr,
    agg_item: Tuple[int, int],
    agg_user: Tuple[int, int],
) -> MFParams:
    """One synchronous mini-batch update; per-side scatter or tile path."""
    u, i, r, w = b["u"], b["i"], b["r"], b["w"]
    pu = params.user_features.at[u].get(mode="promise_in_bounds")
    qi = params.item_features.at[i].get(mode="promise_in_bounds")
    pred, d_pu, d_qi = ext_forward_and_rowgrads(cfg, params.global_mean, pu, qi)
    err = (pred - r) * w

    new = params
    if cfg.update_user_params:
        umask = jnp.asarray(update_mask(cfg, "user"))
        g = (err[:, None] * d_pu + (cfg.reg * w)[:, None] * pu) * umask[None, :]
        if "ub" in b:
            new = new._replace(
                user_features=_tile_scatter_add(
                    new.user_features, (-lr * g)[b["up"]], b["us"], b["ub"],
                    *agg_user,
                )
            )
        else:
            new = new._replace(
                user_features=new.user_features.at[u].add(
                    -lr * g, mode="promise_in_bounds"
                )
            )
    if cfg.update_item_params:
        imask = jnp.asarray(update_mask(cfg, "item"))
        g = (err[:, None] * d_qi + (cfg.reg * w)[:, None] * qi) * imask[None, :]
        if "ib" in b:
            new = new._replace(
                item_features=_tile_scatter_add(
                    new.item_features, -lr * g, i, b["ib"], *agg_item,
                )
            )
        else:
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
    xs = {
        "u": data.user_ids, "i": data.item_ids,
        "r": data.ratings, "w": data.weights,
    }
    agg_item = agg_user = (0, 0)
    if cfg.shuffle != "full" and cfg.aggregate != "none":
        if data.agg_item[1] and cfg.update_item_params:
            xs["ib"] = data.item_tile_base
            agg_item = data.agg_item
        if data.agg_user[1] and cfg.update_user_params:
            xs["us"] = data.user_ids_sorted
            xs["up"] = data.user_perm
            xs["ub"] = data.user_tile_base
            agg_user = data.agg_user

    if cfg.shuffle == "full":
        n_pad = nb * cfg.batch_size
        perm = jax.random.permutation(key, n_pad)
        xs = {
            k: v.reshape(-1)[perm].reshape(nb, cfg.batch_size)
            for k, v in xs.items()
        }
    elif cfg.shuffle == "batch":
        bperm = jax.random.permutation(key, nb)
        xs = {k: v[bperm] for k, v in xs.items()}
    elif cfg.shuffle != "none":
        raise ValueError(f"unknown shuffle {cfg.shuffle!r}")

    def body(p, batch):
        return _minibatch_update(p, batch, cfg, lr, agg_item, agg_user), None

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
