"""Data- and model-parallel segment-SGD over a device mesh.

Two trainers: ``dp_fit`` (P sharded, Q replicated — fastest when the
catalog fits one device) and ``dp_tp_fit`` (BOTH tables sharded over a 2D
(data x model) mesh with cell-partitioned ratings — catalogs bigger than
one device's HBM, SURVEY §2.4).

``dp_fit`` layout:

* **P (extended user rows, bias folded) is row-sharded** over the ``data``
  axis; ratings are pre-sharded by user range so every P update is local to
  its device — zero communication on the user side.
* **Q (extended item rows) is replicated**; each device scatter-adds its
  batch's item deltas into a zeros table and the deltas are ``psum``'d
  over ICI each step, keeping replicas bit-identical (synchronous
  mini-batch SGD with global batch = n_devices x local batch).
* Per-epoch RMSE is a ``psum`` of local masked SSE.

The reference's counterpart is ``_sgd``'s sequential loop
(``kernel_matrix_factorization.py:320-445``); there is deliberately no
NCCL/MPI analogue — collectives are XLA ops inside ``shard_map``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops import segment_sgd as sgd
from matrix_factorization_tpu.ops.segment_sgd import MFParams, round_up
from matrix_factorization_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_axes_of,
)


class ShardedRatings(NamedTuple):
    """Device-major rating stream: leading dim = n_dev * n_pad_local."""

    user_ids: jax.Array  # int32, user ids LOCAL to the owning device
    item_ids: jax.Array  # int32, global item ids
    ratings: jax.Array
    weights: jax.Array

    @property
    def total_len(self) -> int:
        return self.user_ids.shape[0]


# shared with the host packers in ops/segment_sgd.py
_sort_stream_by_key = sgd.sort_stream_by_key


def dp_fit_plumbing(u: np.ndarray, i: np.ndarray, r: np.ndarray,
                    n_users: int, mesh: Mesh, batch_size: int):
    """Shared host plumbing for every dp model fit (KernelMF, BPR,
    SVD++): capacity rounding, device-major user-range sharding, and
    the (data-sharded, replicated) NamedShardings the trainers expect.

    Returns ``(ucap, bs, (su, si, sr, sw), shard, rep)``.
    """
    from matrix_factorization_tpu.parallel.mesh import data_size_of

    mesh_data = data_size_of(mesh)
    ucap = round_up(n_users, 8 * mesh_data)
    bs = min(batch_size, max(1, len(u)))
    su, si, sr, sw, _ = shard_ratings_by_user(
        u.astype(np.int32), i.astype(np.int32), r.astype(np.float32),
        ucap, mesh_data, bs,
    )
    shard = NamedSharding(mesh, P(data_axes_of(mesh)))
    rep = NamedSharding(mesh, P())
    return ucap, bs, (su, si, sr, sw), shard, rep


def shard_ratings_by_user(
    u: np.ndarray,
    i: np.ndarray,
    r: np.ndarray,
    user_capacity: int,
    n_dev: int,
    batch_size: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Partition ratings so device d owns users [d*U/D, (d+1)*U/D).

    Returns device-major (u_local, i, r, w) plus the per-device padded
    length.  All devices are padded to the max shard size rounded up to a
    whole number of batches, so shapes are static and identical.
    """
    assert user_capacity % n_dev == 0
    users_per_dev = user_capacity // n_dev
    dev = (u // users_per_dev).astype(np.int32)
    counts = np.bincount(dev, minlength=n_dev)
    u, i, r = _sort_stream_by_key(dev, u, i, r, n_dev)
    n_pad = max(batch_size, round_up(int(counts.max()), batch_size))

    uu = np.zeros((n_dev, n_pad), np.int32)
    ii = np.zeros((n_dev, n_pad), np.int32)
    rr = np.zeros((n_dev, n_pad), np.float32)
    ww = np.zeros((n_dev, n_pad), np.float32)
    start = 0
    for d in range(n_dev):
        c = int(counts[d])
        sl = slice(start, start + c)
        uu[d, :c] = u[sl] - d * users_per_dev
        ii[d, :c] = i[sl]
        rr[d, :c] = r[sl]
        ww[d, :c] = 1.0
        start += c
    return uu.reshape(-1), ii.reshape(-1), rr.reshape(-1), ww.reshape(-1), n_pad


def _flat_step_acc(carry, batch, Q_read, mu, cfg: SGDConfig, lr):
    """One local step reading a window-FROZEN item table.

    User rows update in place on the local P shard (always fresh — they
    are device-local by the user-range partition); item deltas accumulate
    into the carried ``dQ`` table.  No collective here: the window driver
    (:func:`_windowed_epoch`) psums ``dQ`` once per ``psum_every`` steps,
    so the full-table zero/add/all-reduce traffic that previously ran
    EVERY step is amortized across the window.  Within a window the item
    side reads the table as of the last flush — the stale-read regime
    whose parity budget the multi-step batching study characterized
    (benchmarks/config3_multistep.py)."""
    P_l, dQ = carry
    u, i, r, w = batch
    pu = P_l.at[u].get(mode="promise_in_bounds")
    qi = Q_read.at[i].get(mode="promise_in_bounds")
    pred, d_pu, d_qi = sgd.ext_forward_and_rowgrads(cfg, mu, pu, qi)
    err = (pred - r) * w

    if cfg.update_user_params:
        umask = jnp.asarray(sgd.update_mask(cfg, "user"))
        g = (err[:, None] * d_pu + (cfg.reg * w)[:, None] * pu) * umask[None, :]
        P_l = P_l.at[u].add(-lr * g, mode="promise_in_bounds")
    if cfg.update_item_params:
        imask = jnp.asarray(sgd.update_mask(cfg, "item"))
        g = (err[:, None] * d_qi + (cfg.reg * w)[:, None] * qi) * imask[None, :]
        dQ = dQ.at[i].add(-lr * g, mode="promise_in_bounds")
    return P_l, dQ


def _windowed_epoch(carry, xs, n_win, step_acc, data_axes, overlap: bool,
                    update_items: bool):
    """Drive one epoch as ``n_win`` windows over pre-windowed leaves.

    ``xs`` leaves must have leading dims ``(n_win, T, ...)``; ``step_acc``
    is ``(P_l, dQ), b, Q_read -> (P_l, dQ)`` — a local step that reads a
    frozen item table and accumulates item deltas.  Per window: ONE
    zeros-init of the delta table, T accumulate steps, ONE item-delta
    psum.  ``overlap=True`` defers each window's psum to the start of the
    NEXT window so the all-reduce's only consumer is the next window's
    carry and XLA's async collective pair can hide it behind that
    window's compute; remote (and own) item updates then land up to 2T
    steps late instead of T.  Pending deltas are always flushed before
    this returns, so per-epoch RMSE sees fully-applied tables and the
    T=1, overlap=False case is exactly the synchronous schedule.
    """
    P_l, Q, mu = carry
    if not update_items:
        def win_frozen(p, xw):
            (p, _), _ = jax.lax.scan(
                lambda ic, b: (step_acc(ic, b, Q), None),
                (p, jnp.zeros((0,), Q.dtype)), xw)
            return p, None
        P_l, _ = jax.lax.scan(win_frozen, P_l, xs)
        return (P_l, Q, mu)

    def dq0(q):
        return jax.lax.pcast(jnp.zeros_like(q), data_axes, to="varying")

    if overlap:
        def window(c, xw):
            p, q, dq_pend = c
            q_next = q + jax.lax.psum(dq_pend, data_axes)
            (p, dq), _ = jax.lax.scan(
                lambda ic, b: (step_acc(ic, b, q), None), (p, dq0(q)), xw)
            return (p, q_next, dq), None

        (P_l, Q, dq), _ = jax.lax.scan(window, (P_l, Q, dq0(Q)), xs)
        Q = Q + jax.lax.psum(dq, data_axes)
    else:
        def window(c, xw):
            p, q = c
            (p, dq), _ = jax.lax.scan(
                lambda ic, b: (step_acc(ic, b, q), None), (p, dq0(q)), xw)
            return (p, q + jax.lax.psum(dq, data_axes)), None

        (P_l, Q), _ = jax.lax.scan(window, (P_l, Q), xs)
    return (P_l, Q, mu)


def _check_psum_every(psum_every, nb: int) -> int:
    """Validate/resolve the per-window step count against nb batches.

    ``'auto'`` picks the largest divisor of ``nb`` that is <= 16: deep
    enough to amortize the full-table delta traffic to ~1/16 per step,
    shallow enough that the stale-read window (T x batch_size ratings)
    stays well inside the drift budget the multi-step batching study
    measured (benchmarks/config3_multistep.py).  ``'epoch'`` = one psum
    per epoch."""
    if psum_every == "epoch":
        return nb
    if psum_every == "auto":
        t = min(nb, 16)
        while nb % t:
            t -= 1
        return t
    if not isinstance(psum_every, int) or psum_every < 1:
        raise ValueError(
            "psum_every must be a positive int, 'auto' or 'epoch', "
            f"got {psum_every!r}")
    if nb % psum_every:
        raise ValueError(
            f"psum_every={psum_every} must divide the {nb} local batches "
            f"per epoch (pad the stream or pick a divisor — e.g. "
            f"{max(d for d in range(1, psum_every + 1) if nb % d == 0)})")
    return psum_every


def _local_sse(P_l, Q, mu, u, i, r, w, cfg: SGDConfig):
    """Local-shard SSE, batched to bound the gather working set: a flat
    gather over the whole local stream materializes (n_pad_local, Kp)
    rows — 2 x 12GB at ML-25M scale, an instant HBM OOM."""
    n = u.shape[0]
    nb = n // cfg.batch_size if n % cfg.batch_size == 0 and n >= cfg.batch_size else 1
    xs = tuple(x.reshape(nb, -1) for x in (u, i, r, w))

    def body(_, b):
        ub, ib, rb, wb = b
        pred = sgd.ext_forward(
            cfg, mu,
            P_l.at[ub].get(mode="promise_in_bounds"),
            Q.at[ib].get(mode="promise_in_bounds"),
        )
        e = (pred - rb) * wb
        return None, jnp.sum(e * e)

    _, sses = jax.lax.scan(body, None, xs)
    return jnp.sum(sses)


def dp_sgd_train(
    params: MFParams,
    data: ShardedRatings,
    key: jax.Array,
    cfg: SGDConfig,
    n_epochs: int,
    lr: float,
    mesh: Mesh,
    n_real: int,
    overlap_psum: bool = False,
    psum_every: int = 1,
) -> Tuple[MFParams, jax.Array]:
    """Multi-epoch data-parallel training under ``shard_map``.

    ``params.user_features`` must be placed row-sharded over ``data``;
    the item table replicated; ``data`` arrays device-major row-sharded.
    On a multi-slice mesh the user shard spans ``(slice, data)``.

    ``psum_every=T`` accumulates item deltas locally across T steps and
    crosses the mesh in ONE psum per window (``'epoch'`` = once per
    epoch): the full-table zero/add/all-reduce that dominates the dp
    step at T=1 amortizes to ~1/T per step, at the cost of item reads
    being up to T steps stale (user rows stay fresh — they are local).
    ``overlap_psum=True`` additionally defers each window's all-reduce
    to the start of the next window so it overlaps that window's
    compute; pending deltas are flushed at every epoch boundary, so
    per-epoch RMSE sees fully-applied tables and one-window epochs are
    bit-identical to the synchronous schedule.
    """
    data_axes = data_axes_of(mesh)
    n_dev = 1
    for a in data_axes:
        n_dev *= mesh.shape[a]
    n_pad_local = data.total_len // n_dev
    nb = n_pad_local // cfg.batch_size
    T = _check_psum_every(psum_every, nb)
    n_win = nb // T

    def local_train(P_l, Q, mu, u_l, i_l, r_l, w_l, keys):
        dev = jnp.int32(0)
        for a in data_axes:
            dev = dev * mesh.shape[a] + jax.lax.axis_index(a)

        def epoch(carry, k):
            k = jax.random.fold_in(k, dev)
            if cfg.shuffle == "full":
                perm = jax.random.permutation(k, n_pad_local)
                xs = tuple(
                    x[perm].reshape(nb, cfg.batch_size)
                    for x in (u_l, i_l, r_l, w_l)
                )
            elif cfg.shuffle == "batch":
                bperm = jax.random.permutation(k, nb)
                xs = tuple(
                    x.reshape(nb, cfg.batch_size)[bperm]
                    for x in (u_l, i_l, r_l, w_l)
                )
            else:  # 'none': fixed visit order (debugging/parity mode)
                xs = tuple(
                    x.reshape(nb, cfg.batch_size)
                    for x in (u_l, i_l, r_l, w_l)
                )
            xs = tuple(x.reshape(n_win, T, cfg.batch_size) for x in xs)
            mu_ = carry[2]
            carry = _windowed_epoch(
                carry, xs, n_win,
                lambda ic, b, qr: _flat_step_acc(ic, b, qr, mu_, cfg, lr),
                data_axes, overlap_psum, cfg.update_item_params,
            )
            if cfg.compute_epoch_rmse:
                sse = _local_sse(*carry, u_l, i_l, r_l, w_l, cfg)
                rmse = jnp.sqrt(jax.lax.psum(sse, data_axes) / max(n_real, 1))
            else:
                rmse = jnp.float32(0.0)
            return carry, rmse

        (P_l, Q, mu), hist = jax.lax.scan(epoch, (P_l, Q, mu), keys)
        return P_l, Q, hist

    shard = P(data_axes)
    rep = P()
    fn = jax.shard_map(
        local_train,
        mesh=mesh,
        in_specs=(shard, rep, rep, shard, shard, shard, shard, rep),
        out_specs=(shard, rep, rep),
    )
    keys = jax.random.split(key, n_epochs)
    P_new, Q_new, hist = fn(
        params.user_features,
        params.item_features,
        params.global_mean,
        data.user_ids,
        data.item_ids,
        data.ratings,
        data.weights,
        keys,
    )
    return MFParams(P_new, Q_new, params.global_mean), hist


def _tile_step_acc(carry, b, Q_read, mu, cfg: SGDConfig, lr,
                   agg_prim, agg_sec, primary: str, expand_prim: bool,
                   use_fused: bool = False):
    """One dp mini-batch step riding the MXU tile machinery.

    The single-device counterpart is ``segment_sgd._minibatch_update``;
    here the USER side applies directly to the local P shard (its rows
    are device-local by the user-range partition) while the ITEM side
    reads the window-frozen ``Q_read`` and scatters its deltas into the
    carried ``dQ`` accumulator — the window driver
    (:func:`_windowed_epoch`) crosses the mesh once per window.
    Whichever side the pack stored sorted (``primary``) gets the
    shared-one-hot gather+scatter; the other side's delta rides the
    secondary tiles when present.  ``use_fused`` routes the sorted
    side's chain through the fused Pallas step
    (``segment_sgd.fused_tile_deltas``) — same update, one kernel.
    """
    P_l, dQ = carry
    prim_is_user = primary == "user"
    prim_ids = b["u"] if prim_is_user else b["i"]
    sec_ids = b["i"] if prim_is_user else b["u"]

    if use_fused and "pb" in b:
        prim_tbl, sec_tbl = ((P_l, Q_read) if prim_is_user
                             else (Q_read, P_l))
        bidx, agg, dq = sgd.fused_tile_deltas(
            prim_tbl, sec_tbl, b, cfg, mu, lr, cfg.reg, agg_prim,
            prim_is_user)
        # the item side's deltas always land in the dQ accumulator;
        # the user side's apply directly to the local shard
        if prim_is_user:
            P_l = P_l.at[bidx].add(agg, mode="promise_in_bounds")
            dQ = sgd.tile_sec_scatter(dQ, dq, b, agg_sec, key="i")
        else:
            dQ = dQ.at[bidx].add(agg, mode="promise_in_bounds")
            P_l = sgd.tile_sec_scatter(P_l, dq, b, agg_sec, key="u")
        return P_l, dQ

    oh_prim = None
    if "pb" in b:
        oh_prim = sgd._tile_onehot(prim_ids, b["pb"], *agg_prim)
    prim_tbl = P_l if prim_is_user else Q_read
    if oh_prim is not None and expand_prim:
        prim_rows = sgd._tile_gather(prim_tbl, oh_prim, b["pb"], *agg_prim)
    else:
        prim_rows = prim_tbl.at[prim_ids].get(mode="promise_in_bounds")
    sec_tbl = Q_read if prim_is_user else P_l
    sec_rows = sec_tbl.at[sec_ids].get(mode="promise_in_bounds")
    pu, qi = ((prim_rows, sec_rows) if prim_is_user
              else (sec_rows, prim_rows))

    pred, d_pu, d_qi = sgd.ext_forward_and_rowgrads(cfg, mu, pu, qi)
    err = (pred - b["r"]) * b["w"]

    def side_delta(rows, d_rows, side):
        mask = jnp.asarray(sgd.update_mask(cfg, side))
        g = (err[:, None] * d_rows
             + (cfg.reg * b["w"])[:, None] * rows) * mask[None, :]
        return -lr * g

    def apply_prim(table, delta):
        if oh_prim is not None:
            return sgd._tile_scatter_add(table, delta, oh_prim, b["pb"],
                                         *agg_prim)
        return table.at[prim_ids].add(delta, mode="promise_in_bounds")

    def apply_sec(table, delta):
        if "sb" in b:
            oh = sgd._tile_onehot(b["ss"], b["sb"], *agg_sec)
            return sgd._tile_scatter_add(table, delta[b["sp"]], oh,
                                         b["sb"], *agg_sec)
        return table.at[sec_ids].add(delta, mode="promise_in_bounds")

    if cfg.update_user_params:
        delta = side_delta(pu, d_pu, "user")
        apply = apply_prim if prim_is_user else apply_sec
        P_l = apply(P_l, delta)
    if cfg.update_item_params:
        delta = side_delta(qi, d_qi, "item")
        apply = apply_sec if prim_is_user else apply_prim
        dQ = apply(dQ, delta)
    return P_l, dQ


def dp_sgd_train_tiled(
    params: MFParams,
    data: sgd.RatingBatches,
    key: jax.Array,
    cfg: SGDConfig,
    n_epochs: int,
    lr: float,
    mesh: Mesh,
    overlap_psum: bool = False,
    psum_every: int = 1,
) -> Tuple[MFParams, jax.Array]:
    """Data-parallel training over a device-major tile-aggregated pack
    (``segment_sgd.pack_ratings(n_dev=..., users_per_dev=...)``).

    Same layout contract as :func:`dp_sgd_train` (P row-sharded over the
    data axes with LOCAL user ids, Q replicated) but each local step is
    the tile-aggregated :func:`_tile_step_acc` — the same MXU one-hot
    machinery that carries the single-chip headline, so per-chip
    throughput no longer regresses to the per-row-scatter rate when a
    mesh is attached.  ``psum_every=T`` amortizes the item-delta
    all-reduce AND the full-table zero/add it implies over T-step
    windows (see :func:`dp_sgd_train`); ``overlap_psum`` defers each
    window's psum behind the next window's compute.  Epoch order:
    ``cfg.shuffle`` applied per device (fold of the epoch key with the
    device index).
    """
    data_axes = data_axes_of(mesh)
    n_dev = 1
    for a in data_axes:
        n_dev *= mesh.shape[a]
    nb_local = data.user_ids.shape[0] // n_dev
    n_real = data.n_real
    T = _check_psum_every(psum_every, nb_local)
    n_win = nb_local // T
    # interpret-mode Pallas cannot run under shard_map in this jax
    # version (the interpreter's block slicing mixes varying and
    # unvaried avals); dp validates the fused branch at step level
    # (tests/test_pallas_sgd.py) and activates it on real backends
    use_fused = (sgd.FUSED_STEP != "interpret"
                 and sgd._fused_step_enabled(cfg, data))

    def local_train(P_l, Q, mu, ldata, keys):
        dev = jnp.int32(0)
        for a in data_axes:
            dev = dev * mesh.shape[a] + jax.lax.axis_index(a)
        xs_all, agg_prim, agg_sec, expand_prim = sgd.epoch_xs(ldata, cfg)

        def epoch(carry, k):
            k = jax.random.fold_in(k, dev)
            xs = sgd.shuffle_xs(xs_all, k, cfg, nb_local)
            xs = jax.tree.map(
                lambda a: a.reshape(n_win, T, *a.shape[1:]), xs)
            mu_ = carry[2]
            carry = _windowed_epoch(
                carry, xs, n_win,
                lambda ic, b, qr: _tile_step_acc(
                    ic, b, qr, mu_, cfg, lr, agg_prim, agg_sec,
                    ldata.primary, expand_prim, use_fused=use_fused),
                data_axes, overlap_psum, cfg.update_item_params,
            )
            p, q, _ = carry
            if cfg.compute_epoch_rmse:
                sse = sgd.masked_sse(
                    MFParams(p, q, mu_), ldata, cfg,
                    init=jax.lax.pcast(jnp.float32(0.0), data_axes,
                                       to="varying"))
                rmse = jnp.sqrt(jax.lax.psum(sse, data_axes)
                                / max(n_real, 1))
            else:
                rmse = jnp.float32(0.0)
            return carry, rmse

        (P_l, Q, mu), hist = jax.lax.scan(epoch, (P_l, Q, mu), keys)
        return P_l, Q, hist

    shard = P(data_axes)
    rep = P()
    fn = jax.shard_map(
        local_train,
        mesh=mesh,
        in_specs=(shard, rep, rep, shard, rep),
        out_specs=(shard, rep, rep),
    )
    keys = jax.random.split(key, n_epochs)
    P_new, Q_new, hist = fn(
        params.user_features, params.item_features, params.global_mean,
        data, keys,
    )
    return MFParams(P_new, Q_new, params.global_mean), hist


def place_params(params: MFParams, mesh: Mesh) -> MFParams:
    """Place P row-sharded over the data axes, item table replicated."""
    shard = NamedSharding(mesh, P(data_axes_of(mesh)))
    rep = NamedSharding(mesh, P())
    return MFParams(
        user_features=jax.device_put(params.user_features, shard),
        item_features=jax.device_put(params.item_features, rep),
        global_mean=jax.device_put(params.global_mean, rep),
    )


# ---------------------------------------------------------------------------
# 2D (data x model) training: BOTH tables sharded
# ---------------------------------------------------------------------------
#
# SURVEY §2.4 calls for sharding P *and* Q at 100M-rating scale: a
# replicated item table caps the catalog at one device's HBM.  Layout:
#
# * P row-sharded over ``data`` (replicated over ``model``);
#   Q row-sharded over ``model`` (replicated over ``data``).
# * Ratings are partitioned into (user-range x item-range) CELLS so that
#   device (d, m) owns exactly the ratings whose user falls in P-shard d
#   and whose item falls in Q-shard m — every gather and scatter is
#   device-local; no all-gather of table rows is ever needed.
# * Each synchronous step psums the local P deltas over ``model`` (a
#   user's ratings are split across item shards) and the local Q deltas
#   over ``data`` — both ride ICI.  Replicas stay bit-identical.


def shard_ratings_2d(
    u: np.ndarray,
    i: np.ndarray,
    r: np.ndarray,
    user_capacity: int,
    item_capacity: int,
    n_data: int,
    n_model: int,
    batch_size: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Partition ratings into (n_data x n_model) cells.

    Returns device-major (u_local, i_local, r, w) flattened in (d, m)
    order plus the per-device padded length (max cell size rounded up to
    whole batches; all cells padded identically so shapes are static).
    """
    assert user_capacity % n_data == 0 and item_capacity % n_model == 0
    users_per = user_capacity // n_data
    items_per = item_capacity // n_model
    cell = ((u // users_per).astype(np.int32) * n_model
            + (i // items_per).astype(np.int32))
    counts = np.bincount(cell, minlength=n_data * n_model)
    u, i, r = _sort_stream_by_key(cell, u, i, r, n_data * n_model)
    n_pad = max(batch_size, round_up(int(counts.max()), batch_size))

    n_dev = n_data * n_model
    uu = np.zeros((n_dev, n_pad), np.int32)
    ii = np.zeros((n_dev, n_pad), np.int32)
    rr = np.zeros((n_dev, n_pad), np.float32)
    ww = np.zeros((n_dev, n_pad), np.float32)
    start = 0
    for c in range(n_dev):
        cnt = int(counts[c])
        sl = slice(start, start + cnt)
        d, m = divmod(c, n_model)
        uu[c, :cnt] = u[sl] - d * users_per
        ii[c, :cnt] = i[sl] - m * items_per
        rr[c, :cnt] = r[sl]
        ww[c, :cnt] = 1.0
        start += cnt
    return uu.reshape(-1), ii.reshape(-1), rr.reshape(-1), ww.reshape(-1), n_pad


def _flat_step_acc_2d(carry, batch, P_read, Q_read, mu, cfg: SGDConfig, lr):
    """One 2D-cell step reading window-FROZEN tables.

    Unlike the 1D dp step, BOTH sides' rows live partly on other devices
    (a user's ratings span item shards and vice versa), so both deltas
    accumulate into carried tables and both reads are stale within the
    window; :func:`_windowed_epoch_2d` crosses the mesh once per window
    per side."""
    dP, dQ = carry
    u, i, r, w = batch
    pu = P_read.at[u].get(mode="promise_in_bounds")
    qi = Q_read.at[i].get(mode="promise_in_bounds")
    pred, d_pu, d_qi = sgd.ext_forward_and_rowgrads(cfg, mu, pu, qi)
    err = (pred - r) * w

    if cfg.update_user_params:
        umask = jnp.asarray(sgd.update_mask(cfg, "user"))
        g = (err[:, None] * d_pu + (cfg.reg * w)[:, None] * pu) * umask[None, :]
        dP = dP.at[u].add(-lr * g, mode="promise_in_bounds")
    if cfg.update_item_params:
        imask = jnp.asarray(sgd.update_mask(cfg, "item"))
        g = (err[:, None] * d_qi + (cfg.reg * w)[:, None] * qi) * imask[None, :]
        dQ = dQ.at[i].add(-lr * g, mode="promise_in_bounds")
    return dP, dQ


def _windowed_epoch_2d(carry, xs, step_acc, data_axes, overlap: bool,
                       upd_u: bool, upd_i: bool):
    """2D analogue of :func:`_windowed_epoch`: per window, ONE dP psum
    over ``model`` and ONE dQ psum over the data axes (both deferred one
    window when ``overlap``; pending deltas flushed before returning).
    A side whose update flag is off skips its psum entirely."""
    P_l, Q_l, mu = carry

    def zp(p):
        return jax.lax.pcast(jnp.zeros_like(p), MODEL_AXIS, to="varying")

    def zq(q):
        return jax.lax.pcast(jnp.zeros_like(q), data_axes, to="varying")

    def flush_p(p, dp):
        return p + jax.lax.psum(dp, MODEL_AXIS) if upd_u else p

    def flush_q(q, dq):
        return q + jax.lax.psum(dq, data_axes) if upd_i else q

    if overlap:
        def window(c, xw):
            p, q, dp_pend, dq_pend = c
            p_next = flush_p(p, dp_pend)
            q_next = flush_q(q, dq_pend)
            (dp, dq), _ = jax.lax.scan(
                lambda ic, b: (step_acc(ic, b, p, q), None),
                (zp(p), zq(q)), xw)
            return (p_next, q_next, dp, dq), None

        (P_l, Q_l, dp, dq), _ = jax.lax.scan(
            window, (P_l, Q_l, zp(P_l), zq(Q_l)), xs)
        P_l = flush_p(P_l, dp)
        Q_l = flush_q(Q_l, dq)
    else:
        def window(c, xw):
            p, q = c
            (dp, dq), _ = jax.lax.scan(
                lambda ic, b: (step_acc(ic, b, p, q), None),
                (zp(p), zq(q)), xw)
            return (flush_p(p, dp), flush_q(q, dq)), None

        (P_l, Q_l), _ = jax.lax.scan(window, (P_l, Q_l), xs)
    return (P_l, Q_l, mu)


def dp_tp_sgd_train(
    params: MFParams,
    data: ShardedRatings,
    key: jax.Array,
    cfg: SGDConfig,
    n_epochs: int,
    lr: float,
    mesh: Mesh,
    n_real: int,
    overlap_psum: bool = False,
    psum_every: int = 1,
) -> Tuple[MFParams, jax.Array]:
    """Multi-epoch 2D-sharded training under ``shard_map``.

    ``params.user_features`` must be row-sharded over ``data``,
    ``params.item_features`` row-sharded over ``model``; ``data`` arrays
    device-major in (d, m) order with LOCAL ids (see
    :func:`shard_ratings_2d`).

    ``psum_every=T`` accumulates BOTH sides' deltas across T-step
    windows and crosses the mesh once per window per side (both reads
    are stale within a window — in 2D even a user's own rows span item
    shards); ``overlap_psum=True`` defers each window's two all-reduces
    behind the next window's compute, flushing pending deltas at every
    epoch boundary.
    """
    data_axes = data_axes_of(mesh)
    n_data = 1
    for a in data_axes:
        n_data *= mesh.shape[a]
    n_model = mesh.shape[MODEL_AXIS]
    n_pad_local = data.total_len // (n_data * n_model)
    nb = n_pad_local // cfg.batch_size
    T = _check_psum_every(psum_every, nb)
    n_win = nb // T

    def local_train(P_l, Q_l, mu, u_l, i_l, r_l, w_l, keys):
        d = jnp.int32(0)
        for a in data_axes:
            d = d * mesh.shape[a] + jax.lax.axis_index(a)
        m = jax.lax.axis_index(MODEL_AXIS)

        def epoch(carry, k):
            k = jax.random.fold_in(jax.random.fold_in(k, d), m)
            if cfg.shuffle == "full":
                perm = jax.random.permutation(k, n_pad_local)
                xs = tuple(
                    x[perm].reshape(nb, cfg.batch_size)
                    for x in (u_l, i_l, r_l, w_l)
                )
            elif cfg.shuffle == "batch":
                bperm = jax.random.permutation(k, nb)
                xs = tuple(
                    x.reshape(nb, cfg.batch_size)[bperm]
                    for x in (u_l, i_l, r_l, w_l)
                )
            else:
                xs = tuple(
                    x.reshape(nb, cfg.batch_size)
                    for x in (u_l, i_l, r_l, w_l)
                )
            xs = tuple(x.reshape(n_win, T, cfg.batch_size) for x in xs)
            mu_ = carry[2]
            carry = _windowed_epoch_2d(
                carry, xs,
                lambda ic, b, pr, qr: _flat_step_acc_2d(
                    ic, b, pr, qr, mu_, cfg, lr),
                data_axes, overlap_psum,
                cfg.update_user_params, cfg.update_item_params,
            )
            if cfg.compute_epoch_rmse:
                sse = _local_sse(*carry, u_l, i_l, r_l, w_l, cfg)
                sse = jax.lax.psum(jax.lax.psum(sse, data_axes), MODEL_AXIS)
                rmse = jnp.sqrt(sse / max(n_real, 1))
            else:
                rmse = jnp.float32(0.0)
            return carry, rmse

        (P_l, Q_l, mu), hist = jax.lax.scan(epoch, (P_l, Q_l, mu), keys)
        return P_l, Q_l, hist

    cell_axes = data_axes + (MODEL_AXIS,)
    fn = jax.shard_map(
        local_train,
        mesh=mesh,
        in_specs=(
            P(data_axes), P(MODEL_AXIS), P(),
            P(cell_axes), P(cell_axes), P(cell_axes), P(cell_axes), P(),
        ),
        out_specs=(P(data_axes), P(MODEL_AXIS), P()),
    )
    keys = jax.random.split(key, n_epochs)
    P_new, Q_new, hist = fn(
        params.user_features,
        params.item_features,
        params.global_mean,
        data.user_ids,
        data.item_ids,
        data.ratings,
        data.weights,
        keys,
    )
    return MFParams(P_new, Q_new, params.global_mean), hist


def place_params_2d(params: MFParams, mesh: Mesh) -> MFParams:
    """P row-sharded over the data axes, Q row-sharded over model."""
    return MFParams(
        user_features=jax.device_put(
            params.user_features, NamedSharding(mesh, P(data_axes_of(mesh)))
        ),
        item_features=jax.device_put(
            params.item_features, NamedSharding(mesh, P(MODEL_AXIS))
        ),
        global_mean=jax.device_put(
            params.global_mean, NamedSharding(mesh, P())
        ),
    )


def dp_tp_fit(
    u: np.ndarray,
    i: np.ndarray,
    r: np.ndarray,
    n_users: int,
    n_items: int,
    cfg: SGDConfig,
    n_epochs: int,
    lr: float,
    mesh: Mesh,
    seed: int = 0,
    init_mean: float = 0.0,
    init_sd: float = 0.1,
    overlap_psum: bool = False,
    psum_every: int = 1,
) -> Tuple[MFParams, np.ndarray]:
    """End-to-end 2D-sharded fit (sharded P AND Q)."""
    data_axes = data_axes_of(mesh)
    n_data = 1
    for a in data_axes:
        n_data *= mesh.shape[a]
    n_model = mesh.shape[MODEL_AXIS]
    ucap = round_up(n_users, 8 * n_data)
    icap = round_up(n_items, 8 * n_model)
    key = jax.random.PRNGKey(seed)
    k_init, k_train = jax.random.split(key)
    params = sgd.init_params(
        k_init, n_users, n_items, cfg, float(np.mean(r)),
        init_mean, init_sd, user_capacity=ucap, item_capacity=icap,
    )
    params = place_params_2d(params, mesh)
    su, si, sr, sw, _ = shard_ratings_2d(
        u.astype(np.int32), i.astype(np.int32), r.astype(np.float32),
        ucap, icap, n_data, n_model, cfg.batch_size,
    )
    shard = NamedSharding(mesh, P(data_axes + (MODEL_AXIS,)))
    data = ShardedRatings(
        jax.device_put(su, shard),
        jax.device_put(si, shard),
        jax.device_put(sr, shard),
        jax.device_put(sw, shard),
    )
    train = jax.jit(
        lambda p, d, k: dp_tp_sgd_train(p, d, k, cfg, n_epochs, lr, mesh,
                                        len(r), overlap_psum=overlap_psum,
                                        psum_every=psum_every)
    )
    params, hist = train(params, data, k_train)
    return params, np.asarray(hist)


def dp_fit(
    u: np.ndarray,
    i: np.ndarray,
    r: np.ndarray,
    n_users: int,
    n_items: int,
    cfg: SGDConfig,
    n_epochs: int,
    lr: float,
    mesh: Mesh,
    seed: int = 0,
    init_mean: float = 0.0,
    init_sd: float = 0.1,
    overlap_psum: bool = False,
    layout: str = "flat",
    pack_order: str = "shuffle",
    psum_every: int = 1,
) -> Tuple[MFParams, np.ndarray]:
    """End-to-end sharded fit: init, shard, train, return device params.

    ``layout='tiled'`` (or ``'auto'``: tiled unless ``cfg.shuffle`` is
    ``'full'``) packs the shards with the MXU tile metadata
    (``pack_ratings(n_dev=...)``) and trains via
    :func:`dp_sgd_train_tiled` — the per-chip fast path; ``'flat'`` keeps
    the plain-scatter trainer (and exact multislice/overlap equivalence
    contracts of the original layout).  ``pack_order`` is the tiled
    pack's chunk-sort order ('shuffle' = reference visit semantics,
    'item'/'user'/'auto' = the layout-preserving deviation, see
    ``pack_ratings``)."""
    data_axes = data_axes_of(mesh)
    n_dev = 1
    for a in data_axes:
        n_dev *= mesh.shape[a]
    ucap = round_up(n_users, 8 * n_dev)
    key = jax.random.PRNGKey(seed)
    k_init, k_train = jax.random.split(key)
    params = sgd.init_params(
        k_init, n_users, n_items, cfg, float(np.mean(r)),
        init_mean, init_sd, user_capacity=ucap,
    )
    params = place_params(params, mesh)
    if layout == "auto":
        layout = "flat" if cfg.shuffle == "full" else "tiled"
    if layout not in ("flat", "tiled"):
        raise ValueError(f"unknown dp layout {layout!r}")
    shard = NamedSharding(mesh, P(data_axes))
    if layout == "tiled":
        data = sgd.pack_ratings(
            u.astype(np.int32), i.astype(np.int32), r.astype(np.float32),
            cfg.batch_size, shuffle_seed=seed, order=pack_order,
            row_width=cfg.padded_factors, n_dev=n_dev,
            users_per_dev=ucap // n_dev,
        )
        data = jax.tree.map(lambda a: jax.device_put(a, shard), data)
        train = jax.jit(
            lambda p, d, k: dp_sgd_train_tiled(
                p, d, k, cfg, n_epochs, lr, mesh,
                overlap_psum=overlap_psum, psum_every=psum_every)
        )
        params, hist = train(params, data, k_train)
        return params, np.asarray(hist)
    su, si, sr, sw, _ = shard_ratings_by_user(
        u.astype(np.int32), i.astype(np.int32), r.astype(np.float32),
        ucap, n_dev, cfg.batch_size,
    )
    data = ShardedRatings(
        jax.device_put(su, shard),
        jax.device_put(si, shard),
        jax.device_put(sr, shard),
        jax.device_put(sw, shard),
    )
    train = jax.jit(
        lambda p, d, k: dp_sgd_train(p, d, k, cfg, n_epochs, lr, mesh,
                                     len(r), overlap_psum=overlap_psum,
                                     psum_every=psum_every)
    )
    params, hist = train(params, data, k_train)
    return params, np.asarray(hist)
