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
  updates *degraded* results, ``kernels.py:127``).  When the pack is
  chunk-sorted, per-row table ops become MXU one-hot einsums + block ops
  (see :class:`RatingBatches`) — the round-2 throughput lever.

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

    When tile-aggregation metadata is present (the default), each batch
    is stored sorted by the **primary** side's id (the chunk-sort side —
    ``pack_ratings(order=...)``), and per-tile one-hot einsums on the MXU
    replace the per-row table ops that bound round-1 throughput
    (~6ns/row at 128 lanes, ~17ns at 256, measured
    ``benchmarks/micro_k200b.py``):

    * primary side: tile bases only — its rows are gathered by a block
      load + one-hot *expand* einsum and scattered by the transposed
      *aggregate* einsum + a C/S-times-smaller block scatter, both
      sharing one one-hot matrix;
    * secondary side: a per-batch sort permutation + tile bases — its
      delta rows are permuted into sorted order and tile-scattered
      (its gathers stay per-row: un-permuting an expand costs as much
      as the gather it would save).

    ``agg_prim``/``agg_sec`` are static ``(S, C)`` tile shapes; ``(0, 0)``
    disables that side (falls back to plain per-row scatter).
    """

    user_ids: jax.Array  # (nb, bs) int32
    item_ids: jax.Array  # (nb, bs) int32
    ratings: jax.Array  # (nb, bs) f32
    weights: jax.Array  # (nb, bs) f32, 1.0 real / 0.0 pad
    n_real: int = struct.field(pytree_node=False)
    prim_tile_base: Optional[jax.Array] = None  # (nb, bs/S_p) int32
    sec_ids_sorted: Optional[jax.Array] = None  # (nb, bs) int32
    sec_perm: Optional[jax.Array] = None  # (nb, bs) int32
    sec_tile_base: Optional[jax.Array] = None  # (nb, bs/S_s) int32
    # which side the batches are stored sorted by: 'item' | 'user'
    primary: str = struct.field(pytree_node=False, default="item")
    agg_prim: Tuple[int, int] = struct.field(pytree_node=False, default=(0, 0))
    agg_sec: Tuple[int, int] = struct.field(pytree_node=False, default=(0, 0))
    # gather the primary side via block-load + one-hot expand (shared
    # with the scatter's one-hot) instead of per-row gathers
    expand_prim: bool = struct.field(pytree_node=False, default=False)


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


def _scatter_ns_per_row(row_width: int) -> float:
    """Plain scatter-add cost (measured v5e: 6ns at 128 lanes, 17ns at
    256 — benchmarks/micro_rowops.py, micro_k200b.py)."""
    return 6.0 * (row_width / 128.0) ** 1.5


def _gather_ns_per_row(row_width: int) -> float:
    """Per-row table gather cost (measured v5e: 3.8ns at 256 lanes)."""
    return 1.9 * (row_width / 128.0)


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
    scatter_ns = _scatter_ns_per_row(row_width)
    best_cost = scatter_ns * bs * (1.0 - min_gain)
    for S in _TILE_CANDIDATES:
        if bs % S or S > bs:
            continue
        tiles = ids_2d.reshape(ids_2d.shape[0], -1, S)
        span = int((tiles[:, :, -1] - tiles[:, :, 0]).max()) + 1
        C = round_up(span, 32)
        if C > c_max or C > max_id + 1:
            continue
        # einsum work scales with the row width; one-hot build does not
        cost = (bs // S) * C * scatter_ns + bs * C * (
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


def _expand_wins(S: int, C: int, row_width: int) -> bool:
    """Should the primary side's rows be gathered via block-load +
    one-hot expand (reusing the scatter's one-hot) instead of per-row
    gathers?  Marginal expand cost = (C/S) block-gather rows + the
    expand einsum; wins whenever tiles are reasonably tight."""
    g = _gather_ns_per_row(row_width)
    expand = (C / S) * g + C * _EINSUM_NS_PER_ENTRY_COL * (row_width / 128.0)
    return expand < g


def sort_stream_by_key(key: np.ndarray, u: np.ndarray, i: np.ndarray,
                       r: np.ndarray, n_keys: int
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(u, i, r) stably sorted by a dense key — the native counting sort
    (O(n + n_keys), byte-identical to argsort(kind='stable')) when
    available, numpy otherwise."""
    from matrix_factorization_tpu.data.loader import get_native_lib

    lib = get_native_lib()
    n = len(key)
    if lib is not None and n:
        u_s = np.empty(n, np.int32)
        i_s = np.empty(n, np.int32)
        r_s = np.empty(n, np.float32)
        lib.mf_sort_triple_by_key(
            np.ascontiguousarray(key, np.int32),
            np.ascontiguousarray(u, np.int32),
            np.ascontiguousarray(i, np.int32),
            np.ascontiguousarray(r, np.float32),
            n, int(n_keys), u_s, i_s, r_s)
        return u_s, i_s, r_s
    order = np.argsort(key, kind="stable")
    return u[order], i[order], r[order]


def _native_threads() -> int:
    import os

    return min(16, os.cpu_count() or 1)


def _native_sort_ranges(u: np.ndarray, i: np.ndarray, r: np.ndarray,
                        w: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                        key_is_item: bool, n_keys: int) -> bool:
    """In-place stable sort of each [start, end) range by the key column
    via the threaded native counting sort (loader.cpp::mf_sort_ranges);
    byte-identical to argsort(kind='stable') + take_along_axis.  Returns
    False (and does nothing) when the native lib is unavailable."""
    from matrix_factorization_tpu.data.loader import get_native_lib

    lib = get_native_lib()
    if lib is None:
        return False
    lib.mf_sort_ranges(u, i, r, w, starts, ends, len(starts),
                       int(key_is_item), int(n_keys), _native_threads())
    return True


def _argsort_batches(sec: np.ndarray, starts: np.ndarray,
                     ends: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-batch stable (argsort perm, sorted keys) — the threaded
    native counting argsort when available, numpy otherwise (identical
    outputs)."""
    from matrix_factorization_tpu.data.loader import get_native_lib

    lib = get_native_lib()
    nb, bs = sec.shape
    if lib is not None:
        flat = np.ascontiguousarray(sec.reshape(-1), np.int32)
        perm = np.empty(nb * bs, np.int32)
        srt = np.empty(nb * bs, np.int32)
        lib.mf_argsort_ranges(flat, starts, ends, nb,
                              int(sec.max()) + 1, perm, srt,
                              _native_threads())
        return perm.reshape(nb, bs), srt.reshape(nb, bs)
    ssort = np.argsort(sec, axis=1, kind="stable").astype(np.int32)
    return ssort, np.take_along_axis(sec, ssort, axis=1)


def _ship_ids(a: np.ndarray) -> jax.Array:
    """Host->device id transfer in the narrowest lossless wire dtype.

    On remote-tunnel images bulk transfers run at single-digit MB/s, so
    halving bytes-on-the-wire halves the fit's transfer phase
    (ROADMAP r2: the int8/uint16 wire-format lever).  Ids in
    [65536, 2^24) ship as a uint16 low-half + uint8 high plane (3B
    instead of 4B — covers 16.7M entities, same trick as the iALS
    grouped wire).  The upcast back to int32 runs on device — HBM is
    not the bottleneck, the link is.
    """
    if a.size and a.min() >= 0:
        amax = int(a.max())
        if amax < (1 << 24):
            wide = amax >= (1 << 16)
            from matrix_factorization_tpu.data.loader import get_native_lib

            lib = get_native_lib()
            if lib is not None:
                flat = np.ascontiguousarray(a.reshape(-1), np.int32)
                lo = np.empty(flat.size, np.uint16)
                hi = np.empty(flat.size if wide else 1, np.uint8)
                lib.mf_encode_ids_wire(flat, flat.size, lo, hi,
                                       int(wide), _native_threads())
                lo = lo.reshape(a.shape)
                hi = hi.reshape(a.shape) if wide else hi
            else:
                lo = (a & 0xFFFF).astype(np.uint16) if wide else (
                    a.astype(np.uint16))
                hi = (a >> 16).astype(np.uint8) if wide else None
            out = jnp.asarray(lo).astype(jnp.int32)
            if wide:
                out = out | (jnp.asarray(hi).astype(jnp.int32) << 16)
            return out
    return jnp.asarray(a)


def _ship_ratings(r: np.ndarray) -> jax.Array:
    """f32 ratings as int8 half-steps when exactly representable
    (MovieLens-style half-star scales), else raw f32."""
    if not r.size:
        return jnp.asarray(r)
    from matrix_factorization_tpu.data.loader import get_native_lib

    lib = get_native_lib()
    if lib is not None:
        flat = np.ascontiguousarray(r.reshape(-1), np.float32)
        r8 = np.empty(flat.size, np.int8)
        if lib.mf_encode_half(flat, flat.size, r8, _native_threads()):
            return jnp.asarray(r8.reshape(r.shape)).astype(
                jnp.float32) * 0.5
        return jnp.asarray(r)
    twice = r * 2.0
    rounded = np.rint(twice)
    if (np.abs(twice - rounded) < 1e-6).all() and (
            np.abs(rounded) < 127).all():
        return jnp.asarray(rounded.astype(np.int8)).astype(
            jnp.float32) * 0.5
    return jnp.asarray(r)


def _ship_weights(w: np.ndarray) -> jax.Array:
    """0/1 pad weights as uint8 on the wire."""
    return jnp.asarray(w.astype(np.uint8)).astype(jnp.float32)


def block_geometry(n_users: int, n_items: int, n_ratings: int,
                   batch_size: int) -> Tuple[int, int]:
    """Cell sizes (W_u, W_i) for ``pack_ratings(order='block')``.

    A cell holds ~``batch_size`` expected ratings
    (``W_u * W_i * density ~= bs``); the aspect balances the two sides'
    tile spans (prim tiles are ~2x the secondary's S, so W_u ~= W_i/2).
    Power-of-two rounded, clamped to the table sizes."""
    density = max(n_ratings, 1) / (max(n_users, 1) * max(n_items, 1))
    wi = (2.0 * batch_size / density) ** 0.5
    wi = 1 << max(5, int(round(np.log2(max(wi, 32)))))
    wu = max(32, wi // 2)
    return min(wu, round_up(n_users, 32)), min(wi, round_up(n_items, 32))


def pack_ratings(
    user_ids: np.ndarray,
    item_ids: np.ndarray,
    ratings: np.ndarray,
    batch_size: int,
    shuffle_seed: Optional[int] = 0,
    order: str = "shuffle",
    aggregate: bool = True,
    c_max: int = 1024,
    agg_min_gain: float = 0.2,
    item_sort_chunks: int = 8,
    row_width: int = 128,
    n_dev: int = 1,
    users_per_dev: Optional[int] = None,
    user_block: Optional[int] = None,
    item_block: Optional[int] = None,
) -> RatingBatches:
    """Host-side packing into (nb, bs) blocks, pre-shuffled once.

    ``n_dev > 1`` packs DEVICE-MAJOR for the data-parallel trainer:
    device d owns users ``[d*users_per_dev, (d+1)*users_per_dev)``, the
    returned user ids are LOCAL to their device, every device is padded
    to a common whole number of batches (leading dim ``n_dev * nb_local``
    ready to shard on a mesh's data axes), and — because the tile
    metadata below is computed over ALL batches at once — the (S, C)
    tile shapes are uniform across devices, so one ``shard_map`` program
    serves every shard.  Shuffling and chunk-sorting stay within each
    device's segment.

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
    ``c_max`` caps the tile span the cost model may pick; 1024 admits
    the (S=1024, C=544) secondary tiles that measure ~2% faster than
    the 512-capped pick on the ML-25M k=200 config (the model still
    chooses, so smaller workloads are unaffected).
    """
    n = int(len(ratings))
    if order == "auto" and n > 0:
        max_u = (users_per_dev - 1 if n_dev > 1 and users_per_dev
                 else int(user_ids.max()))
        order = "user" if max_u > int(item_ids.max()) else "item"
    elif order == "auto":
        order = "item"
    if order not in ("shuffle", "item", "user", "block"):
        raise ValueError(f"unknown pack order {order!r}")
    if order == "block" and n > 1:
        # 2D cell layout (round 5, the config-5 small-batch lever): sort
        # the shuffled stream by (user_block, item_block) cell so every
        # bs-row batch covers ~one cell — BOTH sides' tile spans stay
        # bounded by the cell geometry at ANY batch size, which unlocks
        # the small-batch VMEM regime the secondary side's perm/gather
        # need (measured 8.1 vs 19 ns/row at Kp=128 —
        # benchmarks/micro_tableheight2.py).  A batch straddles at most
        # two adjacent cells (no padding).  Shuffle order survives
        # within each cell; epoch visit order is the standard
        # batch-order permutation.
        if n_dev > 1:
            raise ValueError("order='block' is a single-device layout; "
                             "the dp trainers use device-major packs")
        nu_est = int(user_ids.max()) + 1
        ni_est = int(item_ids.max()) + 1
        if user_block is None or item_block is None:
            wu, wi = block_geometry(nu_est, ni_est, n, batch_size)
            user_block = user_block or wu
            item_block = item_block or wi
        if shuffle_seed is not None:
            perm = np.random.default_rng(shuffle_seed).permutation(n)
            user_ids = user_ids[perm]
            item_ids = item_ids[perm]
            ratings = ratings[perm]
            shuffle_seed = None  # cell order below must be preserved
        nib = -(-ni_est // item_block)
        # sort by item FIRST, then stable-sort by cell: within every
        # cell rows end up item-sorted, so a batch that cuts a cell
        # mid-way sees a COMPACT item subrange on each side of the cut.
        # (With shuffled in-cell order, a partial cell's few rows
        # spread over the whole W_i-wide block — measured tile spans
        # ~3900 at the cut batches, which the global-max metadata turns
        # into a tiling veto for every batch.)
        user_ids, item_ids, ratings = sort_stream_by_key(
            item_ids.astype(np.int32), user_ids.astype(np.int32),
            item_ids.astype(np.int32), ratings.astype(np.float32), ni_est)
        cell = ((user_ids.astype(np.int64) // user_block) * nib
                + item_ids // item_block).astype(np.int32)
        user_ids, item_ids, ratings = sort_stream_by_key(
            cell, user_ids, item_ids, ratings, int(cell.max()) + 1)
        # pad each user-block row to a whole number of batches: a batch
        # crossing a user-block boundary would put one >= W_u id jump
        # inside a tile, and the global max-span metadata would then
        # disable tiling for EVERY batch (measured: 55ns/row flat path).
        # Within a row, batches may straddle adjacent ITEM cells freely
        # (the jump is < 2*W_i, bounded by the cell geometry).  Pads are
        # weight-0 tail resamples; overhead ~ n_ublocks * bs/2 rows.
        ub = user_ids // user_block
        ub_counts = np.bincount(ub, minlength=int(ub.max()) + 1)
        padded = np.where(
            ub_counts > 0,
            (ub_counts + batch_size - 1) // batch_size * batch_size, 0)
        n_pad_total = int(padded.sum())
        u2 = np.zeros(n_pad_total, np.int32)
        i2 = np.zeros(n_pad_total, np.int32)
        r2 = np.zeros(n_pad_total, np.float32)
        w2 = np.zeros(n_pad_total, np.float32)
        src = 0
        dst = 0
        for b, c in enumerate(ub_counts):
            c = int(c)
            if c == 0:
                continue
            p = int(padded[b])
            u2[dst:dst + c] = user_ids[src:src + c]
            i2[dst:dst + c] = item_ids[src:src + c]
            r2[dst:dst + c] = ratings[src:src + c]
            w2[dst:dst + c] = 1.0
            if p > c:  # tail-resample pads keep the block's local ids
                tail = min(c, p - c)
                u2[dst + c:dst + p] = np.resize(
                    user_ids[src + c - tail:src + c], p - c)
                i2[dst + c:dst + p] = np.resize(
                    item_ids[src + c - tail:src + c], p - c)
            src += c
            dst += p
        return _pack_preformed(u2, i2, r2, w2, n, batch_size, "user",
                               aggregate, c_max, agg_min_gain, row_width)
    if n_dev > 1:
        if not users_per_dev:
            raise ValueError("n_dev > 1 needs users_per_dev")
        dev = (user_ids.astype(np.int64) // users_per_dev).astype(np.int32)
        us, is_, rs = sort_stream_by_key(
            dev, user_ids.astype(np.int32), item_ids.astype(np.int32),
            ratings.astype(np.float32), n_dev)
        counts = np.bincount(dev, minlength=n_dev)
        n_pad_local = max(batch_size,
                          round_up(max(int(counts.max()), 1), batch_size))
        n_pad = n_dev * n_pad_local
        nb = n_pad // batch_size
        u = np.zeros(n_pad, np.int32)
        i = np.zeros(n_pad, np.int32)
        r = np.zeros(n_pad, np.float32)
        w = np.zeros(n_pad, np.float32)
        start = 0
        for d in range(n_dev):
            c = int(counts[d])
            sl = slice(start, start + c)
            lu = us[sl] - d * users_per_dev
            li, lr_ = is_[sl], rs[sl]
            if shuffle_seed is not None and c > 1:
                perm = np.random.default_rng((shuffle_seed, d)).permutation(c)
                lu, li, lr_ = lu[perm], li[perm], lr_[perm]
            off = d * n_pad_local
            u[off:off + c] = lu
            i[off:off + c] = li
            r[off:off + c] = lr_
            w[off:off + c] = 1.0
            padl = n_pad_local - c
            if padl and c:  # tail-resample pads (weight 0), per device
                tail = min(c, padl)
                u[off + c:off + n_pad_local] = np.resize(
                    u[off + c - tail:off + c], padl)
                i[off + c:off + n_pad_local] = np.resize(
                    i[off + c - tail:off + c], padl)
            start += c
    else:
        n_pad = max(batch_size, round_up(n, batch_size))
        pad = n_pad - n
        nb = n_pad // batch_size
        u = np.empty(n_pad, np.int32)
        i = np.empty(n_pad, np.int32)
        r = np.empty(n_pad, np.float32)
        lib = None
        if shuffle_seed is not None and n > 1:
            from matrix_factorization_tpu.data.loader import get_native_lib

            lib = get_native_lib()
        if lib is not None:
            # apply the epoch permutation in one native gather pass, writing
            # straight into the padded buffers (the numpy path below costs
            # three fancy-index copies + three astype/concatenate copies)
            perm = np.random.default_rng(shuffle_seed).permutation(n)
            lib.mf_gather_rows(
                np.ascontiguousarray(user_ids, np.int32),
                np.ascontiguousarray(item_ids, np.int32),
                np.ascontiguousarray(ratings, np.float32),
                perm, n, u[:n], i[:n], r[:n], _native_threads())
        else:
            if shuffle_seed is not None and n > 1:
                perm = np.random.default_rng(shuffle_seed).permutation(n)
                user_ids, item_ids, ratings = (
                    user_ids[perm], item_ids[perm], ratings[perm],
                )
            u[:n] = user_ids
            i[:n] = item_ids
            r[:n] = ratings
        # pads resample the TAIL of the real stream cyclically (weight 0
        # makes them no-ops): they follow the local id distribution of the
        # chunk they land in, so the pad-heavy last batch keeps the same
        # sorted-tile spans as full batches instead of leaving its few
        # real ids spread thin (which would blow up the C bound)
        if pad:
            tail = min(n, max(pad, 1))
            u[n:] = np.resize(u[n - tail:n], pad) if n else 0
            i[n:] = np.resize(i[n - tail:n], pad) if n else 0
            r[n:] = 0.0
        w = np.empty(n_pad, np.float32)
        w[:n] = 1.0
        w[n:] = 0.0
    if order in ("item", "user") and n > 1:
        # sort whole-batch chunks by the chosen id: chunk bounds are batch
        # boundaries, so no aggregation tile ever straddles two chunks
        # (a mixed tile would span the whole id space and disable the
        # tile path); pads carry weight 0, sorting them in is harmless.
        # Chunks never cross a device segment (n_dev > 1).
        sort_key = i if order == "item" else u
        nb_local = nb // n_dev
        chunks = max(1, min(item_sort_chunks, nb_local))
        step = -(-nb_local // chunks) * batch_size
        seg = nb_local * batch_size
        rel = np.arange(0, seg, step, dtype=np.int64)
        offs = np.arange(n_dev, dtype=np.int64)[:, None] * seg
        starts = (offs + rel[None, :]).reshape(-1)
        ends = (offs + np.minimum(rel + step, seg)[None, :]).reshape(-1)
        if not _native_sort_ranges(u, i, r, w, starts, ends,
                                   order == "item",
                                   int(sort_key.max()) + 1):
            for lo, hi in zip(starts, ends):
                srt = np.argsort(sort_key[lo:hi], kind="stable")
                u[lo:hi] = u[lo:hi][srt]
                i[lo:hi] = i[lo:hi][srt]
                r[lo:hi] = r[lo:hi][srt]
                w[lo:hi] = w[lo:hi][srt]
    # the primary side = the chunk-sort side: its in-batch windows are the
    # tight ones, so it gets the perm-free tile treatment
    primary = order if order in ("item", "user") else "item"
    return _pack_preformed(u, i, r, w, n, batch_size, primary, aggregate,
                           c_max, agg_min_gain, row_width)


def _pack_preformed(u, i, r, w, n_real: int, batch_size: int, primary: str,
                    aggregate: bool, c_max: int, agg_min_gain: float,
                    row_width: int) -> RatingBatches:
    """Batch + aggregate + wire-ship stage shared by the linear pack
    layouts and the 2D block layout: flat padded (u, i, r, w) arrays in
    final stream order -> :class:`RatingBatches` with tile metadata."""
    n_pad = u.shape[0]
    nb = n_pad // batch_size
    u = u.reshape(nb, batch_size)
    i = i.reshape(nb, batch_size)
    r = r.reshape(nb, batch_size)
    w = w.reshape(nb, batch_size)

    kw: dict = {}
    agg_prim = agg_sec = (0, 0)
    expand_prim = False
    if aggregate and n_real > 0:
        # store each batch primary-sorted; that side then needs no perm
        prim, sec = (i, u) if primary == "item" else (u, i)
        bstarts = np.arange(nb, dtype=np.int64) * batch_size
        bends = bstarts + batch_size
        if _native_sort_ranges(u.reshape(-1), i.reshape(-1),
                               r.reshape(-1), w.reshape(-1),
                               bstarts, bends, primary == "item",
                               int(prim.max()) + 1):
            pass  # sorted in place through the flat views
        else:
            psort = np.argsort(prim, axis=1, kind="stable")
            u = np.take_along_axis(u, psort, axis=1)
            i = np.take_along_axis(i, psort, axis=1)
            r = np.take_along_axis(r, psort, axis=1)
            w = np.take_along_axis(w, psort, axis=1)
        prim, sec = (i, u) if primary == "item" else (u, i)
        mp = _tile_meta(prim, batch_size, c_max, int(prim.max()),
                        agg_min_gain, row_width)
        if mp is not None:
            kw["prim_tile_base"] = jnp.asarray(mp[0])
            agg_prim = (mp[1], mp[2])
            expand_prim = _expand_wins(mp[1], mp[2], row_width)
        ssort, ss = _argsort_batches(sec, bstarts, bends)
        ms = _tile_meta(ss, batch_size, c_max, int(sec.max()),
                        agg_min_gain, row_width)
        if ms is not None:
            kw["sec_ids_sorted"] = _ship_ids(ss)
            kw["sec_perm"] = _ship_ids(ssort)
            kw["sec_tile_base"] = jnp.asarray(ms[0])
            agg_sec = (ms[1], ms[2])

    return RatingBatches(
        _ship_ids(u),
        _ship_ids(i),
        _ship_ratings(r),
        _ship_weights(w),
        n_real,
        primary=primary,
        agg_prim=agg_prim,
        agg_sec=agg_sec,
        expand_prim=expand_prim,
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


def _tile_onehot(
    ids_sorted: jax.Array, tile_base: jax.Array, S: int, C: int,
) -> jax.Array:
    """(T, S, C) one-hot: entry s of tile t -> local column id - base.

    Each tile of ``S`` consecutive (per-tile-sorted) entries spans < ``C``
    ids.  Bases are pre-clamped so ``base + C`` never exceeds the id
    space; one-hot columns past a tile's actual ids are all-zero."""
    T = ids_sorted.shape[0] // S
    lidx = ids_sorted.reshape(T, S) - tile_base[:, None]
    return (
        lidx[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
    ).astype(jnp.float32)


def _tile_block_idx(tile_base: jax.Array, C: int) -> jax.Array:
    """(T*C,) flat row indices of every tile's [base, base+C) block."""
    return (
        tile_base[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
    ).reshape(-1)


def _tile_scatter_add(
    table: jax.Array,
    rows: jax.Array,
    oh: jax.Array,
    tile_base: jax.Array,
    S: int,
    C: int,
) -> jax.Array:
    """``table.at[ids].add(rows)`` for per-tile-sorted ids (one-hot
    pre-built by ``_tile_onehot``): row deltas collapse onto (C, width)
    blocks via a one-hot matmul on the MXU, and only ``C/S`` as many rows
    hit the XLA scatter (the per-row-op bottleneck — ~6ns/row at 128
    lanes, ~17ns at 256)."""
    bs, kp = rows.shape
    agg = jnp.einsum(
        "tsc,tsk->tck", oh, rows.reshape(bs // S, S, kp),
        preferred_element_type=jnp.float32,
    )
    return table.at[_tile_block_idx(tile_base, C)].add(
        agg.reshape(-1, kp), mode="promise_in_bounds"
    )


def _tile_gather(
    table: jax.Array,
    oh: jax.Array,
    tile_base: jax.Array,
    S: int,
    C: int,
) -> jax.Array:
    """``table[ids]`` for per-tile-sorted ids: block-load each tile's
    [base, base+C) rows (C/S as many row-gathers) and expand back to
    per-entry rows with the (shared) one-hot on the MXU."""
    kp = table.shape[1]
    T = oh.shape[0]
    blk = table.at[_tile_block_idx(tile_base, C)].get(
        mode="promise_in_bounds"
    ).reshape(T, C, kp)
    out = jnp.einsum("tsc,tck->tsk", oh, blk,
                     preferred_element_type=jnp.float32)
    return out.reshape(T * S, kp)


# -- shared batch-leaf helpers for trainers that ride the tile machinery
# (SVD++, BPR, NMF): the primary side's ops share one one-hot per batch,
# the other side's scatter rides the secondary tiles, and each helper
# degrades to the plain per-row op when tile metadata is absent.  The
# ``key`` arg names the id leaf the op indexes by — "u"/"i"; it defaults
# to the user-primary layout SVD++/BPR require, while either-primary
# trainers (NMF) pass the pack's actual orientation.


def tile_batch_xs(data: "RatingBatches", include_sec: bool = True,
                  with_ratings: bool = True,
                  primary: Optional[str] = "user"):
    """Per-batch scan-leaf dict + static (S, C) tile shapes.

    Returns ``(xs, agg_prim, agg_sec)``; ``xs`` leaves all have leading
    dim ``nb`` so a batch-order permutation can be applied uniformly.
    ``primary`` asserts the pack orientation a trainer's math needs;
    pass ``None`` to accept either orientation."""
    if primary is not None and data.primary != primary:
        raise ValueError(
            f"trainer needs pack_ratings(order={primary!r}) data, "
            f"got primary={data.primary!r}")
    xs = {"u": data.user_ids, "i": data.item_ids, "w": data.weights}
    if with_ratings:
        xs["r"] = data.ratings
    agg_prim = (0, 0)
    if data.agg_prim[1]:
        xs["pb"] = data.prim_tile_base
        agg_prim = data.agg_prim
    agg_sec = (0, 0)
    if include_sec and data.agg_sec[1]:
        xs["ss"] = data.sec_ids_sorted
        xs["sp"] = data.sec_perm
        xs["sb"] = data.sec_tile_base
        agg_sec = data.agg_sec
    return xs, agg_prim, agg_sec


def tile_prim_onehot(b: dict, agg_prim, key: str = "u"):
    return (_tile_onehot(b[key], b["pb"], *agg_prim)
            if agg_prim[1] else None)


def tile_prim_gather(table, b, oh, agg_prim, expand, key: str = "u"):
    if oh is not None and expand:
        return _tile_gather(table, oh, b["pb"], *agg_prim)
    return table.at[b[key]].get(mode="promise_in_bounds")


def tile_prim_scatter(table, rows, b, oh, agg_prim, key: str = "u"):
    if oh is not None:
        return _tile_scatter_add(table, rows, oh, b["pb"], *agg_prim)
    return table.at[b[key]].add(rows, mode="promise_in_bounds")


def tile_sec_scatter(table, rows, b, agg_sec, key: str = "i"):
    if agg_sec[1]:
        oh = _tile_onehot(b["ss"], b["sb"], *agg_sec)
        return _tile_scatter_add(table, rows[b["sp"]], oh, b["sb"],
                                 *agg_sec)
    return table.at[b[key]].add(rows, mode="promise_in_bounds")


# fused Pallas step mode: "auto" = on for TPU backends when the pack
# carries primary tile metadata and the row has stash lanes free; "off"
# = always the XLA einsum path; "interpret" = force the kernel in
# interpret mode (CPU equivalence tests)
FUSED_STEP = "auto"

# emit the fused step's secondary deltas as bf16 (the sec TILE einsum
# reads bf16 operands on TPU either way).  Default OFF — measured
# NEGATIVE at config 5 (54.2M vs 56.3M): the delta permutation is
# row-transaction-bound, not byte-bound (2M random row reads at the
# ~6-10ns/row row-op cost regardless of width), and the packed (2,1)
# bf16 layout adds extraction shuffles.  Kept as a tested capability
# (tests/test_pallas_sgd.py::test_fused_sec_bf16_deltas_close).
FUSED_SEC_BF16 = False

# smallest batch the fused step wins at: per-batch kernel dispatch +
# grid overhead dominate small batches (measured at the headline shape:
# XLA wins 76/77/96/103M vs fused 65/75/88/97M at bs=8k/16k/32k/64k;
# fused wins 107.6 vs 101.8M at bs=128k, and everywhere above)
FUSED_MIN_BATCH = 131_072


def _fused_step_enabled(cfg: SGDConfig, data: "RatingBatches") -> bool:
    if FUSED_STEP == "off":
        return False
    if not data.agg_prim[1]:
        return False
    if not (cfg.update_user_params and cfg.update_item_params):
        return False
    if cfg.shuffle == "full" or cfg.aggregate == "none":
        return False
    if cfg.kernel not in ("linear", "sigmoid", "rbf"):
        return False
    from matrix_factorization_tpu.ops.pallas_sgd import has_stash_room

    if not has_stash_room(cfg):
        return False
    if FUSED_STEP == "interpret":
        return True
    # the PACK's batch width, not cfg.batch_size — they can diverge,
    # and the measured win threshold is about what reaches the kernel
    if data.user_ids.shape[1] < FUSED_MIN_BATCH:
        return False
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - backend init failure
        return False
    return backend in ("tpu", "axon")


def fused_tile_deltas(prim_tbl, sec_tbl, b: dict, cfg: SGDConfig, mu, lr,
                      reg, agg_prim: Tuple[int, int], prim_is_user: bool):
    """Both sides' deltas from the fused Pallas step (ops/pallas_sgd.py).

    Returns ``(bidx, agg, dq)``: the primary block-row indices, the
    aggregated primary deltas to ``.at[bidx].add``, and per-entry
    secondary deltas in batch order.  Shared by the single-device
    minibatch (``_minibatch_update``) and the dp tiled step
    (``parallel.distributed._tile_step_acc`` — there ``sec_tbl`` is the
    window-frozen Q replica and ``dq`` goes to the item accumulator).

    r/w/tile-local-index ride in three spare padding lanes of the
    gathered secondary rows, set by ONE fused select (three
    ``.at[:, c].set`` calls each re-materialize the whole (bs, Kp)
    gather output — measured 29.4M vs 56.3M updates/s at config 5)."""
    from matrix_factorization_tpu.ops import pallas_sgd

    S, C = agg_prim
    kp = prim_tbl.shape[1]
    prim_ids = b["u"] if prim_is_user else b["i"]
    sids = b["i"] if prim_is_user else b["u"]
    bidx = _tile_block_idx(b["pb"], C)
    blk = prim_tbl.at[bidx].get(mode="promise_in_bounds")
    lidx = prim_ids - jnp.repeat(b["pb"], S)
    sec_rows = sec_tbl.at[sids].get(mode="promise_in_bounds")
    sc = pallas_sgd.stash_col(cfg)
    col = jnp.arange(kp, dtype=jnp.int32)[None, :]
    qis = jnp.where(
        col == sc, b["r"][:, None],
        jnp.where(col == sc + 1, b["w"][:, None],
                  jnp.where(col == sc + 2,
                            lidx.astype(jnp.float32)[:, None],
                            sec_rows)))
    pmask = jnp.asarray(
        update_mask(cfg, "user" if prim_is_user else "item"))
    smask = jnp.asarray(
        update_mask(cfg, "item" if prim_is_user else "user"))
    cmask = np.zeros(kp, np.float32)
    cmask[: cfg.n_factors + 2] = 1.0
    agg, dq = pallas_sgd.fused_tile_step(
        cfg, blk, qis, mu, lr, reg,
        pmask, smask, jnp.asarray(cmask), S=S, C=C,
        sec_bf16=bool(FUSED_SEC_BF16 and "sb" in b),
        interpret=(FUSED_STEP == "interpret"),
    )
    return bidx, agg, dq


def _minibatch_update(
    params: MFParams,
    b: dict,
    cfg: SGDConfig,
    lr,
    agg_prim: Tuple[int, int],
    agg_sec: Tuple[int, int],
    primary: str,
    expand_prim: bool,
    reg=None,
    use_fused: bool = False,
) -> MFParams:
    """One synchronous mini-batch update; per-side scatter or tile path.

    The batch is stored sorted by the ``primary`` side when tile metadata
    is present; that side's gather AND scatter both ride one one-hot
    (``_tile_gather``/``_tile_scatter_add``), the secondary side's deltas
    are permuted to sorted order for its tile scatter.

    ``reg`` optionally overrides ``cfg.reg`` with a TRACED value — the
    hook that lets ``ops/sweep.py`` vmap one trained program over a
    hyperparameter grid."""
    u, i, r, w = b["u"], b["i"], b["r"], b["w"]
    if reg is None:
        reg = cfg.reg
    prim_is_user = primary == "user"
    prim_ids = u if prim_is_user else i

    if use_fused and "pb" in b:
        # one Pallas program replaces the primary gather-expand,
        # forward/gradient chain and aggregate einsum (ops/pallas_sgd.py);
        # XLA keeps the cheap C/S-sized block gather/scatter and the
        # whole secondary apply.
        prim_attr = "user_features" if prim_is_user else "item_features"
        sec_attr = "item_features" if prim_is_user else "user_features"
        prim_tbl = getattr(params, prim_attr)
        sec_tbl = getattr(params, sec_attr)
        sids = i if prim_is_user else u
        bidx, agg, dq = fused_tile_deltas(
            prim_tbl, sec_tbl, b, cfg, params.global_mean, lr, reg,
            agg_prim, prim_is_user)
        prim_tbl = prim_tbl.at[bidx].add(agg, mode="promise_in_bounds")
        sec_tbl = tile_sec_scatter(sec_tbl, dq, b, agg_sec,
                                   key="i" if prim_is_user else "u")
        return params._replace(**{prim_attr: prim_tbl, sec_attr: sec_tbl})

    oh_prim = None
    if "pb" in b:
        oh_prim = _tile_onehot(prim_ids, b["pb"], *agg_prim)
    if oh_prim is not None and expand_prim:
        prim_rows = _tile_gather(
            params.user_features if prim_is_user else params.item_features,
            oh_prim, b["pb"], *agg_prim,
        )
    else:
        tbl = params.user_features if prim_is_user else params.item_features
        prim_rows = tbl.at[prim_ids].get(mode="promise_in_bounds")
    sec_ids = i if prim_is_user else u
    sec_tbl = params.item_features if prim_is_user else params.user_features
    sec_rows = sec_tbl.at[sec_ids].get(mode="promise_in_bounds")
    pu, qi = (prim_rows, sec_rows) if prim_is_user else (sec_rows, prim_rows)

    pred, d_pu, d_qi = ext_forward_and_rowgrads(cfg, params.global_mean, pu, qi)
    err = (pred - r) * w

    def side_delta(rows, d_rows, side):
        mask = jnp.asarray(update_mask(cfg, side))
        g = (err[:, None] * d_rows
             + (reg * w)[:, None] * rows) * mask[None, :]
        return -lr * g

    new = params

    def apply_prim(table, delta):
        if oh_prim is not None:
            return _tile_scatter_add(table, delta, oh_prim, b["pb"],
                                     *agg_prim)
        return table.at[prim_ids].add(delta, mode="promise_in_bounds")

    def apply_sec(table, delta):
        if "sb" in b:
            oh = _tile_onehot(b["ss"], b["sb"], *agg_sec)
            return _tile_scatter_add(table, delta[b["sp"]], oh, b["sb"],
                                     *agg_sec)
        return table.at[sec_ids].add(delta, mode="promise_in_bounds")

    if cfg.update_user_params:
        delta = side_delta(pu, d_pu, "user")
        apply = apply_prim if prim_is_user else apply_sec
        new = new._replace(user_features=apply(new.user_features, delta))
    if cfg.update_item_params:
        delta = side_delta(qi, d_qi, "item")
        apply = apply_sec if prim_is_user else apply_prim
        new = new._replace(item_features=apply(new.item_features, delta))
    return new


# ---------------------------------------------------------------------------
# Epoch and multi-epoch drivers
# ---------------------------------------------------------------------------


def epoch_xs(data: RatingBatches, cfg: SGDConfig):
    """Scan-leaf dict + static tile shapes honoring the
    ``cfg.shuffle``/``cfg.aggregate`` gates — shared by the single-device
    epoch and the data-parallel tiled trainer
    (``parallel/distributed.py``)."""
    xs = {
        "u": data.user_ids, "i": data.item_ids,
        "r": data.ratings, "w": data.weights,
    }
    agg_prim = agg_sec = (0, 0)
    expand_prim = False
    if cfg.shuffle != "full" and cfg.aggregate != "none":
        # primary tile meta serves the gather-expand too, so it is used
        # even when that side's update is frozen
        if data.agg_prim[1]:
            xs["pb"] = data.prim_tile_base
            agg_prim = data.agg_prim
            expand_prim = data.expand_prim
        sec_updated = (
            cfg.update_item_params if data.primary == "user"
            else cfg.update_user_params
        )
        if data.agg_sec[1] and sec_updated:
            xs["ss"] = data.sec_ids_sorted
            xs["sp"] = data.sec_perm
            xs["sb"] = data.sec_tile_base
            agg_sec = data.agg_sec
    return xs, agg_prim, agg_sec, expand_prim


def shuffle_xs(xs: dict, key: jax.Array, cfg: SGDConfig, nb: int) -> dict:
    """Apply the per-epoch visit-order shuffle to the scan leaves."""
    if cfg.shuffle == "full":
        n_pad = nb * cfg.batch_size
        perm = jax.random.permutation(key, n_pad)
        return {
            k: v.reshape(-1)[perm].reshape(nb, cfg.batch_size)
            for k, v in xs.items()
        }
    if cfg.shuffle == "batch":
        bperm = jax.random.permutation(key, nb)
        return {k: v[bperm] for k, v in xs.items()}
    if cfg.shuffle != "none":
        raise ValueError(f"unknown shuffle {cfg.shuffle!r}")
    return xs


def _epoch(params: MFParams, key: jax.Array, data: RatingBatches,
           cfg: SGDConfig, lr, reg=None, allow_fused: bool = True):
    nb = data.user_ids.shape[0]
    xs, agg_prim, agg_sec, expand_prim = epoch_xs(data, cfg)
    xs = shuffle_xs(xs, key, cfg, nb)
    use_fused = allow_fused and _fused_step_enabled(cfg, data)

    def body(p, batch):
        return _minibatch_update(p, batch, cfg, lr, agg_prim, agg_sec,
                                 data.primary, expand_prim, reg=reg,
                                 use_fused=use_fused), None

    params, _ = jax.lax.scan(body, params, xs)
    return params


def masked_sse(params: MFParams, data: RatingBatches, cfg: SGDConfig,
               init=None) -> jax.Array:
    """Sum of squared errors over the (padded) rating stream, batched to
    bound the gather working set. Mirrors the reference's per-epoch full
    train pass (``kernel_matrix_factorization.py:428-440``).
    ``init`` overrides the zero accumulator — shard_map callers pass a
    ``pcast(..., to='varying')`` zero so the scan carry types match."""
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

    sse, _ = jax.lax.scan(
        body, jnp.float32(0.0) if init is None else init, xs)
    return sse


def sgd_train(
    params: MFParams,
    data: RatingBatches,
    key: jax.Array,
    cfg: SGDConfig,
    n_epochs: int,
    lr: float,
    reg=None,
    allow_fused: bool = True,
) -> Tuple[MFParams, jax.Array]:
    """Run ``n_epochs`` epochs; returns (params, per-epoch train RMSE).

    The whole multi-epoch fit is a single traced program (scan over epochs)
    so the device never round-trips to the host.  ``reg`` optionally
    overrides ``cfg.reg`` with a traced value (vmap'd sweeps).
    """
    keys = jax.random.split(key, n_epochs)

    def body(p, k):
        p = _epoch(p, k, data, cfg, lr, reg=reg, allow_fused=allow_fused)
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
