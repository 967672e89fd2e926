"""Tiled sparse-dense similarity for CF at MovieLens-25M scale.

The exact CF models (``ops/similarity.py``) materialize the dense
user x item matrix and the full similarity matrix — fine to ~20k x 20k,
impossible at 162k users x 59k items (the dense centered matrix alone is
38GB).  This module computes **top-k cosine neighbors under the
reference's centering semantics without ever materializing the centered
matrix**, using the rank-1 structure of centering:

    means over the 0-filled axis:      m_j = s_j / n           (s_j = col sum)
    centered gram:   <C_a, C_b> = <x_a, x_b> - n * m_a * m_b
    norms:           |C_j|^2     = <x_j, x_j> - n * m_j^2

``<x_a, x_b>`` (the sparse gram) is accumulated as **user-blocked dense
MXU matmuls**: ratings are bucketed into user blocks on the host, each
block is scattered into a (block x items) dense tile on device, and
``X_b^T @ X_b[:, J]`` accumulates into an output item-tile column strip.
Per-strip peak memory = one block tile + one strip — independent of the
full similarity matrix size.  Top-k neighbors are taken per strip.
(``group_budget_bytes`` can widen the accumulation groups to trade
memory for fewer dense-X rebuild passes; measured SLOWER at ML-25M
scale — see the comment in :func:`similarity_topk` — so it defaults
off.)

Works symmetrically for user-user similarity by swapping the roles of the
axes (pass transposed coordinates).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from matrix_factorization_tpu.ops.segment_sgd import round_up


def _bucket_by_block(u, i, r, n_entities: int, block: int):
    """Group COO entries by entity block; pad blocks to equal nnz ON
    DEVICE from a compressed flat stream.

    Two findings shape this function (measured at ML-25M scale on the
    remote-TPU image):

    * ``max_nnz`` bakes into the compiled accumulator's shapes — without
      pow2 rounding every dataset (different id layout -> different
      per-block max) recompiles a ~4-minute program.  Rounding makes the
      shapes stable so the persistent compile cache hits.
    * Host->device transfer is the REAL cost of the old host-padded
      layout: (n_blocks, max_nnz) x 12B = 503MB crawled through the
      link at the first strip call.  Instead the flat block-sorted
      stream is sent compressed — local row as int16 (block <= 32768),
      the counterpart id as uint16 when it fits, the rating as int8
      half-steps when exact — and one device scatter builds the padded
      buckets.  25M ratings: 503MB -> ~125MB on the wire.

    Pad entries carry rating 0 and scatter-add nothing."""
    # counts are order-invariant — compute them from the raw stream, so
    # only (i, r) need the entity-stable sort
    n_blocks = (n_entities + block - 1) // block
    counts = np.bincount(u // block, minlength=n_blocks)
    max_nnz = max(8, int(counts.max()))
    max_nnz = 1 << (max_nnz - 1).bit_length()
    block_start = np.concatenate(
        [[0], np.cumsum(counts)]
    ).astype(np.int32)

    # the stream is sorted by u, so the per-entry row index never
    # crosses the wire at all: per-entity counts (n_entities x 4B) go
    # instead, and the device reconstructs u per entry with one
    # scatter-of-ones + cumsum (round-3 lever: 5B/nnz -> 3B/nnz,
    # ~125MB -> ~75MB at 25M ratings through the tunnel)
    entity_counts = np.bincount(u, minlength=n_entities).astype(np.int32)
    from matrix_factorization_tpu.data.loader import get_native_lib

    lib = get_native_lib()
    if lib is not None and len(u):
        # native stable counting sort: O(n + n_entities) vs numpy's
        # full argsort + two fancy gathers
        i_s = np.empty(len(i), np.int32)
        r_s = np.empty(len(r), np.float32)
        lib.mf_sort_pairs_by_key(
            np.ascontiguousarray(u, np.int32),
            np.ascontiguousarray(i, np.int32),
            np.ascontiguousarray(r, np.float32),
            len(u), n_entities, i_s, r_s)
        i, r = i_s, r_s
    else:
        order = np.argsort(u, kind="stable")
        i, r = i[order], r[order]
    if len(i) and int(i.max()) < 65536:
        i_c = i.astype(np.uint16)
    else:
        i_c = i.astype(np.int32)
    r2 = r * 2.0
    if (np.abs(r) <= 63).all() and (r2 == np.round(r2)).all():
        r_c = r2.astype(np.int8)  # exact half-step ratings
        r_scale = 0.5
    else:
        r_c = r.astype(np.float32)
        r_scale = 1.0
    # only the compressed flat stream + the offset/count vectors cross
    # the host->device link; rows, block ids and slots are derived on
    # device
    ub, ib, rb = _build_buckets(
        jnp.asarray(entity_counts), jnp.asarray(i_c), jnp.asarray(r_c),
        jnp.asarray(block_start), n_blocks, max_nnz, r_scale, block,
    )
    return ub, ib, rb, n_blocks


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "max_nnz", "r_scale",
                                    "block"))
def _build_buckets(entity_counts, i_c, r_c, block_start, n_blocks,
                   max_nnz, r_scale, block):
    """Flat entity-sorted stream -> padded buckets, fully on device.

    Entries are contiguous per block, so each padded row is just a
    ``max_nnz``-wide contiguous WINDOW of the flat stream starting at
    the block's offset, masked down to the block's count — one vmapped
    dynamic_slice per array, no per-entry scatter and nothing per-entry
    beyond the compressed values crossing the host->device link.

    The per-entry entity index is reconstructed here rather than sent:
    the stream is sorted by entity, so scattering a 1 at each entity's
    start offset (multiple empty entities collapse onto one offset and
    their 1s sum — the cumsum then lands on the right non-empty entity)
    and prefix-summing yields ``u`` for every entry."""
    n = i_c.shape[0]
    entity_starts = jnp.cumsum(entity_counts) - entity_counts
    marks = jnp.zeros((max(n, 1),), jnp.int32).at[entity_starts].add(
        1, mode="drop"
    )
    u_flat = (jnp.cumsum(marks) - 1)[:n]
    u_loc = (u_flat - (u_flat // block) * block).astype(jnp.int32)
    counts = block_start[1:] - block_start[:-1]  # (n_blocks,)
    starts = block_start[:-1]
    keep = (
        jnp.arange(max_nnz, dtype=jnp.int32)[None, :] < counts[:, None]
    )

    def windows(vals, dtype):
        # over-read room: windows may run past the end of the stream
        padded = jnp.concatenate(
            [vals, jnp.zeros((max_nnz,), vals.dtype)]
        )
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(padded, (s,), (max_nnz,))
        )(starts)
        return jnp.where(keep, win.astype(dtype), 0)

    ub = windows(u_loc, jnp.int32)
    ib = windows(i_c, jnp.int32)
    rb = windows(r_c, jnp.float32)
    if r_scale != 1.0:
        rb = rb * r_scale
    return ub, ib, rb


@functools.partial(jax.jit, static_argnames=("block", "n_items", "tile_lo_is_static"))
def _strip_accumulate(ub, ib, rb, tile_lo, tile_cols, block, n_items,
                      tile_lo_is_static=False):
    """sum_b X_b^T @ X_b[:, tile_lo:tile_lo+tile_cols] -> (n_items, tile)."""
    del tile_lo_is_static

    def body(acc, xs):
        u_l, i_l, r_l = xs
        Xb = jnp.zeros((block, n_items), jnp.float32).at[u_l, i_l].add(
            r_l, mode="promise_in_bounds"
        )
        strip = jax.lax.dynamic_slice(
            Xb, (0, tile_lo), (block, tile_cols.shape[0])
        )
        acc = acc + jax.lax.dot_general(
            Xb, strip, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, None

    acc = jnp.zeros((n_items, tile_cols.shape[0]), jnp.float32)
    acc, _ = jax.lax.scan(body, acc, (ub, ib, rb))
    return acc


_sharded_accum_cache: dict = {}


def _strip_accumulate_sharded(ub, ib, rb, tile_lo, gcols: int, block: int,
                              n_items: int, mesh):
    """Gram strip with the user blocks SHARDED over the whole mesh.

    Same distribution pattern as ``ops/ease.py::ease_weights_sharded``:
    the gram is a sum over user blocks, so each device scans only its
    block shard and ONE ``psum`` per strip crosses the mesh — exact (the
    summands are independent dense matmuls; float addend order changes
    only by the block regrouping).  Blocks shard jointly over every mesh
    axis: similarity fit is a whole-fleet batch job, not a per-axis
    role like training.  Per-device peak memory = one block tile + one
    strip, so catalog capacity scales with the fleet.

    Reference being scaled: the sklearn ``cosine_similarity`` calls of
    ``collaborative_filtering.py:80-96`` / ``:259-274`` (single-process,
    dense)."""
    from jax.sharding import PartitionSpec as Pspec

    axes = tuple(mesh.axis_names)
    key = (ub.shape, gcols, block, n_items, mesh)
    fn = _sharded_accum_cache.get(key)
    if fn is None:

        def local(ub_l, ib_l, rb_l, lo):
            def body(acc, xs):
                u_l, i_l, r_l = xs
                Xb = jnp.zeros((block, n_items), jnp.float32).at[
                    u_l, i_l
                ].add(r_l, mode="promise_in_bounds")
                strip = jax.lax.dynamic_slice(Xb, (0, lo), (block, gcols))
                acc = acc + jax.lax.dot_general(
                    Xb, strip, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return acc, None

            # each device carries its own partial: mark the zero init
            # device-varying so the scan carry types line up
            acc = jax.lax.pcast(jnp.zeros((n_items, gcols), jnp.float32),
                                axes, to="varying")
            acc, _ = jax.lax.scan(body, acc, (ub_l, ib_l, rb_l))
            return jax.lax.psum(acc, axes)

        fn = jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(Pspec(axes), Pspec(axes), Pspec(axes), Pspec()),
            out_specs=Pspec(),
        ))
        _sharded_accum_cache[key] = fn
    return fn(ub, ib, rb, tile_lo)


def _shard_blocks(ub, ib, rb, mesh):
    """Pad the block axis to the mesh size and lay the buckets out
    block-sharded over every mesh axis.  Pad blocks carry rating 0 and
    contribute an all-zero tile to the gram."""
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    n_dev = mesh.devices.size
    nb = ub.shape[0]
    nb_pad = round_up(nb, n_dev)
    if nb_pad > nb:
        pad = ((0, nb_pad - nb), (0, 0))
        ub = jnp.pad(ub, pad)
        ib = jnp.pad(ib, pad)
        rb = jnp.pad(rb, pad)
    shard = NamedSharding(mesh, Pspec(tuple(mesh.axis_names)))
    return (jax.device_put(ub, shard), jax.device_put(ib, shard),
            jax.device_put(rb, shard))


@functools.partial(jax.jit, static_argnames=("k",))
def _strip_topk(gram_strip, col_ids, sums, n_users, norms_sq, k, n_valid):
    """Centered-cosine top-k for one strip of items (columns).
    ``n_valid`` is traced (only a mask bound) — keeping it static would
    recompile per dataset."""
    n = jnp.float32(n_users)
    m_all = sums / n
    m_cols = m_all[col_ids]
    centered = gram_strip - n * m_all[:, None] * m_cols[None, :]
    denom = jnp.sqrt(jnp.maximum(norms_sq[:, None], 1e-24)) * jnp.sqrt(
        jnp.maximum(norms_sq[col_ids][None, :], 1e-24)
    )
    cos = centered / denom
    # exclude self-similarity and padded rows
    rows = jax.lax.broadcasted_iota(jnp.int32, cos.shape, 0)
    cos = jnp.where(rows == col_ids[None, :], -jnp.inf, cos)
    cos = jnp.where(rows >= n_valid, -jnp.inf, cos)
    vals, idx = jax.lax.top_k(cos.T, k)  # per column j: top-k neighbor rows
    return vals, idx


def similarity_topk(
    u: np.ndarray,
    i: np.ndarray,
    r: np.ndarray,
    n_users: int,
    n_items: int,
    k: int,
    user_block: int = 4096,
    item_tile: int = 4096,
    group_budget_bytes: int = 0,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Top-k centered-cosine item neighbors from sparse COO ratings.

    Returns (neighbor_sims (n_items, k), neighbor_ids (n_items, k),
    col_means (n_items,), col_sums-derived norms — means returned for the
    prediction formula).  For user-user similarity call with (i, u, r) and
    swapped counts.

    ``mesh``: optional ``jax.sharding.Mesh`` — the user blocks shard over
    every mesh axis and each strip's gram partials cross the mesh in one
    exact ``psum`` (:func:`_strip_accumulate_sharded`); the centered-
    cosine top-k then runs on the replicated strip.  Bit-equivalence vs
    the single-device path is regression-tested up to block-regrouping
    float order (tests/test_parallel.py).
    """
    u = np.asarray(u, np.int32)
    i = np.asarray(i, np.int32)
    r = np.asarray(r, np.float32)
    k = min(k, n_items - 1)
    # pad the item axis to a whole number of strips: every strip then
    # compiles to the SAME program (the ragged tail strip would
    # otherwise cost its own multi-minute remote compile)
    items_pad = round_up(n_items, max(8, item_tile))

    ub, ib, rb, _ = _bucket_by_block(u, i, r, n_users, user_block)
    if mesh is not None:
        ubj, ibj, rbj = _shard_blocks(ub, ib, rb, mesh)
    else:
        ubj, ibj, rbj = jnp.asarray(ub), jnp.asarray(ib), jnp.asarray(rb)

    # column sums and self-dots (one bincount pass each; np.add.at is
    # ~10x slower at 25M entries)
    sums = np.bincount(i, weights=r, minlength=items_pad
                       ).astype(np.float32)[:items_pad]
    self_dot = np.bincount(i, weights=r * r, minlength=items_pad
                           ).astype(np.float32)[:items_pad]
    means = sums / max(1, n_users)
    norms_sq = self_dot - n_users * means**2
    sums_j = jnp.asarray(sums)
    norms_j = jnp.asarray(np.maximum(norms_sq, 0.0))
    if mesh is not None:
        # the strip top-k consumes the replicated psum'd strip: its other
        # operands must live replicated on the same mesh devices
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        rep = NamedSharding(mesh, Pspec())
        sums_j = jax.device_put(sums_j, rep)
        norms_j = jax.device_put(norms_j, rep)

    # group_budget_bytes > 0 accumulates the gram in wider column GROUPS
    # (fewer dense-X rebuild passes, each group = one pass).  NEGATIVE
    # RESULT at ML-25M scale: a 4GB budget (16384-col groups, 4 passes
    # instead of 15) measured 491s vs 290s per-strip — the multi-GB scan
    # carry costs more than the rebuild passes it saves.  Default 0 =
    # one strip per group (per-strip accumulation); the knob remains for
    # taller-than-wide workloads where rebuilds dominate.
    if group_budget_bytes > 0:
        group_cols = max(item_tile,
                         int(group_budget_bytes // max(1, items_pad * 4)))
        group_cols = (group_cols // item_tile) * item_tile
    else:
        group_cols = item_tile

    # DISPATCH every strip first, fetch at the end: per-strip
    # ``np.asarray`` fetches used to serialize strip i+1's dispatch
    # behind strip i's result crossing the (shared, load-noisy) tunnel —
    # wall-clock was transfer + compute instead of max(transfer,
    # compute).  Dispatch is async, execution is in-order, and each
    # group's accumulator is freed once its top-k consumes it, so at
    # most ~one group acc is live; the deferred fetches are only the
    # small (tile, k) top-k outputs (~24MB total at ML-25M).
    # (VERDICT r3 #3.)
    out_sims = np.empty((n_items, k), np.float32)
    out_ids = np.empty((n_items, k), np.int32)
    pending = []  # (lo, hi, vals_dev, idx_dev)
    for glo in range(0, n_items, group_cols):
        gcols = min(group_cols, items_pad - glo)
        if mesh is not None:
            acc = _strip_accumulate_sharded(ubj, ibj, rbj, glo, gcols,
                                            user_block, items_pad, mesh)
        else:
            acc = _strip_accumulate(ubj, ibj, rbj, glo,
                                    jnp.arange(glo, glo + gcols,
                                               dtype=jnp.int32),
                                    user_block, items_pad)
        for lo in range(glo, min(glo + gcols, n_items), item_tile):
            cols = min(item_tile, items_pad - lo)
            col_ids = jnp.arange(lo, lo + cols, dtype=jnp.int32)
            strip = jax.lax.dynamic_slice(
                acc, (0, lo - glo), (items_pad, cols)
            )
            vals, idx = _strip_topk(strip, col_ids, sums_j, n_users,
                                    norms_j, k, n_items)
            pending.append((lo, min(lo + cols, n_items), vals, idx))
        del acc
    for lo, hi, vals, idx in pending:
        out_sims[lo:hi] = np.asarray(vals)[: hi - lo]
        out_ids[lo:hi] = np.asarray(idx)[: hi - lo]
    return out_sims, out_ids, means[:n_items], np.sqrt(
        np.maximum(norms_sq[:n_items], 0.0)
    )
