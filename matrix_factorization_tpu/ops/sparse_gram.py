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
    """Host prep: group COO entries by user block; pad blocks to equal nnz."""
    order = np.argsort(u // block, kind="stable")
    u, i, r = u[order], i[order], r[order]
    n_blocks = (n_entities + block - 1) // block
    counts = np.bincount(u // block, minlength=n_blocks)
    max_nnz = max(1, int(counts.max()))
    max_nnz = round_up(max_nnz, 8)
    ub = np.zeros((n_blocks, max_nnz), np.int32)  # local row within block
    ib = np.zeros((n_blocks, max_nnz), np.int32)
    rb = np.zeros((n_blocks, max_nnz), np.float32)
    start = 0
    for b in range(n_blocks):
        c = int(counts[b])
        sl = slice(start, start + c)
        ub[b, :c] = u[sl] - b * block
        ib[b, :c] = i[sl]
        rb[b, :c] = r[sl]  # pads have r=0: scatter-adds nothing
        start += c
    return ub, ib, rb, n_blocks


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


@functools.partial(jax.jit, static_argnames=("k", "n_valid"))
def _strip_topk(gram_strip, col_ids, sums, n_users, norms_sq, k, n_valid):
    """Centered-cosine top-k for one strip of items (columns)."""
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
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Top-k centered-cosine item neighbors from sparse COO ratings.

    Returns (neighbor_sims (n_items, k), neighbor_ids (n_items, k),
    col_means (n_items,), col_sums-derived norms — means returned for the
    prediction formula).  For user-user similarity call with (i, u, r) and
    swapped counts.
    """
    u = np.asarray(u, np.int32)
    i = np.asarray(i, np.int32)
    r = np.asarray(r, np.float32)
    k = min(k, n_items - 1)
    items_pad = round_up(n_items, 8)

    ub, ib, rb, _ = _bucket_by_block(u, i, r, n_users, user_block)
    ubj, ibj, rbj = jnp.asarray(ub), jnp.asarray(ib), jnp.asarray(rb)

    # column sums and self-dots (one pass)
    sums = np.zeros(items_pad, np.float32)
    np.add.at(sums, i, r)
    self_dot = np.zeros(items_pad, np.float32)
    np.add.at(self_dot, i, r * r)
    means = sums / max(1, n_users)
    norms_sq = self_dot - n_users * means**2
    sums_j = jnp.asarray(sums)
    norms_j = jnp.asarray(np.maximum(norms_sq, 0.0))

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

    out_sims = np.empty((n_items, k), np.float32)
    out_ids = np.empty((n_items, k), np.int32)
    for glo in range(0, n_items, group_cols):
        gcols = min(group_cols, items_pad - glo)
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
            hi = min(lo + cols, n_items)
            out_sims[lo:hi] = np.asarray(vals)[: hi - lo]
            out_ids[lo:hi] = np.asarray(idx)[: hi - lo]
        del acc
    return out_sims, out_ids, means[:n_items], np.sqrt(
        np.maximum(norms_sq[:n_items], 0.0)
    )
