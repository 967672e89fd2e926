"""Batched TF-IDF scoring on the accelerator via blocked sparse-dense
matmuls.

Single-query TF-IDF scoring stays on the host (a query touches ~10
columns; scipy's CSR dot is microseconds).  For *batched* workloads —
reranker training sweeps, judged audit batches, bulk eval — this module
scores B queries against the whole catalog on the MXU by streaming the
sparse matrix through dense vocab blocks:

    scores (B, items) = sum_over_vocab_blocks  Qd[:, blk] @ M[:, blk]^T

where ``Qd[:, blk]`` is the dense query block (B x block) and
``M[:, blk]`` is the CSC column block densified on device from its COO
entries.  Peak memory = one query block + one catalog block — never the
dense (items x vocab) matrix (2.2M recipes x 50k vocab would be 440GB).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from matrix_factorization_tpu.ops.segment_sgd import round_up
from matrix_factorization_tpu.retrieval.index import TfidfItemIndex


@functools.partial(jax.jit, static_argnames=("n_items", "block"))
def _block_scores(qd_block, rows, cols_local, vals, n_items, block):
    """Qd_block (B, block) @ densify(rows, cols_local, vals)^T -> (B, items)."""
    M_blk = jnp.zeros((n_items, block), jnp.float32).at[rows, cols_local].add(
        vals, mode="drop"
    )
    return jax.lax.dot_general(
        qd_block, M_blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def tfidf_batch_scores(
    index: TfidfItemIndex,
    queries: List[str],
    vocab_block: int = 8192,
) -> np.ndarray:
    """(B, n_items) cosine scores for a batch of query strings."""
    Qs = index.vectorizer.transform(queries)  # (B, vocab) CSR, l2-normed
    M = index.matrix.tocoo()
    n_items = int(index.matrix.shape[0])
    vocab = int(index.matrix.shape[1])
    n_items_pad = round_up(n_items, 8)
    B = len(queries)

    # bucket the catalog entries by vocab block once
    order = np.argsort(M.col // vocab_block, kind="stable")
    rows_all = M.row[order].astype(np.int32)
    cols_all = M.col[order].astype(np.int32)
    vals_all = M.data[order].astype(np.float32)
    blk_of = cols_all // vocab_block
    n_blocks = (vocab + vocab_block - 1) // vocab_block
    counts = np.bincount(blk_of, minlength=n_blocks)
    offsets = np.concatenate([[0], np.cumsum(counts)])

    Qd = np.asarray(Qs.todense(), np.float32)  # (B, vocab): B is small
    scores = jnp.zeros((B, n_items_pad), jnp.float32)
    nnz_pad = round_up(int(counts.max()) if len(counts) else 1, 8)
    for b in range(n_blocks):
        lo, hi = int(offsets[b]), int(offsets[b + 1])
        if hi == lo:
            continue
        qd_block = np.zeros((B, vocab_block), np.float32)
        width = min(vocab_block, vocab - b * vocab_block)
        qd_block[:, :width] = Qd[:, b * vocab_block : b * vocab_block + width]
        if not qd_block.any():
            continue  # no query touches this vocab block
        rows = np.zeros(nnz_pad, np.int32)
        cols = np.zeros(nnz_pad, np.int32)
        vals = np.zeros(nnz_pad, np.float32)
        rows[: hi - lo] = rows_all[lo:hi]
        cols[: hi - lo] = cols_all[lo:hi] - b * vocab_block
        vals[: hi - lo] = vals_all[lo:hi]
        scores = scores + _block_scores(
            jnp.asarray(qd_block), jnp.asarray(rows), jnp.asarray(cols),
            jnp.asarray(vals), n_items_pad, vocab_block,
        )
    return np.asarray(scores)[:, :n_items]


def tfidf_batch_topk(
    index: TfidfItemIndex, queries: List[str], k: int,
    vocab_block: int = 8192, mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k (scores, positions) per query, computed on device.

    ``mesh``: optional ``jax.sharding.Mesh`` — the catalog item-shards
    over every mesh axis and candidates merge via all_gather + re-top-k
    (:func:`tfidf_csr_topk`), for indexes past one chip's HBM."""
    if mesh is not None:
        return tfidf_csr_topk(index, index.vectorizer.transform(queries),
                              k, mesh, vocab_block=vocab_block)
    scores = tfidf_batch_scores(index, queries, vocab_block)
    k = min(k, scores.shape[1])
    vals, idx = jax.lax.top_k(jnp.asarray(scores), k)
    return np.asarray(vals), np.asarray(idx)


_csr_topk_cache: dict = {}


def tfidf_csr_topk(
    index: TfidfItemIndex, Qs, k: int, mesh,
    vocab_block: int = 8192,
) -> Tuple[np.ndarray, np.ndarray]:
    """Mesh-sharded batched TF-IDF top-k from an encoded sparse query
    matrix ``Qs`` (B, vocab CSR).

    The catalog rows (items) shard over EVERY mesh axis; each device
    densifies its shard's vocab blocks, accumulates
    ``Qd[:, blk] @ M_shard[:, blk]^T`` on its MXU, takes a local
    ``lax.top_k`` and the per-device candidates merge via all_gather +
    re-top-k — the same O(n_dev * k) merge as ``parallel/topk.py``.
    Per-device peak memory = one (items_local, vocab_block) tile, so
    catalog capacity scales with the fleet (2.2M-recipe indexes exceed
    one chip densified).  Returns (scores, global positions) (B, k).

    Layout note: entries pad to the max per-(device, block) nnz — a
    pathologically skewed block inflates every bucket; acceptable for
    TF-IDF matrices (l2-normalized, bounded terms/doc), flagged here for
    honesty.  Reference counterpart: the host scipy loop of
    ``project_template/app/retrieval.py:80-99``.
    """
    import scipy.sparse as sp
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    M = index.matrix.tocoo()
    n_items, vocab = index.matrix.shape
    axes = tuple(mesh.axis_names)
    n_dev = mesh.devices.size
    items_per = round_up(n_items, 8 * n_dev) // n_dev
    n_blocks = (vocab + vocab_block - 1) // vocab_block
    B = Qs.shape[0]
    k = min(k, n_items)

    dev_of = M.row // items_per
    blk_of = M.col // vocab_block
    key = dev_of * n_blocks + blk_of
    order = np.argsort(key, kind="stable")
    rows = (M.row - dev_of * items_per).astype(np.int32)[order]
    cols = (M.col - blk_of * vocab_block).astype(np.int32)[order]
    vals = M.data.astype(np.float32)[order]
    counts = np.bincount(key[order], minlength=n_dev * n_blocks)
    nnz_pad = round_up(max(int(counts.max()) if len(counts) else 1, 8), 8)
    offs = np.concatenate([[0], np.cumsum(counts)])
    rows_b = np.zeros((n_dev, n_blocks, nnz_pad), np.int32)
    cols_b = np.zeros((n_dev, n_blocks, nnz_pad), np.int32)
    vals_b = np.zeros((n_dev, n_blocks, nnz_pad), np.float32)
    flat_r = rows_b.reshape(-1, nnz_pad)
    flat_c = cols_b.reshape(-1, nnz_pad)
    flat_v = vals_b.reshape(-1, nnz_pad)
    for g in range(n_dev * n_blocks):
        lo, hi = int(offs[g]), int(offs[g + 1])
        if hi > lo:
            flat_r[g, : hi - lo] = rows[lo:hi]
            flat_c[g, : hi - lo] = cols[lo:hi]
            flat_v[g, : hi - lo] = vals[lo:hi]

    Qd = np.zeros((n_blocks, B, vocab_block), np.float32)
    Qcsr = sp.csr_matrix(Qs)
    dense = np.asarray(Qcsr.todense(), np.float32)  # (B, vocab): B small
    for b in range(n_blocks):
        w = min(vocab_block, vocab - b * vocab_block)
        Qd[b, :, :w] = dense[:, b * vocab_block : b * vocab_block + w]

    cache_key = (rows_b.shape, B, k, items_per, vocab_block, mesh)
    fn = _csr_topk_cache.get(cache_key)
    if fn is None:

        def local(r_l, c_l, v_l, qd, n_valid):
            shard = jnp.int32(0)
            for a in axes:
                shard = shard * mesh.shape[a] + jax.lax.axis_index(a)

            def body(acc, xs):
                rr, cc, vv, qb = xs
                M_blk = jnp.zeros((items_per, vocab_block), jnp.float32
                                  ).at[rr, cc].add(vv, mode="drop")
                acc = acc + jax.lax.dot_general(
                    qb, M_blk, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return acc, None

            acc = jax.lax.pcast(jnp.zeros((B, items_per), jnp.float32),
                                axes, to="varying")
            acc, _ = jax.lax.scan(body, acc, (r_l[0], c_l[0], v_l[0], qd))
            gids = shard * items_per + jnp.arange(items_per,
                                                  dtype=jnp.int32)
            acc = jnp.where(gids[None, :] < n_valid, acc, -jnp.inf)
            kk = min(k, items_per)
            lv, li = jax.lax.top_k(acc, kk)
            gi = li + shard * items_per
            lv_g = jax.lax.all_gather(lv, axes, axis=1, tiled=True)
            gi_g = jax.lax.all_gather(gi, axes, axis=1, tiled=True)
            mv, mp = jax.lax.top_k(lv_g, min(k, lv_g.shape[1]))
            return mv, jnp.take_along_axis(gi_g, mp, axis=1)

        fn = jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(Pspec(axes), Pspec(axes), Pspec(axes), Pspec(),
                      Pspec()),
            out_specs=(Pspec(), Pspec()),
            check_vma=False,  # all_gather+merge leaves outputs replicated
        ))
        _csr_topk_cache[cache_key] = fn

    shard = NamedSharding(mesh, Pspec(axes))
    rep = NamedSharding(mesh, Pspec())
    mv, mg = fn(jax.device_put(rows_b, shard), jax.device_put(cols_b, shard),
                jax.device_put(vals_b, shard), jax.device_put(Qd, rep),
                jnp.int32(n_items))
    return np.asarray(mv), np.asarray(mg)
