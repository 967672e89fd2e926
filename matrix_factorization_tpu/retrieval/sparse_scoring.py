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
    vocab_block: int = 8192,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k (scores, positions) per query, computed on device."""
    scores = tfidf_batch_scores(index, queries, vocab_block)
    k = min(k, scores.shape[1])
    vals, idx = jax.lax.top_k(jnp.asarray(scores), k)
    return np.asarray(vals), np.asarray(idx)
