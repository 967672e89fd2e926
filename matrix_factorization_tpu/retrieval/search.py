"""Query encoding + top-k search over item indexes.

API parity with the reference (``retrieval.py:64-115``): same return
shapes ``[(item_id, sim)]`` / ``[(pos, item_id, sim)]``.  Dense scoring
runs on the accelerator (matmul + ``lax.top_k``) with the device-resident
embedding matrix cached per index; TF-IDF scoring uses the sparse host
path (a query touches only its own term columns).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from matrix_factorization_tpu.retrieval.encode import embed_texts
from matrix_factorization_tpu.retrieval.index import (
    DenseItemIndex,
    TfidfItemIndex,
)

IndexT = Union[DenseItemIndex, TfidfItemIndex]

# weak-keyed: entries die with their index (no id-reuse staleness, no
# device-memory leak across index reloads)
import weakref

_device_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _device_embeddings(index: DenseItemIndex) -> jax.Array:
    arr = _device_cache.get(index)
    if arr is None:
        arr = jnp.asarray(index.embeddings)
        _device_cache[index] = arr
    return arr


def encode_query(text: str, model_name: Optional[str] = None,
                 dim: int = 512) -> np.ndarray:
    return embed_texts([text], model_name=model_name, dim=dim)[0]


def encode_query_for_index(
    index: IndexT, text: str, model_name: Optional[str] = None
) -> object:
    """TF-IDF -> sparse vector via the fitted vectorizer; dense -> embedding
    (reference retrieval.py:70-77)."""
    if isinstance(index, TfidfItemIndex):
        return index.vectorizer.transform([text])
    dim = index.embeddings.shape[1]
    return encode_query(text, model_name=model_name, dim=dim)


@jax.jit
def _dense_scores(emb: jax.Array, q: jax.Array) -> jax.Array:
    return jnp.dot(emb, q, preferred_element_type=jnp.float32)


def _sims(index: IndexT, query_vec: object) -> np.ndarray:
    if isinstance(index, TfidfItemIndex):
        s = index.matrix @ query_vec.T
        if hasattr(s, "toarray"):
            s = s.toarray()
        return np.asarray(s, np.float32).ravel()
    q = jnp.asarray(np.asarray(query_vec, np.float32))
    return np.asarray(_dense_scores(_device_embeddings(index), q))


def search_topk(index: IndexT, query_vec: object, k: int,
                mesh=None) -> List[Tuple[object, float]]:
    rows = search_topk_pos(index, query_vec, k, mesh=mesh)
    return [(item_id, sim) for _, item_id, sim in rows]


def search_topk_pos(
    index: IndexT, query_vec: object, k: int, mesh=None
) -> List[Tuple[int, object, float]]:
    """``mesh``: optional ``jax.sharding.Mesh`` — TF-IDF indexes score
    item-sharded over the mesh with an all_gather candidate merge
    (``sparse_scoring.tfidf_csr_topk``), for catalogs past one chip;
    dense indexes ignore it (their embedding matrix is k-by-small)."""
    if k <= 0:
        return []
    if mesh is not None and isinstance(index, TfidfItemIndex):
        from matrix_factorization_tpu.retrieval.sparse_scoring import (
            tfidf_csr_topk,
        )

        vals, pos = tfidf_csr_topk(index, query_vec, k, mesh)
        return [
            (int(p), index.item_ids[int(p)], float(v))
            for p, v in zip(pos[0], vals[0])
        ]
    sims = _sims(index, query_vec)
    k = min(k, sims.shape[0])
    top_idx = np.argpartition(-sims, kth=k - 1)[:k]
    top_sorted = top_idx[np.argsort(-sims[top_idx])]
    return [
        (int(i), index.item_ids[int(i)], float(sims[int(i)])) for i in top_sorted
    ]


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_scores(emb, q, k: int):
    scores = jnp.dot(q, emb.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(scores, k)


def search_topk_batch(
    index: DenseItemIndex, query_vecs: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched accelerator top-k for serving: (scores, positions) (B, k).

    The jitted kernel is module-level with static ``k`` so repeat serving
    calls hit the jit cache (compiles cost 30-90s on the remote-compile
    TPU backend; a per-call closure retraced every time).
    """
    emb = _device_embeddings(index)
    q = jnp.asarray(np.asarray(query_vecs, np.float32))
    vals, idx = _topk_scores(emb, q, min(k, emb.shape[0]))
    return np.asarray(vals), np.asarray(idx)
