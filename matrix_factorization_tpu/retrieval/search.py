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
    """``mesh``: optional ``jax.sharding.Mesh`` — the index scores
    item-sharded over the mesh with an all_gather candidate merge, for
    catalogs past one chip: TF-IDF via ``sparse_scoring.tfidf_csr_topk``
    (CSR blocks), dense via :func:`dense_topk_mesh` (row-sharded
    embedding matmul — a 2.2M x 512 f32 recipes index is 4.5GB,
    single-chip-marginal next to the model tables)."""
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
    if mesh is not None and isinstance(index, DenseItemIndex):
        q = np.asarray(query_vec, np.float32).reshape(1, -1)
        vals, pos = dense_topk_mesh(index, q, k, mesh)
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
    index: DenseItemIndex, query_vecs: np.ndarray, k: int, mesh=None
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched accelerator top-k for serving: (scores, positions) (B, k).

    The jitted kernel is module-level with static ``k`` so repeat serving
    calls hit the jit cache (compiles cost 30-90s on the remote-compile
    TPU backend; a per-call closure retraced every time).  ``mesh``
    routes through the row-sharded scorer for indexes past one chip.
    """
    if mesh is not None:
        return dense_topk_mesh(index, np.asarray(query_vecs, np.float32),
                               k, mesh)
    emb = _device_embeddings(index)
    q = jnp.asarray(np.asarray(query_vecs, np.float32))
    vals, idx = _topk_scores(emb, q, min(k, emb.shape[0]))
    return np.asarray(vals), np.asarray(idx)


# -- mesh-sharded dense retrieval (VERDICT r4 #4) ---------------------------

_mesh_emb_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_dense_mesh_fn_cache: dict = {}


def _mesh_embeddings(index: DenseItemIndex, mesh, items_per: int):
    """Row-sharded device copy of the (padded) embedding matrix, cached
    per (index, mesh) — each device holds ~1/n_dev of the catalog, so the
    index capacity scales with the fleet instead of one chip's HBM."""
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    per_index = _mesh_emb_cache.setdefault(index, {})
    arr = per_index.get(mesh)
    if arr is None:
        n, dim = index.embeddings.shape
        n_dev = mesh.devices.size
        padded = np.zeros((items_per * n_dev, dim), np.float32)
        padded[:n] = index.embeddings
        arr = jax.device_put(
            padded, NamedSharding(mesh, Pspec(tuple(mesh.axis_names))))
        per_index[mesh] = arr
    return arr


def dense_topk_mesh(
    index: DenseItemIndex, query_vecs: np.ndarray, k: int, mesh
) -> Tuple[np.ndarray, np.ndarray]:
    """Mesh-sharded dense top-k: embeddings row-shard over EVERY mesh
    axis, each device matmuls its shard + takes a local ``lax.top_k``,
    and candidates merge via the O(n_dev * k) all_gather re-top-k — the
    same merge as ``parallel/topk.py`` and ``tfidf_csr_topk``.  Returns
    (scores, global positions), both (B, k), replicated.

    Reference counterpart: the single-host dense scorer of
    ``project_template/app/retrieval.py:80-99``.
    """
    from jax.sharding import PartitionSpec as Pspec

    from matrix_factorization_tpu.ops.segment_sgd import round_up

    n, dim = index.embeddings.shape
    axes = tuple(mesh.axis_names)
    n_dev = mesh.devices.size
    items_per = round_up(n, 8 * n_dev) // n_dev
    k = min(k, n)
    q = np.asarray(query_vecs, np.float32)
    B = q.shape[0]

    cache_key = (B, dim, k, items_per, mesh)
    fn = _dense_mesh_fn_cache.get(cache_key)
    if fn is None:

        def local(emb_l, qd, n_valid):
            shard = jnp.int32(0)
            for a in axes:
                shard = shard * mesh.shape[a] + jax.lax.axis_index(a)
            scores = jax.lax.dot_general(
                qd, emb_l, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gids = shard * items_per + jnp.arange(items_per, dtype=jnp.int32)
            scores = jnp.where(gids[None, :] < n_valid, scores, -jnp.inf)
            lv, li = jax.lax.top_k(scores, min(k, items_per))
            gi = li + shard * items_per
            lv_g = jax.lax.all_gather(lv, axes, axis=1, tiled=True)
            gi_g = jax.lax.all_gather(gi, axes, axis=1, tiled=True)
            mv, mp = jax.lax.top_k(lv_g, min(k, lv_g.shape[1]))
            return mv, jnp.take_along_axis(gi_g, mp, axis=1)

        fn = jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(Pspec(axes), Pspec(), Pspec()),
            out_specs=(Pspec(), Pspec()),
            check_vma=False,  # all_gather+merge leaves outputs replicated
        ))
        _dense_mesh_fn_cache[cache_key] = fn

    emb = _mesh_embeddings(index, mesh, items_per)
    mv, mg = fn(emb, jnp.asarray(q), jnp.int32(n))
    return np.asarray(mv), np.asarray(mg)
