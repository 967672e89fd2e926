"""EASE — Embarrassingly Shallow Autoencoder (Steck, WWW 2019).

An extension model family (no reference counterpart — the reference's
five models are MF/CF/content based): the closed-form item-item linear
model that is the standard strong baseline for implicit top-N
recommendation.  With ``X`` the (users x items) interaction matrix and
gram ``G = X^T X``, the training problem

    min_B ||X - X B||_F^2 + lam ||B||_F^2   s.t.  diag(B) = 0

has the exact solution (via the diag constraint's Lagrangian)

    P = (G + lam I)^{-1}
    B = I - P . diag(1 / diag(P))        (then diag(B) = 0 by construction)

i.e. ONE regularized SPD inverse of the item gram — no iterations, no
hyperparameters beyond ``lam``.  Serving is ``s_u = x_u B``: one sparse
history row against a dense item-item matrix.

TPU design:

* **Gram build** (:func:`item_gram`): a ``lax.scan`` over user chunks —
  each chunk scatters its (user-local, item) pairs into a dense
  ``(chunk_users, I_p)`` slab and accumulates ``D^T D`` on the MXU in
  one pass (HIGHEST precision: co-occurrence counts are exact in f32,
  and the downstream inverse is precision-sensitive — see
  ``ops/spd.py::_mm`` for the bf16-MAC failure mode this avoids).
* **Inverse** (:func:`ease_weights`): the Schur-recursion SPD inverse
  (``ops/spd.py::spd_inverse_scaled`` — Jacobi-scaled, Newton-refined,
  Pallas Gauss-Jordan leaf), the same solver family that carries the
  iALS sweeps, here on one big ``(I_p, I_p)`` system instead of many
  small ones.  XLA's unblocked Cholesky loop would take ~1ms x I_p
  sequential steps (~16s at 16k items); the recursion is O(log I_p)
  levels of batched matmuls.  Item-count padding rides through
  exactly: pad diagonal entries are ``lam`` with zero off-diagonals,
  so the padded block inverts in isolation and is sliced away in
  ``B``.
* **Scale bound**: the gram/inverse materialize O(I_p^2) f32 (~4
  live copies through the recursion), so one 16GB v5e handles catalogs
  to ~16k items; :func:`check_item_budget` raises actionably above
  that.  (The reference-scale datasets this family targets — ML-100K,
  Steam-200K, recipe subsets — are comfortably inside.)
* **Serving** (:func:`history_scores`): user histories scatter into a
  dense ``(B, I_p)`` block INSIDE the jit (one dispatch, RTT-safe) and
  one MXU matmul against ``B`` scores the whole catalog; the top-k
  variant fuses ``lax.top_k`` so only (B, k) crosses the host link.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from matrix_factorization_tpu.ops.spd import spd_inverse_scaled


class EASEParams(NamedTuple):
    """The trained state: one (I_p, I_p) item-item weight matrix."""

    item_weights: jax.Array


def round8(n: int) -> int:
    return ((max(n, 1) + 7) // 8) * 8


def check_item_budget(n_items: int, budget_bytes: int = 12 << 30) -> None:
    """Raise before building a gram that cannot fit the chip.

    The Schur recursion keeps ~4 (I_p, I_p) f32 temporaries live at the
    top level; 12GB of a 16GB v5e leaves room for the slab + program."""
    ip = round8(n_items)
    need = 4 * ip * ip * 4
    if need > budget_bytes:
        raise ValueError(
            f"EASE needs ~{need / 2**30:.1f}GB HBM for {n_items} items "
            f"(O(items^2) gram + inverse); the practical single-chip "
            f"bound is ~16k items. Shrink the catalog or use an MF/CF "
            f"model at this scale."
        )


def _gram_chunks(u: np.ndarray, i: np.ndarray, w: np.ndarray,
                 n_users: int, chunk_users: int):
    """Host pack: sort pairs by user, split at user-chunk boundaries,
    pad every chunk's pair list to the max (weight-0 pads are inert).

    Returns (lu, ii, ww) each (n_chunks, P_max): user ids local to the
    chunk, item ids, weights."""
    order = np.argsort(u, kind="stable")
    u, i, w = u[order], i[order], w[order]
    n_chunks = max(1, (n_users + chunk_users - 1) // chunk_users)
    starts = np.searchsorted(u, np.arange(n_chunks) * chunk_users)
    ends = np.append(starts[1:], len(u))
    pmax = max(1, int((ends - starts).max()))
    pmax = 1 << (pmax - 1).bit_length()  # pow2: stable compile shape
    lu = np.zeros((n_chunks, pmax), np.int32)
    ii = np.zeros((n_chunks, pmax), np.int32)
    ww = np.zeros((n_chunks, pmax), np.float32)
    for c in range(n_chunks):
        s, e = starts[c], ends[c]
        lu[c, : e - s] = u[s:e] - c * chunk_users
        ii[c, : e - s] = i[s:e]
        ww[c, : e - s] = w[s:e]
    return lu, ii, ww


_gram_jit_cache: dict = {}


def item_gram(u: np.ndarray, i: np.ndarray, w: np.ndarray, n_users: int,
              n_items: int, chunk_users: int = 2048) -> jax.Array:
    """(I_p, I_p) item co-occurrence gram ``X^T X`` on device.

    ``w``: per-pair interaction weights (all-ones for the standard
    binary EASE).  One scan over user chunks; each step is a dense
    scatter + one MXU matmul — no (users x items) matrix ever
    materializes."""
    ip = round8(n_items)
    cu = min(chunk_users, round8(n_users))
    lu, ii, ww = _gram_chunks(u, i, w, n_users, cu)
    key = (ip, cu, lu.shape[1])
    fn = _gram_jit_cache.get(key)
    if fn is None:

        def run(lu, ii, ww):
            def body(G, xs):
                lu_c, ii_c, ww_c = xs
                D = jnp.zeros((cu, ip), jnp.float32)
                D = D.at[lu_c, ii_c].add(ww_c, mode="promise_in_bounds")
                G = G + jnp.matmul(D.T, D,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
                return G, None

            G0 = jnp.zeros((ip, ip), jnp.float32)
            G, _ = jax.lax.scan(body, G0, (lu, ii, ww))
            return G

        fn = jax.jit(run)
        _gram_jit_cache[key] = fn
    return fn(jnp.asarray(lu), jnp.asarray(ii), jnp.asarray(ww))


_weights_jit_cache: dict = {}


def ease_weights(G: jax.Array, lam: float, leaf: str = "auto") -> jax.Array:
    """The closed-form EASE item-item matrix ``B`` from the gram.

    ``B = I - P / diag(P)`` with ``P = (G + lam I)^{-1}``; the diagonal
    is exactly zero.  Stays (I_p, I_p): padded items have gram row 0 so
    their ``P`` block is ``(1/lam) I`` and their ``B`` rows/cols come
    out 0 — pad-inert without slicing."""
    ip = G.shape[-1]
    key = (ip, leaf)
    fn = _weights_jit_cache.get(key)
    if fn is None:

        def run(G, lam):
            A = G + lam * jnp.eye(ip, dtype=jnp.float32)
            # scaled + Newton-refined: the raw recursion NaNs on chip
            # when the gram diagonal spans the item popularity counts
            # (see spd_inverse_scaled)
            P = spd_inverse_scaled(A, leaf=leaf)
            d = jnp.diagonal(P)
            B = -P / d[None, :]
            return B - jnp.diag(jnp.diagonal(B))  # exact-zero diagonal

        fn = jax.jit(run)
        _weights_jit_cache[key] = fn
    return fn(G, jnp.float32(lam))


_score_jit_cache: dict = {}


def history_scores(B: jax.Array, ids: np.ndarray, w: np.ndarray,
                   topk: Optional[int] = None,
                   n_valid: Optional[int] = None):
    """Catalog scores ``x_u B`` for a cohort of user histories.

    ``ids``/``w``: (n_users, L) padded item ids and weights (weight-0
    pads inert).  The dense history block is scattered INSIDE the jit
    (one dispatch) and scored as one MXU matmul; with ``topk`` the
    ``lax.top_k`` fuses in and only (n_users, k) values+indices are
    fetched — pad item columns (>= ``n_valid``) are masked to -inf so
    they can never outrank a real item with a negative score."""
    nb, L = ids.shape
    ip = B.shape[0]
    key = (ip, L, nb, topk, n_valid, str(B.dtype))
    fn = _score_jit_cache.get(key)
    if fn is None:

        def run(B, ids, w):
            rows = jnp.repeat(jnp.arange(nb, dtype=jnp.int32)[:, None], L, 1)
            X = jnp.zeros((nb, ip), jnp.float32)
            X = X.at[rows, ids].add(w, mode="promise_in_bounds")
            # match dtypes so a bf16-resident B streams half the bytes
            # (the MXU still accumulates in f32 via preferred_element_type;
            # binary history weights are exact in bf16)
            s = jnp.matmul(X.astype(B.dtype), B,
                           preferred_element_type=jnp.float32)
            if topk is not None:
                if n_valid is not None and n_valid < ip:
                    s = jnp.where(jnp.arange(ip)[None, :] < n_valid, s,
                                  -jnp.inf)
                return jax.lax.top_k(s, topk)
            return s

        fn = jax.jit(run)
        _score_jit_cache[key] = fn
    return fn(B, jnp.asarray(ids), jnp.asarray(w))
