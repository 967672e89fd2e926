"""EASE recommender — closed-form item-item linear model (Steck 2019).

No reference counterpart (extension family, like ImplicitALS/BPR): EASE
is the standard strong baseline for implicit top-N recommendation and a
natural TPU fit — training is ONE regularized SPD inverse of the item
gram (see :mod:`matrix_factorization_tpu.ops.ease` for the math and the
hardware mapping), so ``fit`` has no epochs, no learning rate, and no
stochasticity at all.

Lifecycle follows the family conventions (``RecommenderBase``:
fit / predict / recommend / update_users).  Like ``ImplicitALS``,
predictions are preference scores (~[0, 1] for binary histories), not
ratings; ``update_users`` is O(1) bookkeeping — the item-item matrix is
user-independent, so new/updated users only need their history rows
recorded (a genuinely instant online update no MF model can match).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from matrix_factorization_tpu.models.base import RecommenderBase
from matrix_factorization_tpu.ops import ease as ease_ops

_ease_topk_jit_cache: dict = {}


class EASE(RecommenderBase):
    """``s_u = x_u B`` with ``B = I - (G + lam I)^{-1} / diag``.

    ``reg`` (lam) is the only training hyperparameter (the EASE paper
    uses 100-1000 at MovieLens scale).  ``binarize=True`` (the standard
    formulation) scores histories as 0/1 interactions; ``False`` keeps
    the provided ``y`` values as interaction weights.
    """

    def __init__(
        self,
        reg: float = 250.0,
        binarize: bool = True,
        min_rating: float = 0,
        max_rating: float = 1,
        verbose: int = 0,
        gram_chunk_users: int = 2048,
        serving_dtype: str = "float32",
        mesh=None,
    ):
        """``serving_dtype``: 'float32' or 'bfloat16' — a bf16-resident
        ``B`` halves the bytes the HBM-bound catalog matmul streams
        (same option as the MF models' table serving).  With
        ``binarize=False`` the rating-valued history weights also round
        to bf16 in the scorer (~0.4% relative, the same order as the
        B rounding itself); binary histories are exact.

        ``mesh``: optional ``jax.sharding.Mesh`` — the gram shards
        users over the data axes (ONE psum per fit) and the Schur
        inverse runs GSPMD-partitioned over the mesh, stretching the
        O(items²) single-chip bound ~2x (see
        ``ops/ease.py::ease_weights_sharded``); serving reads the
        sharded B in place."""
        if reg <= 0:
            raise ValueError("reg must be positive (it conditions the inverse)")
        if serving_dtype not in ("float32", "bfloat16"):
            raise ValueError("serving_dtype must be 'float32' or 'bfloat16'")
        super().__init__(min_rating=min_rating, max_rating=max_rating,
                         verbose=verbose)
        self.reg = reg
        self.binarize = binarize
        self.gram_chunk_users = gram_chunk_users
        self.serving_dtype = serving_dtype
        self.mesh = mesh
        self._params = None  # EASEParams: (I_p, I_p) item-item matrix
        self._serving_cache = None
        # per-user histories, CSR over dense user ids
        self._indptr: Optional[np.ndarray] = None
        self._hist_i: Optional[np.ndarray] = None
        self._hist_w: Optional[np.ndarray] = None

    # -- histories -----------------------------------------------------------
    def _weights(self, r: np.ndarray) -> np.ndarray:
        if self.binarize:
            return np.ones_like(r, dtype=np.float32)
        if (r < 0).any():
            raise ValueError("interaction weights must be non-negative")
        return r.astype(np.float32)

    def _set_histories(self, u: np.ndarray, i: np.ndarray, w: np.ndarray):
        order = np.argsort(u, kind="stable")
        u, i, w = u[order], i[order], w[order]
        self._indptr = np.zeros(self.n_users + 1, np.int64)
        np.cumsum(np.bincount(u, minlength=self.n_users), out=self._indptr[1:])
        self._hist_i = i.astype(np.int32)
        self._hist_w = w.astype(np.float32)

    def _history_block(self, u_dense: np.ndarray):
        """Padded (B, L) item-id/weight rows for a user cohort; L is the
        cohort max history length, pow2-bucketed (compile-count bound).
        Negative/unknown users get empty histories (all scores 0)."""
        lens = [
            int(self._indptr[u + 1] - self._indptr[u]) if 0 <= u < self.n_users
            else 0
            for u in u_dense
        ]
        L = 1 << max(3, (max(lens + [1]) - 1).bit_length())
        ids = np.zeros((len(u_dense), L), np.int32)
        w = np.zeros((len(u_dense), L), np.float32)
        for row, (u, ln) in enumerate(zip(u_dense, lens)):
            if ln:
                s = self._indptr[u]
                ids[row, :ln] = self._hist_i[s : s + ln]
                w[row, :ln] = self._hist_w[s : s + ln]
        return ids, w

    # -- lifecycle -----------------------------------------------------------
    def fit(self, X: pd.DataFrame, y: pd.Series):
        u, i, r = self._preprocess_fit(X, y)
        w = self._weights(r)
        from matrix_factorization_tpu.parallel.mesh import data_size_of

        n_dev = data_size_of(self.mesh) if self.mesh is not None else 1
        # capacity tiers (ops/ease.py): single chip 16k (Schur recursion
        # peak); small mesh 32k (GSPMD Schur, temporaries replicate to
        # ~1.3x full matrix/device); >= 8 devices 64k — the
        # Newton–Schulz inverse's plain matmuls shard at ~1/n_dev
        # (memory_analysis evidence in tests/test_ease.py)
        if n_dev >= 8:
            limit = 65536
        elif n_dev >= 4:
            limit = 32768
        else:
            limit = 16384
        ease_ops.check_item_budget(self.n_items, item_limit=limit)
        if n_dev > 1:
            G = ease_ops.dp_item_gram(u, i, w, self.n_users, self.n_items,
                                      self.mesh, self.gram_chunk_users)
            B = ease_ops.ease_weights_sharded(G, self.reg, self.mesh)
        else:
            G = ease_ops.item_gram(u, i, w, self.n_users, self.n_items,
                                   self.gram_chunk_users)
            B = ease_ops.ease_weights(G, self.reg)
        self._params = ease_ops.EASEParams(B)
        self._serving_cache = None
        self._set_histories(u, i, w)
        if self.verbose:
            print(f"EASE: {self.n_items} items, reg={self.reg}, "
                  f"serving {self.serving_dtype}")
        return self

    def _serving_B(self):
        """Serving-path weight view (bf16 when ``serving_dtype`` asks —
        checkpointed state stays f32); identity-keyed staleness via the
        shared ``RecommenderBase._cached_serving_params``."""
        return self._cached_serving_params(
            cast_fn=lambda p: p._replace(
                item_weights=p.item_weights.astype(jnp.bfloat16))
        ).item_weights

    def _scores_for(self, u_dense: np.ndarray):
        """(B, n_items) host scores for a (padded) user cohort."""
        bb = 1 << max(0, (len(u_dense) - 1).bit_length())
        u_pad = np.full(bb, -1, np.int64)
        u_pad[: len(u_dense)] = u_dense
        ids, w = self._history_block(u_pad)
        s = np.asarray(ease_ops.history_scores(self._serving_B(), ids, w))
        return s[: len(u_dense), : self.n_items]

    def predict(self, X: pd.DataFrame, bound_ratings: bool = True) -> list:
        """Preference scores for (user, item) pairs.

        Pair scores are columns of the users' catalog score rows; the
        unique queried users are scored cohort-wise (one MXU matmul per
        256-user chunk).  Unknown user or item -> 0.0, possible=False
        (the family's cold-start convention: no information)."""
        self._require_fitted()
        if X.shape[0] == 0:
            return []
        u, i = self._preprocess_predict(X)
        preds = np.zeros(len(u), np.float32)
        possible = (u >= 0) & (i >= 0)
        uniq, inv = np.unique(u[possible], return_inverse=True)
        if len(uniq):
            # gather the queried columns per 256-user chunk: host memory
            # stays (256, n_items) however many distinct users the query
            # has (a full (uniq, n_items) block would be GBs at scale)
            pos = np.flatnonzero(possible)
            out = np.empty(len(pos), np.float32)
            for lo in range(0, len(uniq), 256):
                chunk = uniq[lo : lo + 256]
                rows = self._scores_for(chunk)
                sel = (inv >= lo) & (inv < lo + len(chunk))
                out[sel] = rows[inv[sel] - lo, i[pos[sel]]]
            preds[pos] = out
        if bound_ratings:
            preds = np.clip(preds, self.min_rating, self.max_rating)
        self.predictions_possible = possible.tolist()
        return preds.tolist()

    def update_users(self, X: pd.DataFrame, y: pd.Series, lr: float = 0.0,
                     n_epochs: int = 0, verbose: int = 0):
        """Record histories for new users and REPLACE known users'
        (the reference's "pass all ratings for old users" semantics,
        ``kernel_matrix_factorization.py:189-199``).  ``lr``/``n_epochs``
        accepted for API parity, unused: ``B`` is user-independent, so
        the update is pure bookkeeping — no solve, no device work."""
        u, i, r, known, _new = self._preprocess_update(X, y)
        if len(r) == 0:
            return self
        w = self._weights(r)
        # rebuild the CSR with known users' rows replaced and new
        # users' appended (indptr covers the grown vocab) — pair-level
        # masking, no per-user loop
        n_old = len(self._indptr) - 1
        pair_u = np.repeat(np.arange(n_old, dtype=np.int64),
                           np.diff(self._indptr))
        keep = np.ones(len(pair_u), bool)
        if known:
            drop = self.user_vocab.encode(np.asarray(known, dtype=object))
            keep = ~np.isin(pair_u, drop)
        all_u = np.concatenate([pair_u[keep], u.astype(np.int64)])
        all_i = np.concatenate([self._hist_i[keep], i.astype(np.int32)])
        all_w = np.concatenate([self._hist_w[keep], w])
        self._set_histories(all_u, all_i, all_w)
        return self

    # -- serving -------------------------------------------------------------
    def _catalog_scores(self, u_dense: int) -> np.ndarray:
        return self._scores_for(np.asarray([u_dense], np.int64))[0]

    def _catalog_scores_batch(self, u_dense: np.ndarray) -> np.ndarray:
        return self._scores_for(np.asarray(u_dense, np.int64))

    def _catalog_topk(self, u_dense: np.ndarray, k: int):
        """Device-side top-k: history scatter + catalog matmul +
        ``lax.top_k`` in one dispatch, (B, k) fetched — through the
        shared pad/bucket/jit-cache harness
        (``ops.scoring.topk_harness``); pad item columns are masked to
        -inf so they never outrank a real item with a negative score."""
        from matrix_factorization_tpu.ops.scoring import topk_harness

        B_mat = self._serving_B()
        n_items = self.n_items
        ip = int(B_mat.shape[0])

        def prep(u_pad):
            ids, w = self._history_block(u_pad)
            return (jnp.asarray(ids), jnp.asarray(w)), ids.shape[1]

        def make_run(kb, bb):
            def run(u, B, ids, w):
                s = ease_ops.score_history_block(B, ids, w)
                if n_items < ip:
                    s = jnp.where(jnp.arange(ip)[None, :] < n_items, s,
                                  -jnp.inf)
                return jax.lax.top_k(s, kb)

            return run

        return topk_harness(make_run, ("ease", str(B_mat.dtype)), n_items,
                            u_dense, k, _ease_topk_jit_cache, (B_mat,),
                            prep=prep)
