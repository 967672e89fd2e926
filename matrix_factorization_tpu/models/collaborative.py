"""User-user and item-item collaborative filtering.

Reference: ``matrix_factorization/collaborative_filtering.py`` — UserUserCF
``:14-190``, ItemItemCF ``:193-369``.  The reference builds a pandas pivot
table, calls sklearn ``cosine_similarity`` and predicts pair-by-pair with
``iterrows``; here the rating matrix is scattered onto the device once, the
similarity matrix is one MXU matmul, and prediction is a batched masked
top-k (:mod:`..ops.similarity`).

Deliberate fix vs the reference: the reference's ``fit`` shuffles X inside
preprocessing and then re-attaches the *unshuffled* ratings column
(``collaborative_filtering.py:58-59``), silently mis-pairing ratings with
(user, item) rows.  We do not replicate that bug (see PARITY.md).

``similarity_metric='pearson'`` is accepted and — exactly as in the
reference (``:90-94``) — is the same computation as centered cosine.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from matrix_factorization_tpu.models.base import RecommenderBase
from matrix_factorization_tpu.ops import similarity as simops

_PREDICT_CHUNK = 4096
_cf_jit_cache: dict = {}


class _NeighborhoodCF(RecommenderBase):
    """Shared machinery for the two CF variants."""

    _mode = "user"  # or "item"

    def __init__(
        self,
        min_rating: float = 0,
        max_rating: float = 5,
        n_neighbors: int = 50,
        similarity_metric: str = "cosine",
        mesh=None,
        verbose: int = 0,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — the quadratic
        similarity matrix is laid out row-sharded over every mesh axis
        and the centered-cosine matmul runs GSPMD-partitioned, so the
        O(entities²) state that bounds the exact models single-chip
        scales ~1/n_dev per device; prediction jits against the sharded
        state and XLA inserts the row gathers."""
        if similarity_metric not in ("cosine", "pearson"):
            raise ValueError(f"Unknown similarity metric: {similarity_metric}")
        super().__init__(min_rating=min_rating, max_rating=max_rating, verbose=verbose)
        self.n_neighbors = n_neighbors
        self.similarity_metric = similarity_metric
        self.mesh = mesh
        self._state: Optional[simops.CFState] = None

    def fit(self, X: pd.DataFrame, y: pd.Series):
        u, i, r = self._preprocess_fit(X, y)
        fit_fn = simops.user_cf_fit if self._mode == "user" else simops.item_cf_fit
        kw = {}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            rep = NamedSharding(self.mesh, Pspec())
            kw["out_shardings"] = simops.CFState(
                ratings=rep,
                sim=NamedSharding(self.mesh,
                                  Pspec(tuple(self.mesh.axis_names))),
                means=rep, global_mean=rep,
            )
        self._state = jax.jit(fit_fn, static_argnums=(3, 4), **kw)(
            jnp.asarray(u), jnp.asarray(i), jnp.asarray(r), self.n_users, self.n_items
        )
        self.global_mean = float(self._state.global_mean)
        return self

    def _predict_fn(self, bound_ratings: bool):
        key = (
            self._mode, self.n_neighbors, self.min_rating, self.max_rating,
            bound_ratings,
        )
        if key not in _cf_jit_cache:
            pred_fn = (
                simops.user_cf_predict
                if self._mode == "user"
                else simops.item_cf_predict
            )
            _cf_jit_cache[key] = jax.jit(
                lambda s, uu, ii: pred_fn(
                    s, uu, ii, self.n_neighbors, self.min_rating, self.max_rating,
                    bound_ratings,
                )
            )
        return _cf_jit_cache[key]

    def _predict_arrays(self, u: np.ndarray, i: np.ndarray, bound_ratings: bool):
        """Chunked batched prediction with pad-to-chunk to avoid recompiles."""
        self._require_fitted()
        fn = self._predict_fn(bound_ratings)
        preds = np.empty(len(u), np.float32)
        possible = np.empty(len(u), bool)
        for lo in range(0, len(u), _PREDICT_CHUNK):
            hi = min(lo + _PREDICT_CHUNK, len(u))
            n = hi - lo
            uu = np.full(_PREDICT_CHUNK, -1, np.int32)
            ii = np.full(_PREDICT_CHUNK, -1, np.int32)
            uu[:n], ii[:n] = u[lo:hi], i[lo:hi]
            p, ok = fn(self._state, jnp.asarray(uu), jnp.asarray(ii))
            preds[lo:hi] = np.asarray(p)[:n]
            possible[lo:hi] = np.asarray(ok)[:n]
        return preds, possible

    def predict(self, X: pd.DataFrame, bound_ratings: bool = True) -> list:
        if X.shape[0] == 0:
            return []
        u, i = self._preprocess_predict(X)
        preds, possible = self._predict_arrays(u, i, bound_ratings)
        self.predictions_possible = possible.tolist()
        return preds.tolist()

    def _predict_dense(self, u, i, bound_ratings):
        return self._predict_arrays(
            np.asarray(u, np.int32), np.asarray(i, np.int32), bound_ratings
        )

    # -- reference-parity attribute views -----------------------------------
    @property
    def user_item_matrix(self) -> np.ndarray:
        return np.asarray(self._state.ratings)


class UserUserCF(_NeighborhoodCF):
    """Predict via ratings of the top-k most similar users who rated the
    item: ``pred = mean_u + sum(sim*(r_v - mean_v)) / sum(|sim|)``."""

    _mode = "user"

    @property
    def user_similarity_matrix(self) -> np.ndarray:
        return np.asarray(self._state.sim)

    @property
    def user_mean_ratings(self) -> np.ndarray:
        return np.asarray(self._state.means)


class ItemItemCF(_NeighborhoodCF):
    """Predict via the user's ratings of the top-k most similar items."""

    _mode = "item"

    @property
    def item_similarity_matrix(self) -> np.ndarray:
        return np.asarray(self._state.sim)

    @property
    def item_mean_ratings(self) -> np.ndarray:
        return np.asarray(self._state.means)
