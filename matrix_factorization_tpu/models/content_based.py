"""Content-based recommender over item feature vectors.

Reference: ``matrix_factorization/content_based.py`` — ``fit`` takes an
optional ``item_features`` DataFrame (``:39-70``); with features it builds
an item-item cosine-similarity matrix (``:136-148``) and rating-weighted
user profile vectors (``:89-134``); without features the user profile is
just the user's mean rating (``:72-87``).

Parity notes:
* The reference's ``predict`` returns the **mean of the user's profile
  vector** regardless of the queried item (``:191-223`` — the computed
  similarity row is never used).  That is why its published RMSE is 2.76.
  We reproduce that contract by default, and additionally offer
  ``predict_mode='similarity'`` (an extension, off by default) that scores
  ``profile . feature(item)`` over rating-weighted profiles.
* The reference's rating-misalignment shuffle bug (``content_based.py:51``)
  is fixed, not replicated (see PARITY.md).

The profile accumulation is two ``segment_sum`` reductions on device; the
similarity matrix is one MXU matmul.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from matrix_factorization_tpu.models.base import RecommenderBase
from matrix_factorization_tpu.ops.similarity import cosine_rows


class ContentBasedRecommender(RecommenderBase):
    def __init__(
        self,
        min_rating: float = 0,
        max_rating: float = 5,
        verbose: int = 0,
        predict_mode: str = "profile_mean",
    ):
        if predict_mode not in ("profile_mean", "similarity"):
            raise ValueError("predict_mode must be 'profile_mean' or 'similarity'")
        super().__init__(min_rating=min_rating, max_rating=max_rating, verbose=verbose)
        self.predict_mode = predict_mode
        self.item_features: Optional[pd.DataFrame] = None
        self.item_similarity_matrix: Optional[np.ndarray] = None
        self._profiles = None  # (U,) scalar profiles or (U, D) vectors
        self._feature_matrix = None  # (I, D) dense-id aligned, 0 for missing
        self._has_features = None  # (I,) bool

    def fit(self, X: pd.DataFrame, y: pd.Series, item_features: pd.DataFrame = None):
        u, i, r = self._preprocess_fit(X, y)
        self.global_mean = float(np.mean(r))
        uj, ij, rj = jnp.asarray(u), jnp.asarray(i), jnp.asarray(r)

        if item_features is None:
            # profile = user's mean rating (reference :72-87)
            s = jax.ops.segment_sum(rj, uj, num_segments=self.n_users)
            n = jax.ops.segment_sum(jnp.ones_like(rj), uj, num_segments=self.n_users)
            self._profiles = np.asarray(
                jnp.where(n > 0, s / jnp.maximum(n, 1), self.global_mean)
            )
            return self

        if "item_id" not in item_features.columns:
            raise ValueError("item_features must contain 'item_id' column")
        self.item_features = item_features.copy()
        feat_cols = [c for c in item_features.columns if c != "item_id"]
        dense = self.item_vocab.encode(item_features["item_id"].to_numpy())
        keep = dense >= 0
        F = np.zeros((self.n_items, len(feat_cols)), np.float32)
        F[dense[keep]] = item_features.loc[keep, feat_cols].to_numpy(np.float32)
        has = np.zeros(self.n_items, bool)
        has[dense[keep]] = True
        self._feature_matrix = F
        self._has_features = has

        # item-item cosine similarity over feature rows, dense-id aligned
        self.item_similarity_matrix = np.asarray(
            jax.jit(cosine_rows)(jnp.asarray(F))
        )

        # rating-weighted profile: weight = rating - min_rating, items
        # without features skipped entirely (reference :114-132)
        w = (rj - self.min_rating) * jnp.asarray(has, jnp.float32)[ij]
        num = jax.ops.segment_sum(
            w[:, None] * jnp.asarray(F)[ij], uj, num_segments=self.n_users
        )
        den = jax.ops.segment_sum(w, uj, num_segments=self.n_users)
        self._profiles = np.asarray(
            jnp.where(den[:, None] > 0, num / jnp.maximum(den[:, None], 1e-12), 0.0)
        )
        return self

    # -- prediction ----------------------------------------------------------
    def _predict_arrays(self, u: np.ndarray, i: np.ndarray, bound_ratings: bool):
        self._require_fitted()
        possible = (u >= 0) & (i >= 0)
        us = np.maximum(u, 0)
        if self._profiles is None:
            raise RuntimeError("Model is not fitted")
        if self._profiles.ndim == 1:  # no-feature mode: scalar profiles
            pred = self._profiles[us]
        elif self.predict_mode == "similarity":
            isafe = np.maximum(i, 0)
            prof = self._profiles[us]
            feat = self._feature_matrix[isafe]
            pn = np.linalg.norm(prof, axis=1)
            fn = np.linalg.norm(feat, axis=1)
            cos = np.einsum("bd,bd->b", prof, feat) / np.maximum(pn * fn, 1e-12)
            # map cosine [0, 1] onto the rating range
            pred = self.min_rating + cos * (self.max_rating - self.min_rating)
            pred = np.where(self._has_features[isafe], pred, self.global_mean)
        else:  # reference parity: mean of the profile vector (:213-215)
            prof = self._profiles[us]
            pred = np.where(
                prof.shape[1] > 0, prof.mean(axis=1), self.global_mean
            )
        pred = np.where(possible, pred, self.global_mean)
        if bound_ratings:
            pred = np.clip(pred, self.min_rating, self.max_rating)
        return pred.astype(np.float64), possible

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

    @property
    def user_profiles(self) -> dict:
        """Reference-compatible ``{dense_user_id: profile}`` view."""
        if self._profiles is None:
            return {}
        return {idx: self._profiles[idx] for idx in range(self.n_users)}
