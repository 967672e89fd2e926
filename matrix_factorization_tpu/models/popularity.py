"""Popularity baseline: rank items by interaction count or damped mean rating.

The reference has no explicit popularity model, but its evaluation
harnesses implicitly compare against one (the global-mean row of
``examples/recommender-system.ipynb`` cell 6 is the rating-side analogue),
and this repo's implicit-feedback A/B (``benchmarks/implicit_ranking_ab.py``)
had been computing it ad hoc.  A first-class model gives users the
standard sanity baseline on the same ``fit / predict / recommend /
update_users`` lifecycle as every other model.

Deliberately host-only numpy: fitting is one ``bincount`` over the rating
stream (O(nnz), bandwidth-trivial) and serving is an argsort over
``n_items`` floats — there is no MXU work to put on the TPU, and shipping
two small vectors through a jit would only add dispatch latency.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from matrix_factorization_tpu.models.base import RecommenderBase


class Popularity(RecommenderBase):
    """Non-personalized popularity ranker.

    Parameters
    ----------
    score : 'count' | 'mean'
        'count' ranks by raw interaction count (the implicit-feedback
        baseline); 'mean' ranks by the damped item mean rating
        ``(sum_r + damping * global_mean) / (count + damping)`` — the
        Bayesian-average popularity chart for explicit ratings.
    damping : float
        Pseudo-count pulling sparse items toward the global mean
        ('mean' only).

    ``predict`` is user-independent; ``bound_ratings`` clamps only in
    'mean' mode (counts are not on the rating scale, clamping them would
    destroy the ranking signal).
    """

    def __init__(
        self,
        score: str = "count",
        damping: float = 10.0,
        min_rating: float = 0,
        max_rating: float = 5,
        verbose: int = 0,
    ):
        super().__init__(min_rating=min_rating, max_rating=max_rating, verbose=verbose)
        if score not in ("count", "mean"):
            raise ValueError(f"score must be 'count' or 'mean', got {score!r}")
        self.score = score
        self.damping = damping

    # -- internals -----------------------------------------------------------
    def _recompute_scores(self) -> None:
        if self.score == "mean":
            self.item_scores_ = (
                self._item_sums + self.damping * self.global_mean
            ) / (self._item_counts + self.damping)
        else:
            self.item_scores_ = self._item_counts.astype(np.float32)

    # -- lifecycle ------------------------------------------------------------
    def fit(self, X: pd.DataFrame, y: pd.Series):
        _u, i, r = self._preprocess_fit(X, y)
        n = self.n_items
        self._item_counts = np.bincount(i, minlength=n).astype(np.float32)
        self._item_sums = np.bincount(i, weights=r, minlength=n).astype(np.float32)
        self.global_mean = float(r.mean()) if len(r) else 0.0
        self._recompute_scores()
        return self

    def update_users(self, X: pd.DataFrame, y: pd.Series, **_ignored):
        """Fold new ratings into the item statistics.

        New users are registered in the vocab (so ``contains_user`` and
        downstream exclusion bookkeeping behave like the other models);
        there are no per-user parameters to train.  Ratings of unknown
        items are dropped, mirroring the reference's update preprocessing
        (``recommender_base.py:144-145``).
        """
        self._require_fitted()
        _u, i, r, _known, _new = self._preprocess_update(X, y)
        if len(i):
            n = self.n_items
            self._item_counts += np.bincount(i, minlength=n).astype(np.float32)
            self._item_sums += np.bincount(i, weights=r, minlength=n).astype(np.float32)
            total = self._item_counts.sum()
            if total > 0:
                self.global_mean = float(self._item_sums.sum() / total)
        self._recompute_scores()
        return self

    def predict(self, X: pd.DataFrame, bound_ratings: bool = True) -> list:
        self._require_fitted()
        _u, i = self._preprocess_predict(X)
        preds, possible = self._predict_dense(
            _u, i, bound_ratings=bound_ratings
        )
        self.predictions_possible = possible.tolist()
        return preds.tolist()

    # -- dense fast paths (used by the generic recommend/recommend_batch) -----
    def _predict_dense(self, u, i, bound_ratings: bool):
        i = np.asarray(i)
        known = i >= 0
        fallback = self.global_mean if self.score == "mean" else 0.0
        preds = np.where(known, self.item_scores_[np.clip(i, 0, None)], fallback)
        preds = preds.astype(np.float32)
        if bound_ratings and self.score == "mean":
            preds = np.clip(preds, self.min_rating, self.max_rating)
        return preds, known

    def recommend(self, user, amount: int = 10, items_known=None,
                  include_user: bool = True, bound_ratings: bool = True):
        # counts are not on the rating scale: the generic clip to
        # [min_rating, max_rating] would flatten every rating_pred to
        # max_rating, so count mode never clips
        if self.score == "count":
            bound_ratings = False
        return super().recommend(user, amount=amount, items_known=items_known,
                                 include_user=include_user,
                                 bound_ratings=bound_ratings)

    def recommend_batch(self, users, amount: int = 10, items_known_map=None,
                        bound_ratings: bool = True):
        if self.score == "count":
            bound_ratings = False
        return super().recommend_batch(users, amount=amount,
                                       items_known_map=items_known_map,
                                       bound_ratings=bound_ratings)

    def _catalog_scores(self, _u_dense: int) -> np.ndarray:
        return self.item_scores_

    def _catalog_scores_batch(self, u_dense: np.ndarray) -> np.ndarray:
        return np.broadcast_to(
            self.item_scores_, (len(u_dense), self.n_items)
        )
