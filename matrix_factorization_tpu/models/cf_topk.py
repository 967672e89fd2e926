"""Scalable neighborhood CF with precomputed top-k neighbor lists.

``UserUserCF`` / ``ItemItemCF`` (``models/collaborative.py``) are exact
replicas of the reference semantics but materialize dense rating and
similarity matrices — fine to ~20k x 20k, impossible at MovieLens-25M
(BASELINE.json config 4).  These variants scale:

* fit: top-k centered-cosine neighbor lists via the block-tiled sparse
  gram (``ops/sparse_gram.py``) — no dense matrices ever materialize;
* predict: ``pred = mean_e + sum(sim * (r - mean_n)) / sum(|sim|)`` over
  the (neighbor-list ∩ rated) intersection, vectorized with one pandas
  merge over the exploded (pair x neighbor) table.

Documented semantic deviation vs the reference (and the exact classes):
neighbors come from each entity's GLOBAL top-k list rather than re-ranking
all raters per prediction — the standard truncation used by production
neighborhood CF.  With k >= the reference's n_neighbors the lists agree on
the head; tails can differ for sparse co-rating patterns.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from matrix_factorization_tpu.models.base import RecommenderBase
from matrix_factorization_tpu.ops.sparse_gram import similarity_topk


class _TopKNeighborCF(RecommenderBase):
    _mode = "item"  # or "user"

    def __init__(
        self,
        min_rating: float = 0,
        max_rating: float = 5,
        n_neighbors: int = 50,
        user_block: int = 4096,
        item_tile: int = 4096,
        verbose: int = 0,
    ):
        super().__init__(min_rating=min_rating, max_rating=max_rating,
                         verbose=verbose)
        self.n_neighbors = n_neighbors
        self.user_block = user_block
        self.item_tile = item_tile
        self._neighbor_sims: Optional[np.ndarray] = None
        self._neighbor_ids: Optional[np.ndarray] = None
        self._means: Optional[np.ndarray] = None
        self._ratings_df: Optional[pd.DataFrame] = None

    def fit(self, X: pd.DataFrame, y: pd.Series):
        u, i, r = self._preprocess_fit(X, y)
        self.global_mean = float(np.mean(r))
        if self._mode == "item":
            sims, ids, means, _ = similarity_topk(
                u, i, r, self.n_users, self.n_items, self.n_neighbors,
                user_block=self.user_block, item_tile=self.item_tile,
            )
        else:  # user-user: swap the roles of the axes
            sims, ids, means, _ = similarity_topk(
                i, u, r, self.n_items, self.n_users, self.n_neighbors,
                user_block=self.user_block, item_tile=self.item_tile,
            )
        self._neighbor_sims = sims
        self._neighbor_ids = ids
        self._means = means
        self._ratings_df = pd.DataFrame(
            {"u": u, "i": i, "r": r.astype(np.float64)}
        )
        return self

    def _predict_arrays(self, u: np.ndarray, i: np.ndarray,
                        bound_ratings: bool):
        self._require_fitted()
        possible = (u >= 0) & (i >= 0)
        n = len(u)
        k = self._neighbor_sims.shape[1]

        # entity whose neighbor list we use; candidate axis holds ratings
        if self._mode == "item":
            ent = np.maximum(i, 0)
        else:
            ent = np.maximum(u, 0)
        nb_ids = self._neighbor_ids[ent]  # (n, k)
        nb_sims = self._neighbor_sims[ent].astype(np.float64)

        pair_idx = np.repeat(np.arange(n), k)
        if self._mode == "item":
            merge_left = pd.DataFrame(
                {
                    "pair": pair_idx,
                    "u": np.repeat(np.maximum(u, 0), k),
                    "i": nb_ids.reshape(-1),
                    "sim": nb_sims.reshape(-1),
                }
            )
        else:
            merge_left = pd.DataFrame(
                {
                    "pair": pair_idx,
                    "u": nb_ids.reshape(-1),
                    "i": np.repeat(np.maximum(i, 0), k),
                    "sim": nb_sims.reshape(-1),
                }
            )
        merged = merge_left.merge(self._ratings_df, on=["u", "i"], how="inner")
        if self._mode == "item":
            nb_mean = self._means[merged["i"].to_numpy()]
        else:
            nb_mean = self._means[merged["u"].to_numpy()]
        merged["num"] = merged["sim"] * (merged["r"] - nb_mean)
        merged["den"] = merged["sim"].abs()
        agg = merged.groupby("pair")[["num", "den"]].sum()

        num = np.zeros(n)
        den = np.zeros(n)
        num[agg.index.to_numpy()] = agg["num"].to_numpy()
        den[agg.index.to_numpy()] = agg["den"].to_numpy()
        base = self._means[ent]
        pred = np.where(den > 0, base + num / np.maximum(den, 1e-12), base)
        pred = np.where(possible, pred, self.global_mean)
        if bound_ratings:
            pred = np.clip(pred, self.min_rating, self.max_rating)
        return pred, possible

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


class TopKItemItemCF(_TopKNeighborCF):
    """Item-item CF at sparse 25M-rating scale."""

    _mode = "item"


class TopKUserUserCF(_TopKNeighborCF):
    """User-user CF at sparse 25M-rating scale."""

    _mode = "user"
