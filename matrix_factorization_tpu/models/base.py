"""Abstract base for all recommender models.

Mirrors the reference's ``RecommenderBase`` surface
(``matrix_factorization/recommender_base.py:14-271``): sklearn-compatible
estimator with ``fit / predict / recommend / update_users`` lifecycle,
arbitrary-hashable ids remapped to dense ints, unknown ids handled as
cold-start, and a generic full-catalog ``recommend``.

TPU-first differences:
* Id remapping is a vectorized :class:`IdVocab` (arrays, not row-wise dict
  maps), and the preprocessing step never shuffles on the host — shuffling
  is the training loop's job (``jax.random.permutation`` per epoch on
  device).  The reference shuffled in ``_preprocess_data``
  (``recommender_base.py:131``), which caused the rating-misalignment bug
  in its CF/content models (ratings re-attached in original order after the
  shuffle, ``collaborative_filtering.py:59``); assigning ids in first-seen
  input order removes the bug class entirely.
* ``recommend`` scores the whole catalog as one device batch (dense ids
  straight into the jitted predictor) instead of building a DataFrame per
  call.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, List, Optional, Tuple

import numpy as np
import pandas as pd

try:  # sklearn is optional; BaseEstimator enables GridSearchCV compat
    from sklearn.base import BaseEstimator, RegressorMixin

    _SKLEARN_BASES: tuple = (BaseEstimator, RegressorMixin)
except Exception:  # pragma: no cover
    _SKLEARN_BASES = ()

from matrix_factorization_tpu.core.ids import IdVocab, check_no_duplicates

_MAX_PREDICT_CHUNK = 8192


def bucketed_predict(fn, u: np.ndarray, i: np.ndarray):
    """Run a jitted pair-predictor over (u, i) in shape-bucketed chunks.

    Jitted programs are specialized per input shape; padding each chunk to a
    power-of-two bucket bounds the number of distinct compilations per
    config at ~log2(max_chunk) instead of one per call size (compiles cost
    30-90s on remote-compile TPU backends).  Pads use id -1, which every
    predictor treats as cold-start and which we strip before returning.
    """
    n = len(u)
    preds = np.empty(n, np.float32)
    possible = np.empty(n, bool)
    lo = 0
    while lo < n:
        m = min(_MAX_PREDICT_CHUNK, n - lo)
        bucket = 1 << max(8, (m - 1).bit_length())  # >=256, pow2
        uu = np.full(bucket, -1, np.int32)
        ii = np.full(bucket, -1, np.int32)
        uu[:m] = u[lo : lo + m]
        ii[:m] = i[lo : lo + m]
        p, ok = fn(uu, ii)
        preds[lo : lo + m] = np.asarray(p)[:m]
        possible[lo : lo + m] = np.asarray(ok)[:m]
        lo += m
    return preds, possible


class RecommenderBase(*_SKLEARN_BASES, ABC):
    """Abstract recommender with the reference's lifecycle contract.

    Data contract (reference ``recommender_base.py``): ``X`` is a DataFrame
    with columns ``user_id``/``item_id`` (ids may be any hashables), ``y``
    a Series of ratings aligned with ``X``.
    """

    def __init__(self, min_rating: float = 0, max_rating: float = 5, verbose: int = 0):
        self.min_rating = min_rating
        self.max_rating = max_rating
        self.verbose = verbose
        self.user_vocab: IdVocab = IdVocab()
        self.item_vocab: IdVocab = IdVocab()

    # -- reference-parity id surface ---------------------------------------
    @property
    def user_id_map(self) -> dict:
        return self.user_vocab.as_dict()

    @property
    def item_id_map(self) -> dict:
        return self.item_vocab.as_dict()

    @property
    def known_users(self) -> set:
        return set(self.user_vocab.raw_ids)

    @property
    def known_items(self) -> set:
        return set(self.item_vocab.raw_ids)

    @property
    def n_users(self) -> int:
        return len(self.user_vocab)

    @property
    def n_items(self) -> int:
        return len(self.item_vocab)

    def _require_fitted(self) -> None:
        if len(self.user_vocab) == 0:
            raise RuntimeError(
                f"{type(self).__name__} is not fitted yet; call fit(X, y) first"
            )

    def contains_user(self, user_id: Any) -> bool:
        return user_id in self.user_vocab

    def contains_item(self, item_id: Any) -> bool:
        return item_id in self.item_vocab

    # -- preprocessing ------------------------------------------------------
    def _preprocess_fit(
        self, X: pd.DataFrame, y: pd.Series
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Build vocabularies and return dense (u, i, r) arrays.

        Raises ``ValueError`` on duplicate (user, item) pairs, as the
        reference does (``recommender_base.py:127-128``).
        """
        users = X["user_id"].to_numpy()
        items = X["item_id"].to_numpy()
        check_no_duplicates(users, items)
        self.user_vocab = IdVocab.from_values(users)
        self.item_vocab = IdVocab.from_values(items)
        u = self.user_vocab.encode(users)
        i = self.item_vocab.encode(items)
        r = np.asarray(y, dtype=np.float32)
        return u, i, r

    def _preprocess_update(
        self, X: pd.DataFrame, y: pd.Series
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[Any], List[Any]]:
        """Drop unknown items, register new users; returns
        (u, i, r, known_users, new_users) — reference
        ``recommender_base.py:142-171``."""
        users = X["user_id"].to_numpy()
        items = X["item_id"].to_numpy()
        check_no_duplicates(users, items)
        i = self.item_vocab.encode(items)
        keep = i >= 0
        users, i = users[keep], i[keep]
        r = np.asarray(y, dtype=np.float32)[keep]

        uniq = pd.unique(users)
        known_users = [u_ for u_ in uniq if u_ in self.user_vocab]
        new_users = [u_ for u_ in uniq if u_ not in self.user_vocab]
        self.user_vocab.extend(new_users)
        u = self.user_vocab.encode(users)
        return u, i, r, known_users, new_users

    def _preprocess_predict(self, X: pd.DataFrame) -> Tuple[np.ndarray, np.ndarray]:
        """Dense ids with unknowns mapped to -1
        (reference ``recommender_base.py:166-168``)."""
        u = self.user_vocab.encode(X["user_id"].to_numpy())
        i = self.item_vocab.encode(X["item_id"].to_numpy())
        return u, i

    # -- lifecycle ----------------------------------------------------------
    @abstractmethod
    def fit(self, X: pd.DataFrame, y: pd.Series):
        """Train on (X, y); returns self."""

    @abstractmethod
    def predict(self, X: pd.DataFrame, bound_ratings: bool = True) -> list:
        """Predict ratings for each row of X, in input order."""

    def _predict_dense(
        self, u: np.ndarray, i: np.ndarray, bound_ratings: bool
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Dense-id fast path used by ``recommend``; models override.

        Returns ``(predictions, possible)`` so recommend can refresh
        ``predictions_possible`` exactly like the predict path does
        (reference recommend always goes through predict,
        ``recommender_base.py:245-271``)."""
        users = [self.user_vocab.raw_ids[x] if x >= 0 else "__unknown__" for x in u]
        items = [self.item_vocab.raw_ids[x] if x >= 0 else "__unknown__" for x in i]
        df = pd.DataFrame({"user_id": users, "item_id": items})
        preds = np.asarray(self.predict(df, bound_ratings=bound_ratings))
        return preds, np.asarray(self.predictions_possible, dtype=bool)

    # -- shared top-k plumbing (device and sharded catalogs) ------------------

    def _cached_serving_params(self, mf_view_fn=None, cast_fn=None):
        """Identity-keyed cache of the serving-path parameter view: the
        live ``_params`` (optionally projected through ``mf_view_fn``,
        e.g. SVD++'s effective P+S table), cast to bf16 when
        ``serving_dtype='bfloat16'``.  Rebuilt whenever ``_params`` is
        replaced — every fit / update_users / capacity growth swaps the
        object, so identity is the staleness check.

        ``cast_fn`` overrides the bf16 cast for params classes without
        the MFParams table fields (e.g. EASE's item-item matrix)."""
        import jax.numpy as jnp

        p = self._params
        if mf_view_fn is None and self.serving_dtype == "float32":
            return p
        c = getattr(self, "_serving_cache", None)
        if c is None or c[0] is not p:
            mf = mf_view_fn() if mf_view_fn is not None else p
            if self.serving_dtype == "bfloat16":
                if cast_fn is not None:
                    mf = cast_fn(mf)
                else:
                    mf = mf._replace(
                        user_features=mf.user_features.astype(jnp.bfloat16),
                        item_features=mf.item_features.astype(jnp.bfloat16),
                    )
            self._serving_cache = c = (p, mf)
        return c[1]

    def _encode_known_set(self, items) -> set:
        """Dense-id set for an iterable of raw item ids (unknown dropped)."""
        if not items:
            return set()
        kd = self.item_vocab.encode(np.asarray(list(items), dtype=object))
        return set(kd[kd >= 0].tolist())

    def _topk_fetch(self):
        """The (u_dense, k) -> (vals, idx) top-k fetcher, or None.

        Sharded catalogs (``_topk_catalog``, Q never gathered) take
        precedence; single-device models expose ``_catalog_topk``
        (score + ``lax.top_k`` in one dispatch).  Either way only
        (B, k) values+indices cross the host link."""
        topk_cat = getattr(self, "_topk_catalog", None)
        if topk_cat is not None:
            return lambda ud, k: topk_cat.topk(self._topk_user_rows(ud), k)
        return getattr(self, "_catalog_topk", None)

    def _topk_row_frame(self, user, vals_row, idx_row, excluded, amount,
                        bound_ratings, raw_items) -> pd.DataFrame:
        """One user's (vals, idx) top-k row -> recommend DataFrame:
        exclusion filter, cut to ``amount``, optional clip."""
        keep = [j for j, g in enumerate(idx_row) if g not in excluded]
        keep = keep[:amount]
        preds = vals_row[keep]
        if bound_ratings:
            preds = np.clip(preds, self.min_rating, self.max_rating)
        return pd.DataFrame({
            "user_id": [user] * len(keep),
            "item_id": [raw_items[x] for x in idx_row[keep]],
            "rating_pred": preds,
        })

    def recommend(
        self,
        user: Any,
        amount: int = 10,
        items_known: Optional[list] = None,
        include_user: bool = True,
        bound_ratings: bool = True,
    ) -> pd.DataFrame:
        """Top-``amount`` unseen items for ``user``, scored over the whole
        catalog with ``bound_ratings=False`` then clipped — matching the
        reference's ordering semantics (``recommender_base.py:245-271``)."""
        self._require_fitted()
        item_ids = np.arange(self.n_items, dtype=np.int32)
        raw_items = self.item_vocab.raw_ids
        if items_known is not None:
            known = set(items_known)
            keep = np.fromiter(
                (raw not in known for raw in raw_items), bool, count=len(raw_items)
            )
            item_ids = item_ids[keep]

        u_dense = self.user_vocab.encode(np.asarray([user], dtype=object))[0]
        fetch = self._topk_fetch()
        catalog = getattr(self, "_catalog_scores", None)
        if fetch is not None and u_dense >= 0:
            # device-side top-k: over-fetch by the exclusion count,
            # filter on host, cut — only k values+indices are fetched
            excluded = self._encode_known_set(items_known)
            k = min(self.n_items, amount + len(excluded))
            vals, idx = fetch(np.asarray([u_dense], np.int32), k)
            out = self._topk_row_frame(user, vals[0], idx[0], excluded,
                                       amount, bound_ratings, raw_items)
            self.predictions_possible = [True] * len(out)
            return out if include_user else out.drop(columns=["user_id"])
        if catalog is not None and u_dense >= 0:
            # full-catalog scoring as one MXU matmul (models that support it)
            preds = np.asarray(catalog(int(u_dense)))[item_ids]
            # parity: reference recommend sets predictions_possible via its
            # predict call (user and all catalog items are known here)
            self.predictions_possible = [True] * len(item_ids)
        else:
            u = np.full(item_ids.shape, u_dense, dtype=np.int32)
            preds, possible = self._predict_dense(u, item_ids, bound_ratings=False)
            self.predictions_possible = np.asarray(possible).tolist()

        order = np.argsort(-preds, kind="stable")[:amount]
        top_items = item_ids[order]
        top_preds = preds[order]
        if bound_ratings:
            top_preds = np.clip(top_preds, self.min_rating, self.max_rating)

        out = pd.DataFrame(
            {
                "user_id": [user] * len(top_items),
                "item_id": [raw_items[x] for x in top_items],
                "rating_pred": top_preds,
            }
        )
        if not include_user:
            out = out.drop(columns=["user_id"])
        return out

    def recommend_batch(
        self,
        users: list,
        amount: int = 10,
        items_known_map: Optional[dict] = None,
        bound_ratings: bool = True,
    ) -> pd.DataFrame:
        """Top-``amount`` unseen items for MANY users in one call.

        Models with a batched catalog scorer (``_catalog_scores_batch``)
        score all users as one MXU matmul; others loop ``recommend``.
        ``items_known_map``: optional {user: iterable of known items}.
        """
        self._require_fitted()
        items_known_map = items_known_map or {}
        batch_fn = getattr(self, "_catalog_scores_batch", None)
        fetch = self._topk_fetch()
        u_dense = self.user_vocab.encode(np.asarray(users, dtype=object))
        frames = []
        if fetch is not None and (u_dense >= 0).all():
            # one device top-k for the whole cohort: (B, k) values+indices
            # fetched instead of (B, n_items) scores; over-fetched by the
            # largest exclusion set so filtering never truncates < amount
            raw_items = self.item_vocab.raw_ids
            known_dense = {
                user: self._encode_known_set(items_known_map.get(user))
                for user in users if items_known_map.get(user)
            }
            extra = max((len(v) for v in known_dense.values()), default=0)
            k = min(self.n_items, amount + extra)
            vals, idx = fetch(u_dense.astype(np.int32), k)
            for row, user in enumerate(users):
                frames.append(self._topk_row_frame(
                    user, vals[row], idx[row], known_dense.get(user, ()),
                    amount, bound_ratings, raw_items))
            return pd.concat(frames, ignore_index=True)
        if batch_fn is not None and (u_dense >= 0).all():
            scores = np.asarray(batch_fn(u_dense))  # (B, n_items)
            raw_items = self.item_vocab.raw_ids
            for row, user in enumerate(users):
                s = scores[row]
                known = items_known_map.get(user)
                if known:
                    known_dense = self.item_vocab.encode(
                        np.asarray(list(known), dtype=object)
                    )
                    s = s.copy()
                    s[known_dense[known_dense >= 0]] = -np.inf
                order = np.argsort(-s, kind="stable")[:amount]
                order = order[np.isfinite(s[order])]  # drop masked knowns
                preds = s[order]
                if bound_ratings:
                    preds = np.clip(preds, self.min_rating, self.max_rating)
                frames.append(pd.DataFrame({
                    "user_id": [user] * len(order),
                    "item_id": [raw_items[x] for x in order],
                    "rating_pred": preds,
                }))
        else:
            for user in users:
                frames.append(self.recommend(
                    user, amount=amount,
                    items_known=items_known_map.get(user),
                    bound_ratings=bound_ratings,
                ))
        return pd.concat(frames, ignore_index=True)
