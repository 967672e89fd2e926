"""Vocabulary / dense-id remapping for arbitrary user and item ids.

TPU-first design: the reference keeps ``{raw_id: int}`` dicts and remaps with
``pandas.Series.map`` on every call (reference ``recommender_base.py:97-173``).
Here the vocabulary is a host-side object producing **dense int32 arrays**
that are the only thing ever shipped to the device.  Lookups are vectorized
through pandas factorize/Index machinery (C speed), and unknown ids map to
``-1`` exactly like the reference's predict path
(``recommender_base.py:166-168``).

Capacity semantics: downstream device tables are capacity-padded (see
``models/state.py``) so ``update_users`` can add users without retracing —
the vocabulary therefore distinguishes ``size`` (ids assigned) from the
table capacity it is paired with.
"""

from __future__ import annotations

from typing import Any, Iterable, List, Sequence, Tuple

import numpy as np
import pandas as pd


class IdVocab:
    """Bidirectional mapping raw id <-> dense int32 id.

    Dense ids are assigned in first-seen order, matching the reference's
    ``{user_id: i for (i, user_id) in enumerate(user_ids)}``
    (``recommender_base.py:137-138``).
    """

    __slots__ = ("_index", "_lookup", "_pd_index")

    def __init__(self, raw_ids: Sequence[Any] | None = None):
        self._pd_index: pd.Index | None = None  # lazy encode hash table
        if raw_ids is None:
            self._index: List[Any] = []
            self._lookup: dict = {}
        else:
            self._index = list(dict.fromkeys(raw_ids))
            self._lookup = {r: i for i, r in enumerate(self._index)}

    # -- construction -----------------------------------------------------
    @classmethod
    def from_values(cls, values: np.ndarray | pd.Series) -> "IdVocab":
        vocab = cls()
        uniques = pd.unique(np.asarray(values))
        vocab._index = list(uniques)
        vocab._lookup = {r: i for i, r in enumerate(vocab._index)}
        return vocab

    def add(self, raw_id: Any) -> int:
        """Assign the next dense id to ``raw_id`` (idempotent)."""
        idx = self._lookup.get(raw_id)
        if idx is None:
            idx = len(self._index)
            self._index.append(raw_id)
            self._lookup[raw_id] = idx
            self._pd_index = None  # encode table is stale
        return idx

    def extend(self, raw_ids: Iterable[Any]) -> List[int]:
        return [self.add(r) for r in raw_ids]

    # -- lookups ----------------------------------------------------------
    def encode(self, values: np.ndarray | pd.Series, strict: bool = False) -> np.ndarray:
        """Vectorized raw -> dense int32; unknown ids become -1.

        With ``strict=True`` unknown ids raise ``KeyError`` instead.

        Lookups go through a cached ``pd.Index`` hash table
        (``get_indexer``), built once per vocabulary mutation: the
        previous ``Series.map(dict)`` rebuilt an O(n_vocab) mapping on
        EVERY call — 725ms per single-user ``recommend`` at a 1M-user
        vocabulary, dwarfing the 61ms device dispatch.
        """
        vals = np.asarray(values)
        if len(self._index) == 0:
            out = np.full(len(vals), -1, np.int64)
        elif len(vals) <= 64:
            # serving path: direct dict lookups are O(B) microseconds,
            # while get_indexer's object->int coercion costs ~60ms/call
            out = np.fromiter(
                (self._lookup.get(v, -1) for v in vals), np.int64,
                count=len(vals),
            )
        else:
            if self._pd_index is None:
                self._pd_index = pd.Index(self._index)
            try:
                out = self._pd_index.get_indexer(vals)
            except (TypeError, pd.errors.InvalidIndexError):
                # mixed unorderable types: fall back to dict lookups
                out = np.fromiter(
                    (self._lookup.get(v, -1) for v in vals), np.int64,
                    count=len(vals),
                )
        if strict and (out < 0).any():
            missing = pd.unique(vals[out < 0])[:5]
            raise KeyError(f"Unknown ids: {list(missing)}")
        return out.astype(np.int32)

    def decode(self, dense_ids: np.ndarray) -> List[Any]:
        return [self._index[int(i)] for i in np.asarray(dense_ids)]

    def __contains__(self, raw_id: Any) -> bool:
        return raw_id in self._lookup

    def __len__(self) -> int:
        return len(self._index)

    @property
    def raw_ids(self) -> List[Any]:
        return list(self._index)

    def as_dict(self) -> dict:
        """Reference-compatible ``{raw_id: dense_id}`` view."""
        return dict(self._lookup)


def check_no_duplicates(user_ids: np.ndarray, item_ids: np.ndarray) -> None:
    """Raise ``ValueError`` on duplicate (user, item) pairs.

    Mirrors the reference's guard (``recommender_base.py:127-128``) but runs
    as one vectorized pandas call instead of a DataFrame dedup scan.
    """
    df = pd.DataFrame({"u": user_ids, "i": item_ids})
    if df.duplicated().any():
        raise ValueError("Duplicate user-item ratings in matrix")


def extract_pairs(X: pd.DataFrame) -> Tuple[np.ndarray, np.ndarray]:
    """Pull the (user_id, item_id) columns out of the API DataFrame."""
    return X["user_id"].to_numpy(), X["item_id"].to_numpy()
