import numpy as np
import pandas as pd
import pytest

from matrix_factorization_tpu.core.ids import IdVocab, check_no_duplicates
from matrix_factorization_tpu.utils.splits import train_update_test_split


def test_vocab_roundtrip():
    v = IdVocab.from_values(np.array(["b", "a", "b", "c"]))
    assert len(v) == 3
    assert v.encode(np.array(["b", "a", "c"])).tolist() == [0, 1, 2]
    assert v.encode(np.array(["zzz"])).tolist() == [-1]
    assert v.decode([0, 2]) == ["b", "c"]
    assert "a" in v and "zzz" not in v
    assert v.as_dict() == {"b": 0, "a": 1, "c": 2}


def test_vocab_extend_assigns_next_ids():
    v = IdVocab.from_values(np.array([10, 20]))
    v.extend([20, 30, 40])
    assert v.encode(np.array([10, 20, 30, 40])).tolist() == [0, 1, 2, 3]


def test_duplicate_detection():
    with pytest.raises(ValueError, match="Duplicate"):
        check_no_duplicates(np.array([1, 2, 1]), np.array([5, 6, 5]))
    check_no_duplicates(np.array([1, 2, 1]), np.array([5, 6, 6]))


def test_train_update_test_split_partition():
    rng = np.random.default_rng(1)
    n = 600
    X = pd.DataFrame(
        {
            "user_id": rng.integers(0, 30, n),
            "item_id": rng.integers(0, 50, n),
            "rating": rng.uniform(1, 5, n),
        }
    ).drop_duplicates(subset=["user_id", "item_id"])

    Xi, yi, Xu, yu, Xt, yt = train_update_test_split(X, frac_new_users=0.2, seed=7)
    init_users = set(Xi["user_id"])
    upd_users = set(Xu["user_id"])
    test_users = set(Xt["user_id"])

    # held-out users never appear in initial training
    assert init_users.isdisjoint(upd_users | test_users)
    # update and test cover the same user population
    assert upd_users == test_users
    # all rows accounted for
    assert len(Xi) + len(Xu) + len(Xt) == len(X)
    # per-user 50/50 (within 1)
    upd_counts = Xu["user_id"].value_counts()
    test_counts = Xt["user_id"].value_counts()
    for u in upd_users:
        assert abs(upd_counts.get(u, 0) - test_counts.get(u, 0)) <= 1
    # labels aligned with rows
    assert list(yi.index) == list(Xi.index)


def test_encode_is_o1_per_call_at_large_vocab():
    """Serving regression (round 3): single-id encode against a
    1M-entry vocabulary must reuse the cached hash table, not rebuild
    an O(n_vocab) mapping per call (725ms/call before the fix)."""
    import time

    from matrix_factorization_tpu.core.ids import IdVocab

    vocab = IdVocab.from_values(np.arange(1_000_000))
    vocab.encode(np.asarray([0], dtype=object))  # build the table
    t0 = time.perf_counter()
    for k in range(100):
        out = vocab.encode(np.asarray([k], dtype=object))
        assert out[0] == k
    assert time.perf_counter() - t0 < 2.0  # ~50ms real; 100x headroom vs old
    # mutation invalidates the cache
    vocab.add("new-user")
    assert vocab.encode(np.asarray(["new-user"], dtype=object))[0] == 1_000_000
    assert vocab.encode(np.asarray(["absent"], dtype=object))[0] == -1
