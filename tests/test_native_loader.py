"""Native C++ rating loader vs the pandas path."""

import numpy as np
import pandas as pd
import pytest

from matrix_factorization_tpu.data.loader import (
    get_native_lib,
    load_ratings_csv,
)


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    n = 5000
    df = pd.DataFrame(
        {
            "userId": rng.integers(0, 200, n),
            "movieId": rng.integers(0, 300, n),
            "rating": np.round(rng.uniform(0.5, 5.0, n) * 2) / 2,
            "timestamp": rng.integers(1e9, 2e9, n),
        }
    ).drop_duplicates(subset=["userId", "movieId"])
    path = tmp_path_factory.mktemp("csv") / "ratings.csv"
    df.to_csv(path, index=False)
    return path, df


def test_native_lib_builds():
    assert get_native_lib() is not None, "g++ build of native loader failed"


def test_native_matches_pandas(csv_file):
    path, df = csv_file
    nat = load_ratings_csv(path, force_backend="native")
    pdl = load_ratings_csv(path, force_backend="pandas")
    assert nat.backend == "native" and pdl.backend == "pandas"
    np.testing.assert_array_equal(nat.user_ids, pdl.user_ids)
    np.testing.assert_array_equal(nat.item_ids, pdl.item_ids)
    np.testing.assert_allclose(nat.ratings, pdl.ratings, rtol=1e-6)
    np.testing.assert_array_equal(nat.user_uniques.astype(np.int64),
                                  pdl.user_uniques.astype(np.int64))
    # dense codes decode back to the raw ids in the file
    raw_users = nat.user_uniques[nat.user_ids].astype(np.int64)
    np.testing.assert_array_equal(raw_users, df["userId"].to_numpy())


def test_native_duplicate_detection(tmp_path):
    path = tmp_path / "dup.csv"
    path.write_text("user_id,item_id,rating\n1,2,3.0\n4,5,2.0\n1,2,4.0\n")
    with pytest.raises(ValueError, match="Duplicate"):
        load_ratings_csv(path, force_backend="native")


def test_string_ids_fall_back_to_pandas(tmp_path):
    path = tmp_path / "str.csv"
    path.write_text("user_id,item_id,rating\nu1,i1,3.0\nu2,i2,2.0\n")
    out = load_ratings_csv(path)
    assert out.backend == "pandas"
    assert out.user_ids.tolist() == [0, 1]
    assert list(out.user_uniques) == ["u1", "u2"]


def test_no_header_and_column_selection(tmp_path):
    path = tmp_path / "nh.csv"
    path.write_text("7,1,9.5,4.5\n8,2,9.5,3.0\n")
    out = load_ratings_csv(path, has_header=False, cols=(0, 1, 3))
    assert out.ratings.tolist() == [4.5, 3.0]
    assert out.user_uniques.astype(int).tolist() == [7, 8]


def test_all_unique_ids_do_not_hang(tmp_path):
    """Regression (ADVICE r1 high): the dense-encode FlatMap was sized for
    ~n/2 distinct keys and spun forever once full; near-unique user ids
    (valid data) deadlocked training. The map must grow instead."""
    n = 6000  # > the old fixed capacity for this n
    df = pd.DataFrame(
        {
            "userId": np.arange(n),  # all-unique
            "movieId": np.arange(n)[::-1],  # all-unique
            "rating": np.full(n, 3.0),
        }
    )
    path = tmp_path / "unique.csv"
    df.to_csv(path, index=False)
    nat = load_ratings_csv(path, force_backend="native")
    pdl = load_ratings_csv(path, force_backend="pandas")
    assert len(nat.user_uniques) == n and len(nat.item_uniques) == n
    np.testing.assert_array_equal(nat.user_ids, pdl.user_ids)
    np.testing.assert_array_equal(nat.item_ids, pdl.item_ids)


def test_native_pack_ratings_byte_identical_to_numpy(rng):
    """The native pack_ratings fast paths (mf_gather_rows shuffle,
    mf_sort_ranges chunk+batch counting sorts, mf_argsort_ranges,
    mf_encode_ids_wire / mf_encode_half wire encodes) must reproduce the
    numpy fallback byte-for-byte — counting sorts are stable, matching
    argsort(kind='stable'), and the wire decode is exact.  Covers
    hi-plane user ids (>=65536), both rating encode branches, every
    pack order, and the unshuffled path."""
    import dataclasses

    from matrix_factorization_tpu.data import loader
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    lib = loader.get_native_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    names = [f.name for f in dataclasses.fields(sgd.RatingBatches)]
    n, U, I = 60_000, 90_000, 700
    u = rng.integers(0, U, n).astype(np.int32)
    i = rng.integers(0, I, n).astype(np.int32)
    for ratings in (rng.uniform(0.5, 5, n).astype(np.float32),
                    (rng.integers(1, 11, n) * 0.5).astype(np.float32)):
        for order in ("shuffle", "item", "user"):
            for seed in (0, None):
                nat = sgd.pack_ratings(u, i, ratings, 16_384,
                                       order=order, shuffle_seed=seed)
                loader._lib = None
                loader._build_failed = True
                try:
                    ref = sgd.pack_ratings(u, i, ratings, 16_384,
                                           order=order, shuffle_seed=seed)
                finally:
                    loader._lib = lib
                    loader._build_failed = False
                for f in names:
                    a, b = getattr(nat, f), getattr(ref, f)
                    if a is None or isinstance(a, (int, str, bool, tuple)):
                        assert a == b, (order, seed, f)
                    else:
                        np.testing.assert_array_equal(
                            np.asarray(a), np.asarray(b),
                            err_msg=f"{order} {seed} {f}")


def test_native_stream_sorts_byte_identical_to_numpy(rng):
    """mf_sort_pairs_by_key must equal argsort(kind='stable') applied
    (sparse_gram stream build) and mf_lexsort_pair must equal
    np.lexsort((sec, prim)) applied (cf_topk CSR build)."""
    lib = get_native_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    n, U, I = 50_000, 900, 400
    u = rng.integers(0, U, n).astype(np.int32)
    i = rng.integers(0, I, n).astype(np.int32)
    r = rng.uniform(0.5, 5, n).astype(np.float32)

    i_s = np.empty(n, np.int32)
    r_s = np.empty(n, np.float32)
    lib.mf_sort_pairs_by_key(u, i, r, n, U, i_s, r_s)
    order = np.argsort(u, kind="stable")
    np.testing.assert_array_equal(i_s, i[order])
    np.testing.assert_array_equal(r_s, r[order])

    c_s = np.empty(n, np.int32)
    rr_s = np.empty(n, np.float32)
    lib.mf_lexsort_pair(u, i, r, n, U, I, c_s, rr_s)
    order = np.lexsort((i, u))
    np.testing.assert_array_equal(c_s, i[order])
    np.testing.assert_array_equal(rr_s, r[order])


def test_wire_id_boundaries_roundtrip():
    """_ship_ids must be lossless at the encode-branch boundaries:
    65535/65536 (uint16 -> hi-plane) and 2^24-1/2^24 (hi-plane -> raw
    int32)."""
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    for ids in ([0], [65535], [65536], [65535, 65536],
                [(1 << 24) - 1], [(1 << 24)], [0, (1 << 24) - 1],
                [123, 70_000, (1 << 24) - 1]):
        a = np.asarray(ids, np.int32)
        out = np.asarray(sgd._ship_ids(a))
        np.testing.assert_array_equal(out, a, err_msg=str(ids))
        assert out.dtype == np.int32

    # negative ids (cold-start -1 markers) must pass through untouched
    a = np.asarray([-1, 5, 70_000], np.int32)
    np.testing.assert_array_equal(np.asarray(sgd._ship_ids(a)), a)


def test_wire_rating_boundaries_roundtrip():
    """_ship_ratings int8 half-step encode boundaries: ±63.0 encodes,
    63.5 (=127 half-steps) must NOT take the int8 branch."""
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    for vals, exact in [([0.5, 5.0, -2.5], True), ([63.0, -63.0], True),
                        ([63.5], False), ([0.3], False),
                        ([1e6], False)]:
        a = np.asarray(vals, np.float32)
        out = np.asarray(sgd._ship_ratings(a))
        np.testing.assert_array_equal(out, a, err_msg=str(vals))

    # single-element and empty
    np.testing.assert_array_equal(
        np.asarray(sgd._ship_ratings(np.zeros(0, np.float32))),
        np.zeros(0, np.float32))


def test_stale_so_rebuilds_instead_of_crashing(tmp_path):
    """A cached _loader.so older than loader.cpp must trigger a rebuild
    (a stale binary lacks newly added symbols, and the old code path
    raised AttributeError from the ctypes bindings instead of falling
    back — code-review r3 finding #1)."""
    import os
    import time

    from matrix_factorization_tpu.data import loader

    lib = loader.get_native_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    so, cpp = loader._SO_PATH, loader._NATIVE_DIR / "loader.cpp"
    old_so_mtime = so.stat().st_mtime
    # make the source look newer than the cached binary
    os.utime(cpp, (time.time() + 5, time.time() + 5))
    try:
        loader._lib = None
        loader._build_failed = False
        assert loader._so_is_stale()
        lib2 = loader.get_native_lib()
        assert lib2 is not None
        assert so.stat().st_mtime > old_so_mtime, "stale .so must rebuild"
        # every symbol the bindings need resolved on the fresh build
        assert lib2.mf_pack_grouped_wire is not None
    finally:
        now = time.time()
        os.utime(cpp, (now - 10, now - 10))
        loader._lib = None
        loader._build_failed = False
        loader.get_native_lib()
