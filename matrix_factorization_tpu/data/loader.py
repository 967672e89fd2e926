"""Rating-stream loading: native C++ fast path with pandas fallback.

``load_ratings_csv`` parses a (user, item, rating) CSV and returns dense
int32 ids + float32 ratings + the id vocabularies — the input format of
every trainer.  Numeric-id files go through the multithreaded C++ loader
(``native/loader.cpp``), which also dictionary-encodes in first-seen order
(identical to :class:`core.ids.IdVocab`); string ids or parse failures
fall back to pandas.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import NamedTuple, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "_loader.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build_native() -> bool:
    src = _NATIVE_DIR / "loader.cpp"
    if not src.exists():
        return False
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", str(src), "-o", str(_SO_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _so_is_stale() -> bool:
    """A cached .so built from an older loader.cpp lacks newer symbols."""
    src = _NATIVE_DIR / "loader.cpp"
    try:
        return src.exists() and src.stat().st_mtime > _SO_PATH.stat().st_mtime
    except OSError:
        return False


def get_native_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native loader; None if unavailable.

    Rebuilds when ``loader.cpp`` is newer than the cached ``.so``, and
    treats missing symbols (a stale ``.so`` whose mtime lied, e.g. after
    a checkout that preserved timestamps) as one more rebuild trigger —
    every failure path degrades to the numpy fallback, never raises.
    """
    global _lib, _build_failed
    if os.environ.get("MF_TPU_DISABLE_NATIVE"):
        return None  # A/B probes (benchmarks/sgd_pack_probe.py)
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if (not _SO_PATH.exists() or _so_is_stale()) and not _build_native():
            _build_failed = True
            return None
        for attempt in range(2):
            try:
                lib = _load_and_bind()
                break
            except (OSError, AttributeError):
                # AttributeError = stale .so missing a newer symbol;
                # rebuild once, then give up and use the numpy paths
                if attempt or not _build_native():
                    _build_failed = True
                    return None
        _lib = lib
        return _lib


def _load_and_bind() -> ctypes.CDLL:
    lib = ctypes.CDLL(str(_SO_PATH))
    c = ctypes.c_char_p
    ll = ctypes.c_longlong
    i32 = ctypes.c_int
    dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    ip = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.mf_count_rows.argtypes = [c, ll, i32]
    lib.mf_count_rows.restype = ll
    lib.mf_parse_numeric_csv.argtypes = [
        c, ll, i32, i32, i32, i32, ll, dp, dp, fp, i32,
    ]
    lib.mf_parse_numeric_csv.restype = ll
    lib.mf_dense_encode.argtypes = [dp, ll, ip, dp]
    lib.mf_dense_encode.restype = ll
    lib.mf_find_duplicate_pair.argtypes = [dp, dp, ll]
    lib.mf_find_duplicate_pair.restype = ll
    llp = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.mf_entity_counts.argtypes = [ip, ll, i32, ip]
    lib.mf_entity_counts.restype = None
    lib.mf_pack_grouped.argtypes = [
        ip, ip, fp, ll, ip, ip, ip, llp, ip, fp, fp, ip,
    ]
    lib.mf_pack_grouped.restype = None
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    lib.mf_pack_grouped_wire.argtypes = [
        ip, ip, fp, ll, ip, ip, ip, llp,
        u16p, u8p, i32, i8p, fp, i32, ip,
    ]
    lib.mf_pack_grouped_wire.restype = None
    lib.mf_sort_ranges.argtypes = [
        ip, ip, fp, fp, llp, llp, i32, i32, i32, i32,
    ]
    lib.mf_sort_ranges.restype = None
    lib.mf_argsort_ranges.argtypes = [
        ip, llp, llp, i32, i32, ip, ip, i32,
    ]
    lib.mf_argsort_ranges.restype = None
    lib.mf_encode_half.argtypes = [fp, ll, i8p, i32]
    lib.mf_encode_half.restype = i32
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.mf_gather_rows.argtypes = [
        ip, ip, fp, i64p, ll, ip, ip, fp, i32,
    ]
    lib.mf_gather_rows.restype = None
    lib.mf_encode_ids_wire.argtypes = [ip, ll, u16p, u8p, i32, i32]
    lib.mf_encode_ids_wire.restype = None
    lib.mf_sort_pairs_by_key.argtypes = [ip, ip, fp, ll, i32, ip, fp]
    lib.mf_sort_pairs_by_key.restype = None
    lib.mf_sort_triple_by_key.argtypes = [
        ip, ip, ip, fp, ll, i32, ip, ip, fp,
    ]
    lib.mf_sort_triple_by_key.restype = None
    lib.mf_lexsort_pair.argtypes = [ip, ip, fp, ll, i32, i32, ip, fp]
    lib.mf_lexsort_pair.restype = None
    return lib


class LoadedRatings(NamedTuple):
    user_ids: np.ndarray  # int32 dense
    item_ids: np.ndarray  # int32 dense
    ratings: np.ndarray  # float32
    user_uniques: np.ndarray  # raw ids in dense order
    item_uniques: np.ndarray
    backend: str  # 'native' | 'pandas'


def _native_load(
    path: Path, has_header: bool, cols: Tuple[int, int, int],
    check_duplicates: bool,
) -> Optional[LoadedRatings]:
    lib = get_native_lib()
    if lib is None:
        return None
    blob = Path(path).read_bytes()
    if not blob:
        return None
    n = lib.mf_count_rows(blob, len(blob), int(has_header))
    if n <= 0:
        return None
    users = np.empty(n, np.float64)
    items = np.empty(n, np.float64)
    ratings = np.empty(n, np.float32)
    threads = min(os.cpu_count() or 1, 16)
    got = lib.mf_parse_numeric_csv(
        blob, len(blob), int(has_header), cols[0], cols[1], cols[2], n,
        users, items, ratings, threads,
    )
    if got <= 0:
        return None  # non-numeric ids or malformed line -> pandas path
    users, items, ratings = users[:got], items[:got], ratings[:got]
    if check_duplicates:
        dup = lib.mf_find_duplicate_pair(users, items, got)
        if dup >= 0:
            raise ValueError("Duplicate user-item ratings in matrix")
    u_codes = np.empty(got, np.int32)
    u_uniq = np.empty(got, np.float64)
    nu = lib.mf_dense_encode(users, got, u_codes, u_uniq)
    i_codes = np.empty(got, np.int32)
    i_uniq = np.empty(got, np.float64)
    ni = lib.mf_dense_encode(items, got, i_codes, i_uniq)
    return LoadedRatings(
        u_codes, i_codes, ratings, u_uniq[:nu], i_uniq[:ni], "native"
    )


def _pandas_load(
    path: Path, has_header: bool, cols: Tuple[int, int, int],
    check_duplicates: bool,
) -> LoadedRatings:
    import pandas as pd

    df = pd.read_csv(path, header=0 if has_header else None)
    cu, ci, cr = (df.columns[c] for c in cols)
    users = df[cu].to_numpy()
    items = df[ci].to_numpy()
    ratings = df[cr].to_numpy(np.float32)
    if check_duplicates:
        if pd.DataFrame({"u": users, "i": items}).duplicated().any():
            raise ValueError("Duplicate user-item ratings in matrix")
    # first-seen order (np.unique would sort; pd.factorize preserves order)
    u_codes, u_uniq = pd.factorize(users, use_na_sentinel=False)
    i_codes, i_uniq = pd.factorize(items, use_na_sentinel=False)
    return LoadedRatings(
        u_codes.astype(np.int32), i_codes.astype(np.int32), ratings,
        np.asarray(u_uniq), np.asarray(i_uniq), "pandas",
    )


def load_ratings_csv(
    path: os.PathLike,
    has_header: bool = True,
    cols: Tuple[int, int, int] = (0, 1, 2),
    check_duplicates: bool = True,
    force_backend: Optional[str] = None,
) -> LoadedRatings:
    """Load + dense-encode a rating CSV; native fast path when possible."""
    path = Path(path)
    if force_backend != "pandas":
        try:
            out = _native_load(path, has_header, cols, check_duplicates)
            if out is not None:
                return out
        except ValueError:
            raise  # duplicate detection is authoritative
        except Exception:
            pass
        if force_backend == "native":
            raise RuntimeError("native loader unavailable or failed")
    return _pandas_load(path, has_header, cols, check_duplicates)
