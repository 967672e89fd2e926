"""ctypes binding for the sequential-SGD parity oracle (oracle.cpp)."""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "_oracle.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

_KERNELS = {"linear": 0, "sigmoid": 1, "rbf": 2}


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _SO.exists():
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", str(_DIR / "oracle.cpp"), "-o", str(_SO)],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.mf_sequential_sgd.argtypes = [
            ctypes.c_int, i32p, i32p, f64p, ctypes.c_longlong,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, f64p, f64p, f64p, f64p, f64p,
        ]
        lib.mf_sequential_sgd.restype = None
        _lib = lib
        return _lib


def sequential_sgd(
    kernel: str,
    u: np.ndarray,
    i: np.ndarray,
    r: np.ndarray,
    n_users: int,
    n_items: int,
    n_factors: int,
    global_mean: float,
    lr: float,
    reg: float,
    gamma: float,
    min_rating: float,
    max_rating: float,
    n_epochs: int,
    P0: np.ndarray,
    Q0: np.ndarray,
    seed: int = 0,
    update_user_params: bool = True,
    update_item_params: bool = True,
    shuffle: bool = True,
    bu0: Optional[np.ndarray] = None,
    bi0: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Run the reference-semantics sequential SGD; returns
    (P, Q, bu, bi, rmse_history).  ``shuffle=False`` visits ratings in
    input order (hand-vector tests); ``bu0``/``bi0`` override the zero
    bias initialization."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("oracle native library unavailable (g++ missing?)")
    P = np.ascontiguousarray(P0, np.float64).copy()
    Q = np.ascontiguousarray(Q0, np.float64).copy()
    bu = (np.zeros(n_users, np.float64) if bu0 is None
          else np.ascontiguousarray(bu0, np.float64).copy())
    bi = (np.zeros(n_items, np.float64) if bi0 is None
          else np.ascontiguousarray(bi0, np.float64).copy())
    hist = np.zeros(n_epochs, np.float64)
    lib.mf_sequential_sgd(
        _KERNELS[kernel],
        np.ascontiguousarray(u, np.int32),
        np.ascontiguousarray(i, np.int32),
        np.ascontiguousarray(r, np.float64),
        len(r), n_users, n_items, n_factors,
        float(global_mean), float(lr), float(reg), float(gamma),
        float(min_rating), float(max_rating - min_rating),
        int(n_epochs), int(seed), int(shuffle),
        int(update_user_params), int(update_item_params),
        P, Q, bu, bi, hist,
    )
    return P, Q, bu, bi, hist
