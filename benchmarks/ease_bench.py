"""EASE closed-form fit on the real chip: gram + inverse wall-clock.

The fit is two device programs — the chunked gram accumulation and the
Schur-recursion scaled inverse (``ops/ease.py``); this measures both
warm (compile excluded: first call per shape pays it, the timed call
re-runs).  XLA's unblocked Cholesky would cost ~1ms x I_p sequential
steps at these sizes (~8s at 8k items, ~16s at 16k); the recursion is
O(log) levels of MXU matmuls.  One JSON line per catalog size:

    python benchmarks/ease_bench.py --items 2048 8192 16384
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _persistent_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def run_combo(n_users: int, n_items: int, per_user: int, seed: int = 0):
    from matrix_factorization_tpu.ops import ease as ease_ops

    rng = np.random.default_rng(seed)
    n = n_users * per_user
    u = np.repeat(np.arange(n_users, dtype=np.int64), per_user)
    i = rng.integers(0, n_items, n).astype(np.int64)
    w = np.ones(n, np.float32)

    def once():
        t0 = time.perf_counter()
        G = ease_ops.item_gram(u, i, w, n_users, n_items)
        float(np.asarray(G[0, 0]))  # fetch barrier (remote dispatch)
        t_gram = time.perf_counter() - t0
        t0 = time.perf_counter()
        B = ease_ops.ease_weights(G, 100.0)
        b00 = float(np.asarray(B[0, 1]))
        t_inv = time.perf_counter() - t0
        assert np.isfinite(b00)
        return t_gram, t_inv

    once()  # compile
    t_gram, t_inv = once()
    return {
        "metric": "ease_fit_seconds",
        "value": round(t_gram + t_inv, 3),
        "unit": "s",
        "gram_seconds": round(t_gram, 3),
        "inverse_seconds": round(t_inv, 3),
        "n_items": n_items,
        "n_users": n_users,
        "nnz": n,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    # nnz kept small on purpose: this image's host->device tunnel runs
    # at single-digit MB/s, so a big pair stream would time the wire,
    # not the gram/inverse programs (the ROADMAP transfer caveat)
    p.add_argument("--users", type=int, default=20_000)
    p.add_argument("--items", type=int, nargs="+",
                   default=[2048, 8192, 16384])
    p.add_argument("--per-user", type=int, default=50)
    args = p.parse_args()
    _persistent_cache()
    for ni in args.items:
        print(json.dumps(run_combo(args.users, ni, args.per_user)),
              flush=True)


if __name__ == "__main__":
    main()
