"""Serving-path latency on one chip: full-catalog recommend for a
production-shaped model (1M users x 100k items, k=64).

Measures, after warm-up:
* single-user ``recommend`` latency (p50/p95 over 100 calls) — the
  reference's serving path scores the catalog per request through
  pandas + numba (``recommender_base.py:245-271``);
* 256-user ``recommend_batch`` (one MXU matmul for the whole cohort),
  amortized per-user latency;
* ``--concurrency``: N simulated clients hammering single-user
  ``recommend`` — independent per-request dispatch (what a threaded
  HTTP server does naively; reference ``api.py:90-134`` has the same
  shape) vs the request-coalescing micro-batch queue
  (``serve/coalesce.py``), reporting p50/p99 and device programs
  issued per request served.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/serving_latency.py
"""

import argparse
import json
import threading
import time

import numpy as np


def concurrency_section(model, users, client_counts=(4, 16, 64),
                        calls_per_client=8, window_ms=3.0):
    """Offered-load A/B: per-request dispatch vs coalesced dispatch."""
    from matrix_factorization_tpu.serve.coalesce import (
        CoalescingRecommender)

    rows = []
    for n_clients in client_counts:
        for mode in ("independent", "coalesced"):
            co = (CoalescingRecommender(model, window_ms=window_ms,
                                        max_batch=256)
                  if mode == "coalesced" else None)
            lats = []
            lock = threading.Lock()
            start = threading.Barrier(n_clients)

            def client(cid):
                my = []
                start.wait()
                for c in range(calls_per_client):
                    uu = users[(cid * calls_per_client + c) % len(users)]
                    t0 = time.perf_counter()
                    if co is None:
                        model.recommend(user=uu, amount=10)
                    else:
                        co.recommend(user=uu, amount=10)
                    my.append(time.perf_counter() - t0)
                with lock:
                    lats.extend(my)

            ts = [threading.Thread(target=client, args=(n,))
                  for n in range(n_clients)]
            t0 = time.perf_counter()
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            wall = time.perf_counter() - t0
            n_req = n_clients * calls_per_client
            lats = np.sort(lats)
            row = {
                "mode": mode, "clients": n_clients, "requests": n_req,
                "wall_seconds": round(wall, 3),
                "throughput_rps": round(n_req / wall, 1),
                "p50_ms": round(float(lats[len(lats) // 2]) * 1e3, 1),
                "p99_ms": round(float(lats[int(len(lats) * 0.99) - 1])
                                * 1e3, 1),
            }
            if co is not None:
                row["device_programs"] = co.dispatches
                row["requests_per_program"] = round(
                    n_req / max(1, co.dispatches), 1)
                co.close()
            else:
                row["device_programs"] = n_req
                row["requests_per_program"] = 1.0
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", choices=["small", "full"], default="full")
    p.add_argument("--concurrency", action="store_true",
                   help="run the offered-load A/B (independent vs "
                        "coalesced dispatch)")
    a = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import pandas as pd

    from matrix_factorization_tpu import KernelMF

    n_u, n_i, n_r = (
        (1_000_000, 100_000, 2_000_000) if a.scale == "full"
        else (2000, 1500, 100_000)
    )
    rng = np.random.default_rng(0)
    flat = np.unique(
        rng.integers(0, n_u * n_i, int(n_r * 1.15), dtype=np.int64)
    )[:n_r]
    rng.shuffle(flat)
    u = (flat // n_i).astype(np.int32)
    i = (flat % n_i).astype(np.int32)
    r = np.round(rng.uniform(0.5, 5, len(u)) * 2).astype(np.float32) / 2

    model = KernelMF(n_factors=64, n_epochs=1, lr=0.002, reg=0.005,
                     batch_size=262_144, min_rating=0.5, max_rating=5.0)
    t0 = time.time()
    model.fit(pd.DataFrame({"user_id": u, "item_id": i}), pd.Series(r))
    print(f"fit {time.time() - t0:.1f}s "
          f"({n_u} users x {n_i} items, k=64)", flush=True)

    users = [int(x) for x in rng.choice(np.unique(u), 256, replace=False)]

    # single-user recommend
    model.recommend(user=users[0], amount=10)  # warm-up/compile
    lats = []
    for uu in users[:100]:
        t0 = time.perf_counter()
        model.recommend(user=uu, amount=10)
        lats.append(time.perf_counter() - t0)
    lats = np.sort(lats)
    print(f"recommend(1 user, {n_i}-item catalog): "
          f"p50 {lats[49] * 1e3:.1f}ms  p95 {lats[94] * 1e3:.1f}ms",
          flush=True)

    # batched recommend
    model.recommend_batch(users[:8], amount=10)  # warm-up small
    model.recommend_batch(users, amount=10)  # warm-up full shape
    t0 = time.perf_counter()
    out = model.recommend_batch(users, amount=10)
    dt = time.perf_counter() - t0
    assert len(out) == 256 * 10
    print(f"recommend_batch(256 users): {dt * 1e3:.0f}ms total, "
          f"{dt / 256 * 1e3:.2f}ms/user", flush=True)

    if a.concurrency:
        rows = concurrency_section(model, users)
        out = "benchmarks/results/serving_concurrency_v5e.jsonl"
        with open(out, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
