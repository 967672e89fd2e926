"""Headline benchmark: KernelMF SGD rating-updates/sec on one chip.

Mirrors the reference's hot path (KernelMF linear, k=100 — the 0.69M
updates/s/core numba loop measured in
``examples/recommender-system.ipynb`` cell 18, see SURVEY.md §6) on a
MovieLens-25M-shaped synthetic workload.  Prints ONE JSON line:
``{"metric", "value", "unit", "vs_baseline"}`` where vs_baseline is the
speedup over the reference's single-core throughput.

Uses the chunk-item-sorted epoch layout (``pack_ratings(order='item')``)
— MXU tile-aggregated updates instead of per-row scatters; held-out RMSE
parity vs the sequential reference-semantics oracle is regression-tested
(tests/test_parity_oracle.py::test_item_order_rmse_parity_vs_oracle).

``--config 1..5`` instead runs one of the five BASELINE.json configs
(delegates to benchmarks/run_configs.py, one JSON line each).
"""

import argparse
import json
import sys
import time

import numpy as np


REFERENCE_UPDATES_PER_SEC = 0.69e6  # KernelMF linear, reference laptop core

N_RATINGS = 2_000_000
N_USERS = 10_000
N_ITEMS = 20_000
N_FACTORS = 100
BATCH_SIZE = 131_072
# the timed window must dwarf the image's host<->device tunnel RTT
# (tens of ms, load-dependent): 20 epochs x 2M updates ~= 650ms of
# compute at 60M/s, so RTT jitter is ~1-2% instead of the ~16% swing a
# 2-epoch window showed between round-2 runs
TIMED_EPOCHS = 20
TRIALS = 5


def main() -> None:
    import jax

    # persistent compile cache: axon remote compiles run minutes-long cold;
    # cached reruns start in seconds
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    import jax.numpy as jnp

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    rng = np.random.default_rng(0)
    u = rng.integers(0, N_USERS, N_RATINGS).astype(np.int32)
    i = rng.integers(0, N_ITEMS, N_RATINGS).astype(np.int32)
    r = rng.uniform(0.5, 5.0, N_RATINGS).astype(np.float32)

    cfg = SGDConfig(
        kernel="linear",
        n_factors=N_FACTORS,
        lr=0.002,
        reg=0.005,
        batch_size=BATCH_SIZE,
        compute_epoch_rmse=False,
        shuffle="batch",
    )
    data = sgd.pack_ratings(u, i, r, cfg.batch_size, order="auto",
                            row_width=cfg.padded_factors)
    params = sgd.init_params(
        jax.random.PRNGKey(0), N_USERS, N_ITEMS, cfg, float(r.mean())
    )
    train = sgd.jit_sgd_train(cfg, TIMED_EPOCHS)

    # warm-up: compile + one full run (axon block_until_ready is unreliable;
    # a scalar host fetch forces completion)
    out, _ = train(params, data, jax.random.PRNGKey(1), cfg.lr)
    float(jnp.sum(out.user_features))

    # median of TRIALS: the shared tunnel adds load-dependent noise;
    # the long window amortizes per-dispatch RTT, the median rejects
    # outlier trials, and reporting it (not best-of-N) makes the number
    # driver-reproducible (round-2 lesson: best-of-3 over 2-epoch
    # windows swung 16% between runs)
    times = []
    for _ in range(TRIALS):
        params = sgd.init_params(
            jax.random.PRNGKey(0), N_USERS, N_ITEMS, cfg, float(r.mean())
        )
        float(jnp.sum(params.user_features))
        t0 = time.perf_counter()
        out, _ = train(params, data, jax.random.PRNGKey(1), cfg.lr)
        float(jnp.sum(out.user_features))
        times.append(time.perf_counter() - t0)

    median = float(np.median(times))
    updates_per_sec = TIMED_EPOCHS * N_RATINGS / median
    best_ups = TIMED_EPOCHS * N_RATINGS / min(times)
    print(
        json.dumps(
            {
                "metric": "kernelmf_sgd_rating_updates_per_sec_per_chip",
                "value": round(updates_per_sec, 1),
                "unit": "updates/s",
                "vs_baseline": round(updates_per_sec / REFERENCE_UPDATES_PER_SEC, 2),
                "stat": f"median of {TRIALS} trials, {TIMED_EPOCHS}-epoch window",
                "best": round(best_ups, 1),
            }
        )
    )


def _dispatch() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=0, choices=range(0, 6),
                   help="0 = headline metric; 1..5 = BASELINE.json configs")
    p.add_argument("--scale", choices=["small", "full"], default="full")
    a = p.parse_args()
    if a.config == 0:
        main()
        return
    sys.path.insert(0, "benchmarks")
    import run_configs

    run_configs._persistent_cache()
    t0 = time.perf_counter()
    result = run_configs.CONFIGS[a.config](a.scale)
    result["scale"] = a.scale
    result["total_seconds"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(_dispatch())
