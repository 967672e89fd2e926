"""Round-2 characterization for the config-5 50M hunt (VERDICT r4 #1).

micro_tableheight.py round 1 found TWO terms, not one:
  (a) the prim tile span C grows when ratings-per-user-per-chunk drops
      (C=288 at 1M users / 20M ratings): +7ns/row prim-side, +12ns
      sec-side at C=288 vs C=32;
  (b) even at C=32 everywhere, config-5-shaped runs measure ~20ns/row
      while the bench.py headline measures ~9.7 — a bs- or shape-
      dependent term the span does not explain.

This bench isolates them:
  * sweep BS at the tiny headline tables (10k x 20k — spans stay C=32
    at every bs, so the bs term is pure);
  * sweep item_sort_chunks at 1M users (fewer chunks = more ratings
    per user per chunk = tighter spans; quantify the C lever);
  * headline-exact sanity row to calibrate against the known 9.7ns.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/micro_tableheight2.py
"""

import json
import time

import numpy as np

EPOCHS = 5
WINDOW_CALLS = 2
TRIALS = 3


def _gen(n_users, n_items, n_ratings, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, n_ratings).astype(np.int32)
    i = rng.integers(0, n_items, n_ratings).astype(np.int32)
    r = np.round(rng.uniform(0.5, 5, n_ratings) * 2).astype(np.float32) / 2
    return u, i, r


def run_case(label, n_users, n_items, n_ratings, k, bs, order="auto",
             chunks=8, epochs=EPOCHS):
    import jax
    import jax.numpy as jnp

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    u, i, r = _gen(n_users, n_items, n_ratings)
    cfg = SGDConfig(kernel="linear", n_factors=k, lr=0.002, reg=0.005,
                    batch_size=bs, compute_epoch_rmse=False)
    data = sgd.pack_ratings(u, i, r, bs, order=order,
                            item_sort_chunks=chunks,
                            row_width=cfg.padded_factors)
    train = sgd.jit_sgd_train(cfg, epochs)
    params = sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg,
                             float(r.mean()))
    out, _ = train(params, data, jax.random.PRNGKey(1), cfg.lr)
    float(jnp.sum(out.user_features))
    times = []
    for t in range(TRIALS):
        p = sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg,
                            float(r.mean()))
        float(jnp.sum(p.user_features))
        t0 = time.perf_counter()
        for c in range(WINDOW_CALLS):
            p, _ = train(p, data, jax.random.PRNGKey(1 + c), cfg.lr)
        float(jnp.sum(p.user_features))
        times.append(time.perf_counter() - t0)
    n_upd = epochs * WINDOW_CALLS * n_ratings
    med = float(np.median(times))
    row = {
        "case": label, "n_users": n_users, "n_items": n_items,
        "n_ratings": n_ratings, "k": k, "bs": bs, "chunks": chunks,
        "primary": data.primary,
        "agg_prim": list(data.agg_prim), "agg_sec": list(data.agg_sec),
        "updates_per_sec": round(n_upd / med, 1),
        "ns_per_row": round(med / n_upd * 1e9, 2),
        "best_ns_per_row": round(min(times) / n_upd * 1e9, 2),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    rows = []
    # headline-exact sanity (expect ~9.7ns)
    rows.append(run_case("headline_exact", 10_000, 20_000, 2_000_000, 100,
                         131_072, epochs=20))
    # bs sweep at tiny tables, 20M ratings (spans C=32 throughout)
    for bs in (131_072, 524_288, 2_097_152):
        rows.append(run_case("sweep_bs_tiny_tables", 10_000, 20_000,
                             20_000_000, 100, bs))
    # chunk sweep at 1M users (the C lever)
    for chunks in (8, 4, 2, 1):
        rows.append(run_case("sweep_chunks_1m_users", 1_000_000, 100_000,
                             20_000_000, 64, 2_097_152, order="user",
                             chunks=chunks))
    with open("benchmarks/results/micro_tableheight2_v5e.jsonl", "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
