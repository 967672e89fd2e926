"""Characterize the table-size term in SGD row-op cost (VERDICT r4 #1).

The round-4 data: the k=100 headline at 10k x 20k tables runs ~9.7ns/row
while config 5 (k=64, 1M x 100k) runs ~21ns/row — bigger rows going
FASTER on smaller tables means the deficit is a table-size-dependent
scatter/gather locality term the shipped cost model
(benchmarks/RESULTS.md "Notes") does not include.  This bench isolates
it: the REAL trainer (``ops/segment_sgd.py``), fixed k/batch-size/
ratings-count, sweeping ONE table dimension at a time.

* sweep A: n_users 10k -> 1M at n_items=100k (order='user': the user
  side is primary — tile gather-expand + tile scatter);
* sweep B: n_items 20k -> 500k at n_users=100k (the item side is
  secondary — per-row gather + perm + tile scatter);
* ablations at the sweep-A extremes: freeze one side's update to
  attribute the penalty to the prim or sec half of the step.

Long-window protocol (bench.py lesson): each timed window chains
``WINDOW_CALLS`` invocations of a 5-epoch program; median of 3.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/micro_tableheight.py
"""

import json
import time

import numpy as np

N_RATINGS = 20_000_000
BS = 2_097_152
K = 64
EPOCHS = 5
WINDOW_CALLS = 2
TRIALS = 3


def _gen(n_users, n_items, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, N_RATINGS).astype(np.int32)
    i = rng.integers(0, n_items, N_RATINGS).astype(np.int32)
    r = np.round(rng.uniform(0.5, 5, N_RATINGS) * 2).astype(np.float32) / 2
    return u, i, r


def run_case(label, n_users, n_items, order="user", **cfg_kw):
    import jax
    import jax.numpy as jnp

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    u, i, r = _gen(n_users, n_items)
    cfg = SGDConfig(kernel="linear", n_factors=K, lr=0.002, reg=0.005,
                    batch_size=BS, compute_epoch_rmse=False, **cfg_kw)
    t0 = time.perf_counter()
    data = sgd.pack_ratings(u, i, r, BS, order=order,
                            row_width=cfg.padded_factors)
    t_pack = time.perf_counter() - t0
    train = sgd.jit_sgd_train(cfg, EPOCHS)
    params = sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg,
                             float(r.mean()))
    out, _ = train(params, data, jax.random.PRNGKey(1), cfg.lr)
    float(jnp.sum(out.user_features))  # compile + warm
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
    n_upd = EPOCHS * WINDOW_CALLS * N_RATINGS
    med = float(np.median(times))
    row = {
        "case": label, "n_users": n_users, "n_items": n_items,
        "order": order,
        "frozen": [s for s, on in (("user", cfg.update_user_params),
                                   ("item", cfg.update_item_params))
                   if not on],
        "agg_prim": list(data.agg_prim), "agg_sec": list(data.agg_sec),
        "expand_prim": data.expand_prim,
        "updates_per_sec": round(n_upd / med, 1),
        "ns_per_row": round(med / n_upd * 1e9, 2),
        "best_ns_per_row": round(min(times) / n_upd * 1e9, 2),
        "pack_seconds": round(t_pack, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    rows = []
    # sweep A: user-table height (primary side)
    for n_u in (10_000, 100_000, 300_000, 1_000_000):
        rows.append(run_case("sweepA_users", n_u, 100_000))
    # sweep B: item-table breadth (secondary side)
    for n_i in (20_000, 100_000, 500_000):
        rows.append(run_case("sweepB_items", 100_000, n_i))
    # ablations at the sweep-A extremes
    for n_u in (10_000, 1_000_000):
        rows.append(run_case("abl_prim_only", n_u, 100_000,
                             update_item_params=False))
        rows.append(run_case("abl_sec_only", n_u, 100_000,
                             update_user_params=False))
    with open("benchmarks/results/micro_tableheight_v5e.jsonl", "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
