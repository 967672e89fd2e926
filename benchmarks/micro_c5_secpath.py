"""Secondary-side path A/B at the config-5 shape: perm + tile scatter
vs plain per-row scatter (the last unmeasured term of the 50M hunt).

The tile cost model (``segment_sgd._tile_meta``) charges the secondary
side's einsum and block scatter but NOT the (bs, Kp) delta permutation
that feeds it — at Kp=128 the measured plain scatter (~6ns/row) may be
competitive with perm (~4-7ns) + tile ops.  This bench runs the REAL
trainer at the config-5 shape with (a) the shipped sec tile path and
(b) sec tiles stripped from the pack (plain ``.at[i].add``), tuned
chunks=1 layout both.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/micro_c5_secpath.py
"""

import json
import time

import numpy as np

N_U, N_I, N_R, K = 1_000_000, 100_000, 100_000_000, 64
EPOCHS = 5
TRIALS = 3


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    rng = np.random.default_rng(0)
    u = rng.integers(0, N_U, N_R).astype(np.int32)
    i = rng.integers(0, N_I, N_R).astype(np.int32)
    r = np.round(rng.uniform(0.5, 5, N_R) * 2).astype(np.float32) / 2
    cfg = SGDConfig(kernel="linear", n_factors=K, lr=0.002, reg=0.005,
                    batch_size=2_097_152, compute_epoch_rmse=False)
    data = sgd.pack_ratings(u, i, r, cfg.batch_size, order="user",
                            item_sort_chunks=1,
                            row_width=cfg.padded_factors)
    nosec = data.replace(sec_ids_sorted=None, sec_perm=None,
                         sec_tile_base=None, agg_sec=(0, 0))

    rows = []
    for name, d in (("sec_tiles", data), ("sec_plain", nosec)):
        train = sgd.jit_sgd_train(cfg, EPOCHS)

        def fresh():
            p = sgd.init_params(jax.random.PRNGKey(0), N_U, N_I, cfg,
                                float(r.mean()))
            float(jnp.sum(p.user_features))
            return p

        out, _ = train(fresh(), d, jax.random.PRNGKey(1), cfg.lr)
        float(jnp.sum(out.user_features))
        times = []
        for t in range(TRIALS):
            p = fresh()
            t0 = time.perf_counter()
            p, _ = train(p, d, jax.random.PRNGKey(1 + t), cfg.lr)
            float(jnp.sum(p.user_features))
            times.append(time.perf_counter() - t0)
        n_upd = EPOCHS * N_R
        med = float(np.median(times))
        rows.append({"sec_path": name,
                     "agg_prim": list(d.agg_prim),
                     "agg_sec": list(d.agg_sec),
                     "updates_per_sec": round(n_upd / med, 1),
                     "updates_per_sec_best": round(n_upd / min(times), 1),
                     "ns_per_row": round(med / n_upd * 1e9, 2),
                     "trials": TRIALS})
        print(json.dumps(rows[-1]), flush=True)

    with open("benchmarks/results/micro_c5_secpath_v5e.jsonl", "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
