"""bf16 one-hot A/B at the config-5 shape (the 50M hunt, continued).

On v5e XLA's default f32 matmul already feeds the MXU bf16 operands
(``benchmarks/ials_bf16.py``: explicit bf16 casts are bit-identical), so
casting the tile one-hots (exact 0/1) and their einsum partners to bf16
changes nothing numerically on TPU while halving their HBM stream.
This bench (a) CHECKS the bit-identity claim for the full SGD step on
the real chip, (b) measures the throughput delta at the config-5 shape
with the tuned chunks=1 layout.

OUTCOME (recorded in results/micro_c5_bf16oh_v5e.jsonl): bit-identical
as predicted, and throughput-NEUTRAL (49.18M vs 49.19M updates/s) —
XLA fuses the one-hot build into the consuming einsums, so there is no
materialized one-hot traffic to halve.  The library keeps plain f32
one-hots; this script patches the dtype locally for the A/B.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/micro_c5_bf16oh.py
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
    rows = []

    # -- (a) bit-identity of bf16 vs f32 one-hot operands on this chip --
    nu_s, ni_s, n_s = 50_000, 20_000, 2_000_000
    us = rng.integers(0, nu_s, n_s).astype(np.int32)
    is_ = rng.integers(0, ni_s, n_s).astype(np.int32)
    rs = np.round(rng.uniform(0.5, 5, n_s) * 2).astype(np.float32) / 2
    cfg_s = SGDConfig(kernel="linear", n_factors=K, lr=0.002, reg=0.005,
                      batch_size=131_072, compute_epoch_rmse=False)
    data_s = sgd.pack_ratings(us, is_, rs, cfg_s.batch_size, order="user",
                              item_sort_chunks=1,
                              row_width=cfg_s.padded_factors)
    outs = {}
    orig_onehot = sgd._tile_onehot

    def set_dtype(dt):
        def patched(ids_sorted, tile_base, S, C):
            return orig_onehot(ids_sorted, tile_base, S, C).astype(dt)
        sgd._tile_onehot = patched

    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        set_dtype(dt)
        sgd._train_cache.clear()
        p = sgd.init_params(jax.random.PRNGKey(0), nu_s, ni_s, cfg_s,
                            float(rs.mean()))
        p, _ = sgd.jit_sgd_train(cfg_s, 2)(p, data_s, jax.random.PRNGKey(1),
                                           cfg_s.lr)
        outs[dt_name] = (np.asarray(p.user_features),
                         np.asarray(p.item_features))
    du = np.abs(outs["f32"][0] - outs["bf16"][0]).max()
    di = np.abs(outs["f32"][1] - outs["bf16"][1]).max()
    rows.append({"check": "bit_identity_2epoch",
                 "max_abs_diff_user": float(du),
                 "max_abs_diff_item": float(di),
                 "bit_identical": bool(du == 0.0 and di == 0.0)})
    print(json.dumps(rows[-1]), flush=True)

    # -- (b) throughput A/B at the config-5 shape, tuned layout ---------
    u = rng.integers(0, N_U, N_R).astype(np.int32)
    i = rng.integers(0, N_I, N_R).astype(np.int32)
    r = np.round(rng.uniform(0.5, 5, N_R) * 2).astype(np.float32) / 2
    cfg = SGDConfig(kernel="linear", n_factors=K, lr=0.002, reg=0.005,
                    batch_size=2_097_152, compute_epoch_rmse=False)
    data = sgd.pack_ratings(u, i, r, cfg.batch_size, order="user",
                            item_sort_chunks=1,
                            row_width=cfg.padded_factors)
    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        set_dtype(dt)
        sgd._train_cache.clear()
        train = sgd.jit_sgd_train(cfg, EPOCHS)

        def fresh():
            p = sgd.init_params(jax.random.PRNGKey(0), N_U, N_I, cfg,
                                float(r.mean()))
            float(jnp.sum(p.user_features))
            return p

        out, _ = train(fresh(), data, jax.random.PRNGKey(1), cfg.lr)
        float(jnp.sum(out.user_features))
        times = []
        for t in range(TRIALS):
            p = fresh()
            t0 = time.perf_counter()
            p, _ = train(p, data, jax.random.PRNGKey(1 + t), cfg.lr)
            float(jnp.sum(p.user_features))
            times.append(time.perf_counter() - t0)
        n_upd = EPOCHS * N_R
        med = float(np.median(times))
        rows.append({"onehot_dtype": dt_name, "chunks": 1,
                     "bs": cfg.batch_size,
                     "agg_prim": list(data.agg_prim),
                     "agg_sec": list(data.agg_sec),
                     "updates_per_sec": round(n_upd / med, 1),
                     "updates_per_sec_best": round(n_upd / min(times), 1),
                     "ns_per_row": round(med / n_upd * 1e9, 2),
                     "trials": TRIALS})
        print(json.dumps(rows[-1]), flush=True)

    with open("benchmarks/results/micro_c5_bf16oh_v5e.jsonl", "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
