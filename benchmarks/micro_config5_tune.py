"""Config-5 layout tuning at the FULL shape (1M x 100k, 100M ratings).

The characterization chain (micro_tableheight*.py, micro_blockpack.py)
ended here: the VMEM small-batch regime is table-residency (gone at
512MB tables), the 2D block pack matches plain layouts at equal tile
spans but pays ~12% pad overhead — the remaining lever is the chunk
count, which sets the prim tile span C via ratings-per-user-per-chunk
(proxy: chunks=1 is +5.2% over chunks=8).  This bench picks the
shipping config-5 layout: chunk sweep at bs=2M/4M, with a fixed-epoch
RMSE drift row for the winner's visit-order deviation (fewer chunks =
fewer, longer per-user bursts per epoch).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/micro_config5_tune.py
"""

import json
import time

import numpy as np

N_U, N_I, N_R, K = 1_000_000, 100_000, 100_000_000, 64
EPOCHS = 5
TRIALS = 3


def gen():
    rng = np.random.default_rng(0)
    u = rng.integers(0, N_U, N_R).astype(np.int32)
    i = rng.integers(0, N_I, N_R).astype(np.int32)
    r = np.round(rng.uniform(0.5, 5, N_R) * 2).astype(np.float32) / 2
    return u, i, r


def run_case(u, i, r, bs, chunks, drift=False):
    import jax
    import jax.numpy as jnp

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    cfg = SGDConfig(kernel="linear", n_factors=K, lr=0.002, reg=0.005,
                    batch_size=bs, compute_epoch_rmse=False)
    t0 = time.perf_counter()
    data = sgd.pack_ratings(u, i, r, bs, order="user",
                            item_sort_chunks=chunks,
                            row_width=cfg.padded_factors)
    pack_s = round(time.perf_counter() - t0, 1)
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
    row = {
        "bs": bs, "chunks": chunks,
        "agg_prim": list(data.agg_prim), "agg_sec": list(data.agg_sec),
        "updates_per_sec": round(n_upd / med, 1),
        "updates_per_sec_best": round(n_upd / min(times), 1),
        "ns_per_row": round(med / n_upd * 1e9, 2),
        "pack_seconds": pack_s, "trials": TRIALS,
    }
    if drift:
        qcfg = SGDConfig(kernel="linear", n_factors=K, lr=0.002, reg=0.005,
                         batch_size=bs, compute_epoch_rmse=True)
        _, h = sgd.jit_sgd_train(qcfg, 3)(fresh(), data,
                                          jax.random.PRNGKey(2), cfg.lr)
        row["rmse_hist_3ep"] = [round(float(x), 5) for x in np.asarray(h)]
    print(json.dumps(row), flush=True)
    return row


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    u, i, r = gen()
    rows = []
    for bs, chunks, drift in ((2_097_152, 8, True), (2_097_152, 2, True),
                              (2_097_152, 1, True), (4_194_304, 2, False)):
        rows.append(run_case(u, i, r, bs, chunks, drift))
    with open("benchmarks/results/micro_config5_tune_v5e.jsonl", "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
