"""2D block-pack prototype for the config-5 50M hunt (VERDICT r4 #1).

micro_tableheight2.py established the mechanism: the step's secondary
side (per-row gather + delta permutation) runs ~2.4x faster when the
per-batch (bs, Kp) arrays fit VMEM (bs=128k at Kp=128: 8.1ns/row vs
19ns at bs >= 512k) — but naive small batches at config-5 catalogs blow
up the secondary tile span (C ~ S * n_items / bs).  The fix prototyped
here: sort the shuffled stream by (user_block, item_block) CELLS sized
so a bs-row batch covers ~one cell, bounding BOTH sides' spans at any
batch size.  Batches cut sequentially across the cell-sorted stream
(no padding; a batch straddles at most 2 cells).

Cases: plain user-sort vs block pack at several (bs, W_u, W_i); fixed
3-epoch train-RMSE drift vs the plain pack is reported for the quality
budget.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/micro_blockpack.py [--scale full]
"""

import argparse
import json
import time

import numpy as np

EPOCHS = 5
WINDOW_CALLS = 2
TRIALS = 3


def gen(n_users, n_items, n_ratings, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, n_ratings).astype(np.int32)
    i = rng.integers(0, n_items, n_ratings).astype(np.int32)
    r = np.round(rng.uniform(0.5, 5, n_ratings) * 2).astype(np.float32) / 2
    return u, i, r


def pack(u, i, r, bs, mode, W_u=0, W_i=0, n_items=0, chunks=8, rw=128):
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    t0 = time.perf_counter()
    if mode == "block":
        data = sgd.pack_ratings(u, i, r, bs, order="block",
                                user_block=W_u or None,
                                item_block=W_i or None, row_width=rw)
    else:
        data = sgd.pack_ratings(u, i, r, bs, order="user",
                                item_sort_chunks=chunks, row_width=rw)
    return data, round(time.perf_counter() - t0, 1)


def run_case(label, n_users, n_items, n_ratings, k, bs, mode, W_u=0, W_i=0,
             chunks=8, drift_vs=None):
    import jax
    import jax.numpy as jnp

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    u, i, r = gen(n_users, n_items, n_ratings)
    cfg = SGDConfig(kernel="linear", n_factors=k, lr=0.002, reg=0.005,
                    batch_size=bs, compute_epoch_rmse=False)
    data, pack_s = pack(u, i, r, bs, mode, W_u, W_i, n_items, chunks,
                        cfg.padded_factors)
    train = sgd.jit_sgd_train(cfg, EPOCHS)

    def fresh():
        p = sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg,
                            float(r.mean()))
        float(jnp.sum(p.user_features))
        return p

    out, _ = train(fresh(), data, jax.random.PRNGKey(1), cfg.lr)
    float(jnp.sum(out.user_features))
    times = []
    for t in range(TRIALS):
        p = fresh()
        t0 = time.perf_counter()
        for c in range(WINDOW_CALLS):
            p, _ = train(p, data, jax.random.PRNGKey(1 + c), cfg.lr)
        float(jnp.sum(p.user_features))
        times.append(time.perf_counter() - t0)
    n_upd = EPOCHS * WINDOW_CALLS * n_ratings
    med = float(np.median(times))
    row = {
        "case": label, "mode": mode, "bs": bs, "W_u": W_u, "W_i": W_i,
        "chunks": chunks, "n_users": n_users, "n_items": n_items,
        "n_ratings": n_ratings,
        "agg_prim": list(data.agg_prim), "agg_sec": list(data.agg_sec),
        "updates_per_sec": round(n_upd / med, 1),
        "ns_per_row": round(med / n_upd * 1e9, 2),
        "pack_seconds": pack_s,
    }
    # fixed-epoch quality drift vs a reference pack (3-epoch train RMSE)
    if drift_vs is not None:
        qcfg = SGDConfig(kernel="linear", n_factors=k, lr=0.002, reg=0.005,
                         batch_size=bs, compute_epoch_rmse=True)
        qtrain = sgd.jit_sgd_train(qcfg, 3)
        _, h_new = qtrain(fresh(), data, jax.random.PRNGKey(2), cfg.lr)
        ref_data, _ = pack(u, i, r, drift_vs["bs"], "plain",
                           chunks=drift_vs.get("chunks", 8),
                           rw=cfg.padded_factors)
        rcfg = SGDConfig(kernel="linear", n_factors=k, lr=0.002, reg=0.005,
                         batch_size=drift_vs["bs"], compute_epoch_rmse=True)
        _, h_ref = sgd.jit_sgd_train(rcfg, 3)(fresh(), ref_data,
                                              jax.random.PRNGKey(2), cfg.lr)
        row["rmse_hist"] = [round(float(x), 5) for x in np.asarray(h_new)]
        row["rmse_hist_ref"] = [round(float(x), 5)
                                for x in np.asarray(h_ref)]
        row["rmse_drift"] = round(
            float(np.abs(np.asarray(h_new) - np.asarray(h_ref)).max()), 5)
    print(json.dumps(row), flush=True)
    return row


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    p = argparse.ArgumentParser()
    p.add_argument("--scale", choices=["proxy", "full"], default="proxy")
    a = p.parse_args()

    rows = []
    if a.scale == "proxy":
        # TRUE config-5 density (0.001) at a quarter of the user table:
        # the 20M/1M proxy of the first prototype was 5x sparser than
        # config 5 and made the cell geometry unrepresentative
        n_u, n_i, n_r, k = 250_000, 100_000, 25_000_000, 64
        rows.append(run_case("plain_c8", n_u, n_i, n_r, k,
                             2_097_152, "plain", chunks=8))
        rows.append(run_case("plain_c1", n_u, n_i, n_r, k,
                             2_097_152, "plain", chunks=1))
        # block packs: small batches, both spans bounded by cell geometry
        for bs, W_u, W_i in ((131_072, 0, 0),
                             (131_072, 16384, 8192),
                             (262_144, 0, 0),
                             (524_288, 0, 0)):
            rows.append(run_case("block", n_u, n_i, n_r, k, bs, "block",
                                 W_u=W_u, W_i=W_i,
                                 drift_vs={"bs": 2_097_152, "chunks": 8}))
    else:
        n_u, n_i, n_r, k = 1_000_000, 100_000, 100_000_000, 64
        rows.append(run_case("full_plain", n_u, n_i, n_r, k,
                             2_097_152, "plain", chunks=8))
        rows.append(run_case("full_block", n_u, n_i, n_r, k,
                             131_072, "block",
                             drift_vs={"bs": 2_097_152, "chunks": 8}))
    out = f"benchmarks/results/micro_blockpack_{a.scale}_v5e.jsonl"
    with open(out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
