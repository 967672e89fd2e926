"""Config-3 multi-step batching study (VERDICT r2 #4).

The round-2 batch sweep stopped at bs=1M with throughput still rising
(28.8/26.3/31.9/34.0M at 128k/256k/512k/1M).  A batch of T x 1M IS the
VERDICT's "multi-step batching with stale reads inside T": T
micro-batches whose gradients all read the pre-step table state,
applied as one summed update — fewer scatter/gather row-ops per rating
and tighter tile spans (span ~ S x n_ids / bs).

This script measures, on the real chip at the ML-25M k=200 shape:
* throughput at bs in {1M, 2M, 4M} for sigmoid and rbf (median of 3);
* the parity cost: fixed-epoch train RMSE at each bs vs the bs=128k
  near-sequential reference trajectory (the PARITY.md-style study — the
  summed update changes the optimization path; the question is whether
  the destination moves).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/config3_multistep.py
(compiles cost minutes each on this image: warm the persistent cache
first with parallel ``--compile-only --shard i/n`` processes, then run
the measurement pass serially — all cache hits.)
"""

import argparse
import json
import time

import numpy as np

N_U, N_I, N_R = 162_000, 59_392, 25_000_000
EPOCHS = 3
TRIALS = 3

COMBOS = [(kernel, lr, bs)
          for kernel, lr in (("sigmoid", 0.01), ("rbf", 0.05))
          for bs in (131_072, 1_048_576, 2_097_152, 4_194_304)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--compile-only", action="store_true")
    p.add_argument("--shard", default="0/1")
    a = p.parse_args()
    si, sn = (int(x) for x in a.shard.split("/"))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    rng = np.random.default_rng(0)
    flat = np.unique(rng.integers(0, N_U * N_I, int(N_R * 1.15),
                                  dtype=np.int64))[:N_R]
    rng.shuffle(flat)
    u = (flat // N_I).astype(np.int32)
    i = (flat % N_I).astype(np.int32)
    r = (rng.integers(1, 11, len(u)) / 2).astype(np.float32)

    ref_rmse: dict = {}
    for idx, (kernel, lr, bs) in enumerate(COMBOS):
        if idx % sn != si:
            continue
        cfg = SGDConfig(kernel=kernel, n_factors=200, lr=lr, reg=0.005,
                        gamma=1 / 200, min_rating=0.5, max_rating=5.0,
                        batch_size=bs, compute_epoch_rmse=True)
        try:
            data = sgd.pack_ratings(u, i, r, bs, order="auto",
                                    row_width=cfg.padded_factors)
            train = sgd.jit_sgd_train(cfg, EPOCHS)
            params = sgd.init_params(jax.random.PRNGKey(0), N_U, N_I,
                                     cfg, float(r.mean()))
            out, hist = train(params, data, jax.random.PRNGKey(1), lr)
            rmse = float(np.asarray(hist)[-1])
            if bs == 131_072:
                ref_rmse[kernel] = rmse
                # reference trajectory point only — skip the timing
                print(json.dumps({
                    "kernel": kernel, "batch_size": bs,
                    "train_rmse_3ep": round(rmse, 5),
                    "role": "parity reference"}), flush=True)
                continue
            # timing without per-epoch RMSE (the headline protocol)
            tcfg = SGDConfig(kernel=kernel, n_factors=200, lr=lr,
                             reg=0.005, gamma=1 / 200, min_rating=0.5,
                             max_rating=5.0, batch_size=bs,
                             compute_epoch_rmse=False)
            ttrain = sgd.jit_sgd_train(tcfg, EPOCHS)
            p0 = sgd.init_params(jax.random.PRNGKey(0), N_U, N_I, tcfg,
                                 float(r.mean()))
            o, _ = ttrain(p0, data, jax.random.PRNGKey(1), lr)
            float(jnp.sum(o.user_features))
            if a.compile_only:
                print(json.dumps({"combo": idx, "kernel": kernel,
                                  "batch_size": bs, "compiled": True}),
                      flush=True)
                del data
                continue
            times = []
            for _ in range(TRIALS):
                p0 = sgd.init_params(jax.random.PRNGKey(0), N_U, N_I,
                                     tcfg, float(r.mean()))
                float(jnp.sum(p0.user_features))
                t0 = time.perf_counter()
                o, _ = ttrain(p0, data, jax.random.PRNGKey(1), lr)
                float(jnp.sum(o.user_features))
                times.append(time.perf_counter() - t0)
            ups = EPOCHS * N_R / float(np.median(times))
            row = {
                "kernel": kernel, "batch_size": bs,
                "updates_per_sec": round(ups, 1),
                "updates_per_sec_best": round(EPOCHS * N_R / min(times), 1),
                "trials": TRIALS,
                "train_rmse_3ep": round(rmse, 5),
            }
            if kernel in ref_rmse:
                row["rmse_drift_vs_128k"] = round(
                    abs(rmse - ref_rmse[kernel]), 5)
            print(json.dumps(row), flush=True)
            del data
        except Exception as e:  # OOM at 4M is a legitimate result
            print(json.dumps({
                "kernel": kernel, "batch_size": bs,
                "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                flush=True)


if __name__ == "__main__":
    main()
