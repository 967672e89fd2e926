"""NMF multiplicative-update throughput on the real chip.

Step-throughput bench (the extension has no reference counterpart —
the reference's five models are all explicit/similarity based).  Each
alternating epoch is TWO read-only segment-sum passes over the rating
stream (user pass against pre-epoch Q, item pass against fresh P) plus
two elementwise table updates; the reported rate is rating-visits per
second counting BOTH passes (2 * nnz per epoch), so it is directly
comparable to the row-op cost model, and the per-epoch "updates/s" rate
(nnz * epochs / dt) is also recorded for comparison with the SGD
trainers.  Only the training program is inside the timed window; the
first call pays the compile (long-window protocol, same rationale as
bench.py).  One JSON line per (k, batch_size) combo:

    python benchmarks/nmf_bench.py --n 25000000 --factors 64 128 --bs 1048576
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops import nmf as nmf_ops
from matrix_factorization_tpu.ops import segment_sgd as sgd


def run_combo(n_users: int, n_items: int, n: int, k: int, bs: int,
              epochs: int, rmse: bool, seed: int = 0) -> dict:
    cfg = SGDConfig(kernel="linear", n_factors=k, reg=0.05,
                    min_rating=0.0, max_rating=5.0, batch_size=bs,
                    compute_epoch_rmse=rmse)
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(0.5, 5.0, n).astype(np.float32)
    data = sgd.pack_ratings(u, i, r, bs, order="auto",
                            row_width=2 * cfg.n_factors)
    # table row capacities (init_nmf_params' rounding), no device work
    cnt_u = np.bincount(u, minlength=sgd.round_up(n_users, 8))
    cnt_i = np.bincount(i, minlength=sgd.round_up(n_items, 8))
    import jax.numpy as jnp
    cnt_u = jnp.asarray(cnt_u.astype(np.float32))
    cnt_i = jnp.asarray(cnt_i.astype(np.float32))

    fn = nmf_ops.jit_nmf_train(cfg, epochs, 0.05, 0.05)
    # compile + warm; a SCALAR FETCH is the completion barrier — on the
    # remote-dispatch backend block_until_ready returns before the
    # program runs, so every timed window must end in a fetch (same
    # protocol as bench.py).  jit_nmf_train donates params, so re-init
    # fresh params per call.
    p0 = nmf_ops.init_nmf_params(jax.random.PRNGKey(seed), n_users,
                                 n_items, cfg)
    out = fn(p0, data, cnt_u, cnt_i)
    float(np.asarray(out[0].user_features[0, 0]))
    p1 = nmf_ops.init_nmf_params(jax.random.PRNGKey(seed + 1), n_users,
                                 n_items, cfg)
    t0 = time.perf_counter()
    out = fn(p1, data, cnt_u, cnt_i)
    got = float(np.asarray(out[0].user_features[0, 0]))
    dt = time.perf_counter() - t0
    assert np.isfinite(got)
    return {
        "metric": "nmf_rating_visits_per_sec_per_chip",
        "value": round(2 * n * epochs / dt, 1),
        "unit": "rating-visits/s",
        "updates_per_sec": round(n * epochs / dt, 1),
        "n_ratings": n, "n_factors": k, "batch_size": bs,
        "epochs_timed": epochs, "seconds": round(dt, 3),
        "epoch_rmse_pass": rmse,
        "tiles_prim": list(data.agg_prim), "tiles_sec": list(data.agg_sec),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=162_541)   # ML-25M shape
    p.add_argument("--items", type=int, default=59_047)
    p.add_argument("--n", type=int, default=25_000_000)
    p.add_argument("--factors", type=int, nargs="+", default=[64])
    p.add_argument("--bs", type=int, nargs="+", default=[1 << 20])
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--rmse", action="store_true",
                   help="include the per-epoch RMSE pass in the window")
    args = p.parse_args()
    for k in args.factors:
        for bs in args.bs:
            print(json.dumps(run_combo(args.users, args.items, args.n,
                                       k, bs, args.epochs, args.rmse)),
                  flush=True)


if __name__ == "__main__":
    main()
