"""BPR triplet-SGD throughput on the real chip.

Step-throughput bench (the extension has no reference counterpart to
baseline against): positives are generated ON DEVICE so the shared
tunnel's host->device bandwidth never enters the measurement, the first
call pays the compile, and the timed window is ``--epochs`` full epochs
(long-window protocol, same rationale as bench.py).  One JSON line per
(k, batch_size) combo:

    python benchmarks/bpr_bench.py --n 25000000 --factors 64 128 --bs 1048576
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops import bpr as bpr_ops
from matrix_factorization_tpu.ops import segment_sgd as sgd


def run_combo(n_users: int, n_items: int, n: int, k: int, bs: int,
              epochs: int, seed: int = 0) -> dict:
    cfg = SGDConfig(kernel="linear", n_factors=k, reg=0.002,
                    min_rating=0.0, max_rating=1.0)
    key = jax.random.PRNGKey(seed)
    ku, ki, kt = jax.random.split(key, 3)
    n_pad = sgd.round_up(n, bs)
    u = jax.random.randint(ku, (n_pad,), 0, n_users, jnp.int32)
    i = jax.random.randint(ki, (n_pad,), 0, n_items, jnp.int32)
    w = (jnp.arange(n_pad) < n).astype(jnp.float32)
    params = sgd.init_params(kt, n_users, n_items, cfg, 0.0, init_sd=0.05)

    fn = bpr_ops.jit_bpr_train(cfg, epochs, 0.05, n_items, bs, n)
    # compile + warm; a SCALAR FETCH is the completion barrier — on the
    # remote-dispatch backend block_until_ready returns before the
    # program runs, so every timed window must end in a fetch (same
    # protocol as bench.py)
    out = fn(params, u, i, w, jax.random.PRNGKey(1))
    float(np.asarray(out[1][-1]))
    t0 = time.perf_counter()
    out = fn(params, u, i, w, jax.random.PRNGKey(2))
    got = float(np.asarray(out[0].user_features[0, 0]) +
                np.asarray(out[1][-1]))
    dt = time.perf_counter() - t0
    assert np.isfinite(got)
    rate = n * epochs / dt
    return {
        "metric": "bpr_triplet_updates_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "triplets/s",
        "n_positives": n, "n_factors": k, "batch_size": bs,
        "epochs_timed": epochs, "seconds": round(dt, 3),
    }


def run_combo_tiled(n_users: int, n_items: int, n: int, k: int, bs: int,
                    epochs: int, seed: int = 0) -> dict:
    """Tile-aggregated trainer (fit's single-device default): the pack
    is host-side and ships over the tunnel, but only the training
    program is inside the timed window (same protocol as run_combo)."""
    cfg = SGDConfig(kernel="linear", n_factors=k, reg=0.002,
                    min_rating=0.0, max_rating=1.0)
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    data = sgd.pack_ratings(u, i, np.ones(n, np.float32), bs,
                            shuffle_seed=seed, order="user")
    params = sgd.init_params(jax.random.PRNGKey(seed), n_users, n_items,
                             cfg, 0.0, init_sd=0.05)
    fn = bpr_ops.jit_bpr_train_tiled(cfg, epochs, 0.05, n_items)
    out = fn(params, data, jax.random.PRNGKey(1))
    float(np.asarray(out[1][-1]))
    t0 = time.perf_counter()
    out = fn(params, data, jax.random.PRNGKey(2))
    got = float(np.asarray(out[0].user_features[0, 0]) +
                np.asarray(out[1][-1]))
    dt = time.perf_counter() - t0
    assert np.isfinite(got)
    return {
        "metric": "bpr_tiled_triplet_updates_per_sec_per_chip",
        "value": round(n * epochs / dt, 1),
        "unit": "triplets/s",
        "n_positives": n, "n_factors": k, "batch_size": bs,
        "epochs_timed": epochs, "seconds": round(dt, 3),
        "tiles_prim": list(data.agg_prim), "tiles_sec": list(data.agg_sec),
    }


def run_combo_dp_tiled(n_users: int, n_items: int, n: int, k: int, bs: int,
                       epochs: int, seed: int = 0,
                       psum_every="auto") -> dict:
    """Tiled dp trainer on a 1-device mesh: the psum degenerates to a
    copy, so this is the per-chip rate each chip carries into a real
    mesh (same rationale as benchmarks/dp_tiled_bench.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from matrix_factorization_tpu.parallel import distributed as dist
    from matrix_factorization_tpu.parallel.mesh import (
        data_axes_of, make_mesh,
    )

    cfg = SGDConfig(kernel="linear", n_factors=k, reg=0.002,
                    min_rating=0.0, max_rating=1.0)
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    mesh = make_mesh(n_data=1)
    ucap = sgd.round_up(n_users, 8)
    data = sgd.pack_ratings(u, i, np.ones(n, np.float32), bs,
                            shuffle_seed=seed, order="user",
                            row_width=cfg.padded_factors, n_dev=1,
                            users_per_dev=ucap)
    shard = NamedSharding(mesh, P(data_axes_of(mesh)))
    data = jax.tree.map(lambda a: jax.device_put(a, shard), data)
    params = sgd.init_params(jax.random.PRNGKey(seed), n_users, n_items,
                             cfg, 0.0, init_sd=0.05, user_capacity=ucap)
    params = dist.place_params(params, mesh)
    fn = bpr_ops.jit_dp_bpr_train_tiled(cfg, epochs, 0.05, n_items, mesh,
                                        psum_every=psum_every)
    out = fn(params, data, jax.random.PRNGKey(1))
    float(np.asarray(out[1][-1]))
    t0 = time.perf_counter()
    out = fn(params, data, jax.random.PRNGKey(2))
    got = float(np.asarray(out[0].user_features[0, 0]) +
                np.asarray(out[1][-1]))
    dt = time.perf_counter() - t0
    assert np.isfinite(got)
    return {
        "metric": "bpr_dp_tiled_triplet_updates_per_sec_per_chip",
        "value": round(n * epochs / dt, 1),
        "unit": "triplets/s",
        "n_positives": n, "n_factors": k, "batch_size": bs,
        "epochs_timed": epochs, "seconds": round(dt, 3),
        "psum_every": psum_every,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=162_541)   # ML-25M shape
    p.add_argument("--items", type=int, default=59_047)
    p.add_argument("--n", type=int, default=25_000_000)
    p.add_argument("--factors", type=int, nargs="+", default=[64])
    p.add_argument("--bs", type=int, nargs="+", default=[1 << 20])
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--mode", choices=["flat", "tiled", "dp", "both", "all"],
                   default="both")
    args = p.parse_args()
    for k in args.factors:
        for bs in args.bs:
            if args.mode in ("flat", "both", "all"):
                print(json.dumps(run_combo(args.users, args.items, args.n,
                                           k, bs, args.epochs)), flush=True)
            if args.mode in ("tiled", "both", "all"):
                print(json.dumps(run_combo_tiled(args.users, args.items,
                                                 args.n, k, bs,
                                                 args.epochs)), flush=True)
            if args.mode in ("dp", "all"):
                print(json.dumps(run_combo_dp_tiled(
                    args.users, args.items, args.n, k, bs, args.epochs)),
                    flush=True)


if __name__ == "__main__":
    main()
