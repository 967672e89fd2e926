"""SVD++ training throughput on the real chip.

Extension bench (no reference counterpart): positives, neighbor weights
and item degrees are generated/derived ON DEVICE so the shared tunnel
never enters the measurement; first call pays the compile; the timed
window is ``--epochs`` full epochs ending in a scalar fetch (the
completion barrier on the remote-dispatch backend — same protocol as
bench.py).  One JSON line per (k, batch_size):

    python benchmarks/svdpp_bench.py --n 25000000 --factors 64 --bs 1048576
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops import segment_sgd as sgd
from matrix_factorization_tpu.ops import svdpp as svdpp_ops


def _host_data(n_users: int, n_items: int, n: int, seed: int):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = (0.5 * rng.integers(1, 11, n)).astype(np.float32)
    return u, i, r


def run_tile_combo(n_users: int, n_items: int, n: int, k: int, bs: int,
                   epochs: int, seed: int = 0) -> dict:
    """Tile-aggregated trainer (ops/svdpp.py::svdpp_train_batched):
    user-primary pack so P/S/A share one tile one-hot per batch and the
    Q deltas ride the secondary tiles.  Data is packed on host (the
    production path) and shipped once before the timed window."""
    cfg = SGDConfig(kernel="linear", n_factors=k, lr=0.005, reg=0.02,
                    min_rating=0.5, max_rating=5.0, shuffle="batch")
    u, i, r = _host_data(n_users, n_items, n, seed)
    data = sgd.pack_ratings(u, i, r, bs, shuffle_seed=seed, order="user",
                            row_width=cfg.padded_factors)
    params = svdpp_ops.init_params(jax.random.PRNGKey(seed), n_users,
                                   n_items, cfg, float(r.mean()),
                                   init_sd=0.05)
    wvec = svdpp_ops._neighbor_weights(u, n_users,
                                       params.user_features.shape[0])
    deg = np.zeros(params.item_features.shape[0], np.float32)
    deg[:n_items] = np.bincount(i, minlength=n_items)
    fn = svdpp_ops.jit_svdpp_train_batched(cfg, epochs, cfg.lr, cfg.reg)
    wvec_d, deg_d = jnp.asarray(wvec), jnp.asarray(deg)
    out, hist = fn(params, data, wvec_d, deg_d, jax.random.PRNGKey(1))
    float(np.asarray(hist[-1]))  # compile + warm barrier (+ data transfer)
    t0 = time.perf_counter()
    out, hist = fn(params, data, wvec_d, deg_d, jax.random.PRNGKey(2))
    got = float(np.asarray(hist[-1]))
    dt = time.perf_counter() - t0
    assert np.isfinite(got)
    return {
        "metric": "svdpp_tile_rating_updates_per_sec_per_chip",
        "value": round(n * epochs / dt, 1),
        "unit": "updates/s",
        "n_ratings": n, "n_factors": k, "batch_size": bs,
        "epochs_timed": epochs, "seconds": round(dt, 3),
    }


def run_combo(n_users: int, n_items: int, n: int, k: int, bs: int,
              epochs: int, seed: int = 0) -> dict:
    cfg = SGDConfig(kernel="linear", n_factors=k, lr=0.005, reg=0.02,
                    min_rating=0.5, max_rating=5.0)
    n_pad = sgd.round_up(n, bs)
    params = svdpp_ops.init_params(jax.random.PRNGKey(seed), n_users,
                                   n_items, cfg, 3.5, init_sd=0.05)
    ucap = params.user_features.shape[0]
    icap = params.item_features.shape[0]

    @jax.jit
    def make_data(key):
        ku, ki, kr = jax.random.split(key, 3)
        u = jax.random.randint(ku, (n_pad,), 0, n_users, jnp.int32)
        i = jax.random.randint(ki, (n_pad,), 0, n_items, jnp.int32)
        r = 0.5 * jax.random.randint(kr, (n_pad,), 1, 11, jnp.int32
                                     ).astype(jnp.float32)
        w = (jnp.arange(n_pad) < n).astype(jnp.float32)
        cnt = jnp.zeros(ucap, jnp.float32).at[u].add(w)
        wvec = jnp.where(cnt > 0, jax.lax.rsqrt(jnp.maximum(cnt, 1.0)), 0.0)
        deg = jnp.zeros(icap, jnp.float32).at[i].add(w)
        return u, i, r, w, wvec, deg

    u, i, r, w, wvec, deg = make_data(jax.random.PRNGKey(seed + 1))
    fn = svdpp_ops.jit_svdpp_train(cfg, epochs, cfg.lr, cfg.reg, bs, n, n_pad)
    out, hist = fn(params, u, i, r, w, wvec, deg, jax.random.PRNGKey(1))
    float(np.asarray(hist[-1]))  # compile + warm barrier
    t0 = time.perf_counter()
    out, hist = fn(params, u, i, r, w, wvec, deg, jax.random.PRNGKey(2))
    got = float(np.asarray(hist[-1]))
    dt = time.perf_counter() - t0
    assert np.isfinite(got)
    return {
        "metric": "svdpp_rating_updates_per_sec_per_chip",
        "value": round(n * epochs / dt, 1),
        "unit": "updates/s",
        "n_ratings": n, "n_factors": k, "batch_size": bs,
        "epochs_timed": epochs, "seconds": round(dt, 3),
    }


def run_dp_tile_combo(n_users: int, n_items: int, n: int, k: int, bs: int,
                      epochs: int, seed: int = 0,
                      psum_every="auto") -> dict:
    """Tiled dp trainer on a 1-device mesh: the per-chip rate each chip
    carries into a real mesh (same rationale as dp_tiled_bench.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from matrix_factorization_tpu.parallel import distributed as dist
    from matrix_factorization_tpu.parallel.mesh import (
        data_axes_of, make_mesh,
    )

    cfg = SGDConfig(kernel="linear", n_factors=k, lr=0.005, reg=0.02,
                    min_rating=0.5, max_rating=5.0, shuffle="batch")
    u, i, r = _host_data(n_users, n_items, n, seed)
    mesh = make_mesh(n_data=1)
    ucap = sgd.round_up(n_users, 8)
    data = sgd.pack_ratings(u, i, r, bs, shuffle_seed=seed, order="user",
                            row_width=cfg.padded_factors, n_dev=1,
                            users_per_dev=ucap)
    shard = NamedSharding(mesh, P(data_axes_of(mesh)))
    rep = NamedSharding(mesh, P())
    data = jax.tree.map(lambda a: jax.device_put(a, shard), data)
    params = svdpp_ops.init_params(jax.random.PRNGKey(seed), n_users,
                                   n_items, cfg, float(r.mean()),
                                   init_sd=0.05, user_capacity=ucap)
    params = svdpp_ops.SVDppParams(
        user_features=jax.device_put(params.user_features, shard),
        item_features=jax.device_put(params.item_features, rep),
        implicit_features=jax.device_put(params.implicit_features, rep),
        user_implicit_sums=jax.device_put(params.user_implicit_sums, shard),
        global_mean=jax.device_put(params.global_mean, rep),
    )
    wvec = svdpp_ops._neighbor_weights(u, n_users, ucap)
    deg = np.zeros(params.item_features.shape[0], np.float32)
    deg[:n_items] = np.bincount(i, minlength=n_items)
    fn = svdpp_ops.jit_dp_svdpp_train_batched(cfg, epochs, cfg.lr, cfg.reg,
                                              mesh, psum_every=psum_every)
    wvec_d = jax.device_put(jnp.asarray(wvec), shard)
    deg_d = jax.device_put(jnp.asarray(deg), rep)
    out, hist = fn(params, data, wvec_d, deg_d, jax.random.PRNGKey(1))
    float(np.asarray(hist[-1]))  # compile + warm barrier
    t0 = time.perf_counter()
    out, hist = fn(params, data, wvec_d, deg_d, jax.random.PRNGKey(2))
    got = float(np.asarray(hist[-1]))
    dt = time.perf_counter() - t0
    assert np.isfinite(got)
    return {
        "metric": "svdpp_dp_tile_rating_updates_per_sec_per_chip",
        "value": round(n * epochs / dt, 1),
        "unit": "updates/s",
        "n_ratings": n, "n_factors": k, "batch_size": bs,
        "epochs_timed": epochs, "seconds": round(dt, 3),
        "psum_every": psum_every,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=162_000)   # ML-25M shape
    p.add_argument("--items", type=int, default=59_392)
    p.add_argument("--n", type=int, default=25_000_000)
    p.add_argument("--factors", type=int, nargs="+", default=[64])
    p.add_argument("--bs", type=int, nargs="+", default=[1 << 20])
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--trainer", choices=["flat", "tile", "dp", "both",
                                         "all"],
                   default="flat")
    args = p.parse_args()
    for k in args.factors:
        for bs in args.bs:
            if args.trainer in ("flat", "both", "all"):
                print(json.dumps(run_combo(args.users, args.items, args.n,
                                           k, bs, args.epochs)), flush=True)
            if args.trainer in ("tile", "both", "all"):
                print(json.dumps(run_tile_combo(args.users, args.items,
                                                args.n, k, bs, args.epochs)),
                      flush=True)
            if args.trainer in ("dp", "all"):
                print(json.dumps(run_dp_tile_combo(
                    args.users, args.items, args.n, k, bs, args.epochs)),
                    flush=True)


if __name__ == "__main__":
    main()
