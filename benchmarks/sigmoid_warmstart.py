"""ALS/SGD hybrid schedule for the sigmoid kernel at config-3 shape.

VERDICT r2 #4 named two algorithmic angles for k=200; multi-step
batching shipped +4.6% (benchmarks/config3_multistep.py).  This is the
other one: KernelMF(als_warm_start=N) fits the sigmoid pre-activation
in logit space with N exact linear ALS sweeps, then runs sigmoid SGD
from that init (models/kernel_mf.py::_run_als_warm_start).

Protocol mirrors benchmarks/ials_vs_sgd.py: synthetic sigmoid-linked
rank-16 signal at 25M ratings (162k x 59k), 500k held-out pairs scored
after every epoch, cumulative wall-clock includes all prep.  Curves:
pure sigmoid SGD (20 epochs) vs 1-sweep warm start + SGD (8 epochs).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/sigmoid_warmstart.py
"""

import json
import time

import numpy as np

N_U, N_I, N_R = 162_000, 59_392, 25_000_000
N_VAL = 500_000
RANK = 16
K = 200
SGD_BS = 2_097_152  # the shipped config-3 sigmoid batch
LR = 0.01
REG = 0.005


def gen_data(seed=0, n_u=N_U, n_i=N_I, n_r=N_R, n_val=N_VAL):
    rng = np.random.default_rng(seed)
    flat = np.unique(rng.integers(0, n_u * n_i, int(n_r * 1.15),
                                  dtype=np.int64))[:n_r]
    n_r = len(flat)
    rng.shuffle(flat)
    u = (flat // n_i).astype(np.int32)
    i = (flat % n_i).astype(np.int32)
    bu = rng.normal(0, 0.5, n_u).astype(np.float32)
    bi = rng.normal(0, 0.5, n_i).astype(np.float32)
    P = rng.normal(0, 0.7 / np.sqrt(RANK), (n_u, RANK)).astype(np.float32)
    Q = rng.normal(0, 0.7 / np.sqrt(RANK), (n_i, RANK)).astype(np.float32)
    r = np.empty(n_r, np.float32)
    for s in range(0, n_r, 5_000_000):
        e = min(s + 5_000_000, n_r)
        x = bu[u[s:e]] + bi[i[s:e]] + np.einsum(
            "nf,nf->n", P[u[s:e]], Q[i[s:e]])
        r[s:e] = 0.5 + 4.5 / (1.0 + np.exp(-x))
    r += rng.normal(0, 0.3, n_r).astype(np.float32)
    np.clip(r, 0.5, 5.0, out=r)
    return (u[n_val:], i[n_val:], r[n_val:],
            u[:n_val], i[:n_val], r[:n_val])


def time_to_quality(n_u=N_U, n_i=N_I, n_r=N_R, n_val=N_VAL,
                    sgd_epochs=20, warm_epochs=8, bs=SGD_BS,
                    k=K) -> dict:
    """Compact time-to-quality scoreboard for the k=200 sigmoid config
    (VERDICT r3 #4): pure SGD vs the shipped per-obs warm-start hybrid
    on a sigmoid-linked low-rank signal, val RMSE after every epoch,
    cumulative wall-clock including prep.  Returns one JSON-able dict
    with each curve's floor, the time to reach it, and the hybrid's
    time to the PURE-SGD floor (the headline: quality parity, less
    wall-clock).  The full epoch-by-epoch study with three curves is
    ``main()`` below / benchmarks/results/sigmoid_warmstart*.jsonl."""
    import jax
    import jax.numpy as jnp

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import ials
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    ut, it, rt, uv, iv, rv = gen_data(n_u=n_u, n_i=n_i, n_r=n_r,
                                      n_val=n_val)
    mu = float(rt.mean())
    uvd, ivd, rvd = jnp.asarray(uv), jnp.asarray(iv), jnp.asarray(rv)
    bs = min(bs, sgd.round_up(len(rt), 8))
    cfg = SGDConfig(kernel="sigmoid", n_factors=k, lr=LR, reg=REG,
                    gamma=1 / k, min_rating=0.5, max_rating=5.0,
                    batch_size=bs, compute_epoch_rmse=False)

    @jax.jit
    def vfn(params):
        pred, _ = sgd.predict_pairs(params, uvd, ivd, cfg,
                                    bound_ratings=True)
        return jnp.sqrt(jnp.mean((pred - rvd) ** 2))

    def run(warm_sweeps, n_epochs, warm_reg=0.1):
        curve = []
        t0 = time.perf_counter()
        data = sgd.pack_ratings(ut, it, rt, bs, order="auto",
                                row_width=cfg.padded_factors)
        jax.block_until_ready(data.ratings)
        cum = time.perf_counter() - t0
        params = sgd.init_params(jax.random.PRNGKey(0), n_u, n_i, cfg, mu)
        if warm_sweeps:
            t0 = time.perf_counter()
            frac = np.clip((rt.astype(np.float64) - 0.5) / 4.5, 0.01, 0.99)
            t = np.log(frac / (1.0 - frac)).astype(np.float32)
            wlin = SGDConfig(kernel="linear", n_factors=k, lr=LR,
                             reg=warm_reg, min_rating=0.5, max_rating=5.0,
                             batch_size=bs, compute_epoch_rmse=False)
            bu_ = ials.group_by_entity_bucketed(ut, it, t, n_u)
            bi_ = ials.group_by_entity_bucketed(it, ut, t, n_i)
            params, _ = ials.ials_train_bucketed(
                params, bu_, bi_, data, wlin, warm_sweeps,
                reg_scale="per_obs")
            jax.block_until_ready(params.user_features)
            cum += time.perf_counter() - t0
            curve.append((cum, float(vfn(params))))
            del bu_, bi_
        train1 = sgd.jit_sgd_train(cfg, 1)
        wcopy = sgd.init_params(jax.random.PRNGKey(1), n_u, n_i, cfg, mu)
        wcopy, _ = train1(wcopy, data, jax.random.PRNGKey(9), LR)
        float(vfn(wcopy))  # compile outside the timed region
        del wcopy
        for ep in range(1, n_epochs + 1):
            t0 = time.perf_counter()
            params, _ = train1(params, data, jax.random.PRNGKey(ep), LR)
            jax.block_until_ready(params.user_features)
            cum += time.perf_counter() - t0
            curve.append((cum, float(vfn(params))))
        del data, params
        return curve

    c_sgd = run(0, sgd_epochs)
    c_warm = run(1, warm_epochs)
    floor_sgd = min(v for _, v in c_sgd)
    floor_warm = min(v for _, v in c_warm)
    t_sgd_floor = next(t for t, v in c_sgd if v <= floor_sgd)
    hit = [t for t, v in c_warm if v <= floor_sgd]
    return {
        "sigmoid_val_rmse_floor_sgd": round(floor_sgd, 5),
        "sigmoid_val_rmse_floor_warm": round(floor_warm, 5),
        "sigmoid_seconds_to_floor_sgd": round(t_sgd_floor, 2),
        "sigmoid_warm_seconds_to_sgd_floor": (
            round(hit[0], 2) if hit else None),
        "sigmoid_warm_total_seconds": round(c_warm[-1][0], 2),
        "time_to_quality_protocol": (
            f"val RMSE on {n_val} held-out pairs after every epoch; "
            f"sgd {sgd_epochs}ep vs per-obs warm(1 sweep, reg=0.1) + "
            f"{warm_epochs}ep; wall-clock includes pack/prep"),
    }


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import ials
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    ut, it, rt, uv, iv, rv = gen_data()
    mu = float(rt.mean())
    uvd, ivd, rvd = jnp.asarray(uv), jnp.asarray(iv), jnp.asarray(rv)

    cfg = SGDConfig(kernel="sigmoid", n_factors=K, lr=LR, reg=REG,
                    gamma=1 / K, min_rating=0.5, max_rating=5.0,
                    batch_size=SGD_BS, compute_epoch_rmse=False)
    @jax.jit
    def vfn(params):
        pred, _ = sgd.predict_pairs(params, uvd, ivd, cfg,
                                    bound_ratings=True)
        return jnp.sqrt(jnp.mean((pred - rvd) ** 2))

    records = []

    def run(name, warm_sweeps, n_epochs, warm_reg=REG):
        t0 = time.perf_counter()
        data = sgd.pack_ratings(ut, it, rt, SGD_BS, order="auto",
                                row_width=cfg.padded_factors)
        jax.block_until_ready(data.ratings)
        prep = time.perf_counter() - t0
        params = sgd.init_params(jax.random.PRNGKey(0), N_U, N_I, cfg, mu)
        cum = prep
        if warm_sweeps:
            t0 = time.perf_counter()
            frac = np.clip((rt.astype(np.float64) - 0.5) / 4.5, 0.01, 0.99)
            t = np.log(frac / (1.0 - frac)).astype(np.float32)
            wlin = SGDConfig(kernel="linear", n_factors=K, lr=LR,
                             reg=warm_reg, min_rating=0.5, max_rating=5.0,
                             batch_size=SGD_BS, compute_epoch_rmse=False)
            bu = ials.group_by_entity_bucketed(ut, it, t, N_U)
            bi = ials.group_by_entity_bucketed(it, ut, t, N_I)
            params, _ = ials.ials_train_bucketed(
                params, bu, bi, data, wlin, warm_sweeps,
                reg_scale="per_obs")
            jax.block_until_ready(params.user_features)
            dt = time.perf_counter() - t0
            cum += dt
            rm = float(vfn(params))
            rec = {"curve": name, "stage": "warm", "sweeps": warm_sweeps,
                   "cum_seconds": round(cum, 2),
                   "prep_seconds": round(prep, 2), "val_rmse": round(rm, 5)}
            records.append(rec)
            print(json.dumps(rec), flush=True)
            del bu, bi
        train1 = sgd.jit_sgd_train(cfg, 1)
        # compile outside the timed region
        wcopy = sgd.init_params(jax.random.PRNGKey(1), N_U, N_I, cfg, mu)
        wcopy, _ = train1(wcopy, data, jax.random.PRNGKey(9), LR)
        float(vfn(wcopy))
        del wcopy
        for ep in range(1, n_epochs + 1):
            t0 = time.perf_counter()
            params, _ = train1(params, data, jax.random.PRNGKey(ep), LR)
            jax.block_until_ready(params.user_features)
            cum += time.perf_counter() - t0
            rm = float(vfn(params))
            rec = {"curve": name, "stage": "sgd", "epoch": ep,
                   "cum_seconds": round(cum, 2),
                   "prep_seconds": round(prep, 2), "val_rmse": round(rm, 5)}
            records.append(rec)
            print(json.dumps(rec), flush=True)
        del data, params

    run("sgd", 0, 20)
    run("warm1", 1, 8)          # warm ridge = SGD's reg (0.005)
    run("warm1r", 1, 8, 0.1)    # warm ridge = 0.1 (the ials_vs_sgd winner)

    floors = {c: min(r["val_rmse"] for r in records if r["curve"] == c)
              for c in ("sgd", "warm1", "warm1r")}
    worst = max(floors.values())
    for target in (round(worst + 0.02, 3), round(worst + 0.005, 3)):
        row = {"target_val_rmse": target}
        for c in ("sgd", "warm1", "warm1r"):
            hit = [r for r in records
                   if r["curve"] == c and r["val_rmse"] <= target]
            row[f"{c}_seconds"] = hit[0]["cum_seconds"] if hit else None
            row[f"{c}_stage"] = (
                f"{hit[0]['stage']}:{hit[0].get('epoch', hit[0].get('sweeps'))}"
                if hit else None)
        row["floors"] = floors
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
