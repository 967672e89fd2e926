"""Settle the Pallas question with on-chip numbers (VERDICT r2 #3).

Benchmarks ``ops.pallas_scores.pallas_score_catalog`` against the XLA
``ops.scoring.score_catalog`` at the serving shapes the catalog scorer
actually runs: B in {1, 256} users x a 100k-item catalog, n_factors in
{64, 200} (lane-padded rows 128/256), all three kernels.  Also times the
full serving dispatch (score + ``lax.top_k``) both ways.

Methodology: the per-pass time is the DIFFERENCE of two scan windows
(M and 2M passes per dispatch, distinct user blocks so nothing hoists,
reduced to one scalar on device): t_pass = (t_2M - t_M) / M.  The
difference cancels the image's per-dispatch tunnel RTT exactly — a
single-window measurement at M=16 was RTT-dominated (~30ms RTT buried
the ~60-200us kernel and both variants read "2.1ms").  Reports
effective HBM GB/s (the op is Q-streaming bound: I x Kp x 4 bytes per
pass; v5e peak 819GB/s).

Remote compiles cost minutes each on this image, so the script supports
sharded compile-only warm-up into the persistent cache:

    # in parallel, one shard per process:
    python -u benchmarks/pallas_vs_xla.py --compile-only --shard 0/4 &
    python -u benchmarks/pallas_vs_xla.py --compile-only --shard 1/4 &
    ...
    # then one fast measurement pass, all cache hits:
    python -u benchmarks/pallas_vs_xla.py
"""

import argparse
import json
import time

import numpy as np


M = 128  # scoring passes in the short window (long window = 2M)
N_ITEMS = 100_000
TRIALS = 5


def combos():
    out = []
    for nf in (64, 200):
        for kernel in ("linear", "sigmoid", "rbf"):
            for B in (1, 256):
                out.append((nf, kernel, B))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--compile-only", action="store_true")
    p.add_argument("--shard", default="0/1",
                   help="i/n: process only combo indices == i mod n")
    a = p.parse_args()
    si, sn = (int(x) for x in a.shard.split("/"))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd
    from matrix_factorization_tpu.ops.pallas_scores import pallas_score_catalog
    from matrix_factorization_tpu.ops.scoring import score_catalog

    rng = np.random.default_rng(0)
    for idx, (nf, kernel, B) in enumerate(combos()):
        if idx % sn != si:
            continue
        cfg = SGDConfig(kernel=kernel, n_factors=nf, gamma=1.0 / nf)
        kp = cfg.padded_factors
        Q = np.zeros((N_ITEMS, kp), np.float32)
        Q[:, :nf] = rng.normal(0, 0.3, (N_ITEMS, nf))
        if kernel != "rbf":
            Q[:, sgd.const_col(cfg, "item")] = 1.0
            Q[:, sgd.bias_col(cfg, "item")] = rng.normal(0, 0.2, N_ITEMS)
        Qd = jnp.asarray(Q)
        mu = jnp.float32(3.5)
        pus = np.zeros((2 * M, B, kp), np.float32)
        pus[:, :, :nf] = rng.normal(0, 0.3, (2 * M, B, nf))
        if kernel != "rbf":
            pus[:, :, sgd.const_col(cfg, "user")] = 1.0
        pud = jnp.asarray(pus)
        pud_short = pud[:M]

        def timed(score_fn):
            def step(carry, pu):
                return carry + jnp.sum(score_fn(cfg, mu, pu, Qd)), None

            run = jax.jit(
                lambda ps: jax.lax.scan(step, jnp.float32(0), ps)[0]
            )
            t0 = time.perf_counter()
            float(run(pud_short))  # compile + warm (M window)
            float(run(pud))  # compile + warm (2M window)
            warm_s = time.perf_counter() - t0
            if a.compile_only:
                return warm_s
            ts = []
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                float(run(pud_short))
                t1 = time.perf_counter()
                float(run(pud))
                t2 = time.perf_counter()
                ts.append(((t2 - t1) - (t1 - t0)) / M)
            return float(np.median(ts))  # per scoring pass, RTT-free

        t_xla = timed(score_catalog)
        t_pal = timed(
            lambda c, m_, p, q: pallas_score_catalog(c, m_, p, q)
        )
        if a.compile_only:
            print(json.dumps({"combo": idx, "kernel": kernel,
                              "n_factors": nf, "B": B,
                              "warm_xla_s": round(t_xla, 1),
                              "warm_pallas_s": round(t_pal, 1)}), flush=True)
            continue
        gb = N_ITEMS * kp * 4 / 1e9
        row = {
            "kernel": kernel, "n_factors": nf, "B": B,
            "xla_us": round(t_xla * 1e6, 1),
            "pallas_us": round(t_pal * 1e6, 1),
            "xla_gbps": round(gb / t_xla, 1),
            "pallas_gbps": round(gb / t_pal, 1),
            "pallas_speedup": round(t_xla / t_pal, 3),
        }
        print(json.dumps(row), flush=True)

    if a.compile_only:
        return

    # serving dispatch: score + top_k(10), single dispatch end to end
    cfg = SGDConfig(kernel="linear", n_factors=64)
    kp = cfg.padded_factors
    Q = jnp.asarray(rng.normal(0, 0.3, (N_ITEMS, kp)).astype(np.float32))
    mu = jnp.float32(3.5)
    for B in (1, 256):
        pu = jnp.asarray(rng.normal(0, 0.3, (B, kp)).astype(np.float32))

        for name, fn in (
            ("xla", lambda p: jax.lax.top_k(score_catalog(cfg, mu, p, Q), 10)),
            ("pallas", lambda p: jax.lax.top_k(
                pallas_score_catalog(cfg, mu, p, Q), 10)),
        ):
            run = jax.jit(fn)
            jax.block_until_ready(run(pu))
            ts = []
            for _ in range(TRIALS * 2):
                t0 = time.perf_counter()
                jax.block_until_ready(run(pu))
                ts.append(time.perf_counter() - t0)
            print(json.dumps({
                "dispatch": f"score+topk[{name}]", "B": B,
                "p50_ms": round(float(np.median(ts)) * 1e3, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
