"""Vmapped grid sweep vs sequential fits (ML-100K shape, K candidates).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/sweep_bench.py
"""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--epochs", type=int, default=20)
    a = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd
    from matrix_factorization_tpu.ops import sweep

    n_u, n_i, n_r = 943, 1682, 100_000
    rng = np.random.default_rng(0)
    u = rng.integers(0, n_u, n_r).astype(np.int32)
    i = rng.integers(0, n_i, n_r).astype(np.int32)
    r = rng.uniform(0.5, 5, n_r).astype(np.float32)
    mu = float(r.mean())

    cfg = SGDConfig(kernel="linear", n_factors=100, batch_size=4096,
                    compute_epoch_rmse=False)
    data = sgd.pack_ratings(u, i, r, cfg.batch_size,
                            row_width=cfg.padded_factors)
    K = a.k
    lrs = jnp.asarray(np.geomspace(1e-3, 0.05, K), jnp.float32)
    regs = jnp.asarray(np.geomspace(1e-3, 0.5, K), jnp.float32)

    train_k = sweep.jit_grid_train(cfg, a.epochs, n_u, n_i)
    out = train_k(data, lrs, regs, jnp.float32(mu), jax.random.PRNGKey(0))
    float(jnp.sum(out[0].user_features))
    t0 = time.perf_counter()
    out = train_k(data, lrs, regs, jnp.float32(mu), jax.random.PRNGKey(0))
    float(jnp.sum(out[0].user_features))
    t_vmap = time.perf_counter() - t0

    train_1 = sgd.jit_sgd_train(cfg, a.epochs)
    p0 = sgd.init_params(jax.random.PRNGKey(0), n_u, n_i, cfg, mu)

    def one(lr):
        p = sgd.init_params(jax.random.PRNGKey(0), n_u, n_i, cfg, mu)
        o, _ = train_1(p, data, jax.random.PRNGKey(1), lr)
        float(jnp.sum(o.user_features))

    one(0.01)  # compile
    t0 = time.perf_counter()
    for c in range(K):
        one(float(lrs[c]))
    t_seq = time.perf_counter() - t0

    print(f"K={K} epochs={a.epochs}: vmapped sweep {t_vmap:.2f}s, "
          f"sequential {t_seq:.2f}s -> {t_seq / t_vmap:.1f}x", flush=True)
    ups = K * a.epochs * n_r / t_vmap
    print(f"aggregate throughput {ups / 1e6:.0f}M updates/s", flush=True)


if __name__ == "__main__":
    main()
