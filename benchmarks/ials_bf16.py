"""iALS gram precision study at ML-25M shape.

FINDING (v5e): XLA's DEFAULT f32 matmul already feeds the MXU bf16
operands — an explicit bf16 cast of the design rows is bit-identical
and no faster (verified: rel diff 0.0, speedup 1.00x).  The meaningful
comparison is DEFAULT vs precision=HIGHEST (exact f32 MACs, multi-pass):
this script measures that cost and the train-RMSE trajectory drift,
i.e. what the default bf16-operand grams give up.

Run: PYTHONPATH=/root/repo python -u benchmarks/ials_bf16.py [--scale small]
"""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", choices=["small", "full"], default="full")
    p.add_argument("--epochs", type=int, default=3)
    a = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import sys

    sys.path.insert(0, "benchmarks")
    from run_configs import _gen

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import ials
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    n_u, n_i, n_r = (
        (162_000, 59_392, 25_000_000) if a.scale == "full"
        else (2000, 1500, 200_000)
    )
    u, i, r = _gen(n_u, n_i, n_r)
    cfg = SGDConfig(kernel="linear", n_factors=100, reg=0.1,
                    compute_epoch_rmse=True, batch_size=131_072)
    data = sgd.pack_ratings(u, i, r, cfg.batch_size, aggregate=False)
    t0 = time.time()
    bu = ials.group_by_entity_bucketed(u, i, r, n_u)
    bi = ials.group_by_entity_bucketed(i, u, r, n_i)
    print(f"packing {time.time() - t0:.1f}s "
          f"({len(bu)}+{len(bi)} buckets)")

    results = {}
    for dtype in ("f32", "highest"):
        params = sgd.init_params(jax.random.PRNGKey(0), n_u, n_i, cfg,
                                 float(r.mean()))
        # warm-up epoch compiles every bucket shape
        ials.ials_train_bucketed(params, bu, bi, data, cfg, 1,
                                 gram_dtype=dtype)
        params = sgd.init_params(jax.random.PRNGKey(0), n_u, n_i, cfg,
                                 float(r.mean()))
        t0 = time.time()
        out, hist = ials.ials_train_bucketed(params, bu, bi, data, cfg,
                                             a.epochs, gram_dtype=dtype)
        dt = time.time() - t0
        results[dtype] = (dt / a.epochs, hist)
        print(f"{dtype}: {dt / a.epochs:.2f}s/sweep, rmse per epoch "
              f"{np.round(hist, 5).tolist()}")

    drift = float(np.abs(results["f32"][1] - results["highest"][1]).max())
    slowdown = results["highest"][0] / results["f32"][0]
    print(f"highest-precision slowdown {slowdown:.2f}x, "
          f"max RMSE drift vs default {drift:.2e}")


if __name__ == "__main__":
    main()
