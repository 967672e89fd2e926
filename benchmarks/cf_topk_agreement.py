"""Quantified head-agreement study: TopK CF vs the exact reference CF.

VERDICT r1 weak #5: the scalable TopK CF's documented semantic deviation
(GLOBAL top-k neighbor lists vs the reference's per-prediction re-ranking
of raters, ``collaborative_filtering.py:133-190``) was only spot-checked.
This measures, at realistic ML-like sparsity (power-law popularity),
how the two predictors agree as the list size k grows.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/cf_topk_agreement.py
Prints one JSON line per k.
"""

import json

import numpy as np
import pandas as pd


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from matrix_factorization_tpu.data.synthetic import movielens_shaped
    from matrix_factorization_tpu.models.cf_topk import TopKItemItemCF
    from matrix_factorization_tpu.models.collaborative import ItemItemCF

    X, y = movielens_shaped(n_users=2500, n_items=1600, n_ratings=120_000,
                            seed=0)
    rng = np.random.default_rng(1)
    idx = rng.permutation(len(y))
    tr, te = idx[:100_000], idx[100_000:110_000]
    Xtr, ytr = X.iloc[tr], y.iloc[tr]
    Xte, yte = X.iloc[te], np.asarray(y.iloc[te])

    n_neighbors = 30
    exact = ItemItemCF(n_neighbors=n_neighbors, min_rating=0.5, max_rating=5.0)
    exact.fit(Xtr, ytr)
    p_exact = np.asarray(exact.predict(Xte))
    rmse_exact = float(np.sqrt(np.mean((p_exact - yte) ** 2)))

    for k in (30, 100, 300):
        topk = TopKItemItemCF(n_neighbors=k, min_rating=0.5, max_rating=5.0)
        topk.fit(Xtr, ytr)
        p_topk = np.asarray(topk.predict(Xte))
        rmse_topk = float(np.sqrt(np.mean((p_topk - yte) ** 2)))
        d = np.abs(p_topk - p_exact)
        print(json.dumps({
            "study": "cf_topk_vs_exact_agreement",
            "k": k,
            "n_neighbors_exact": n_neighbors,
            "rmse_exact": round(rmse_exact, 4),
            "rmse_topk": round(rmse_topk, 4),
            "rmse_delta": round(abs(rmse_topk - rmse_exact), 4),
            "mean_abs_pred_diff": round(float(d.mean()), 4),
            "p_within_0.1": round(float((d <= 0.1).mean()), 3),
            "p_within_0.25": round(float((d <= 0.25).mean()), 3),
        }))


if __name__ == "__main__":
    main()
