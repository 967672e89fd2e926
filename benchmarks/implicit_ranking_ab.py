"""Implicit-feedback model A/B: EASE vs ImplicitALS vs BPR vs popularity.

Leave-one-out ranking comparison on the clustered co-occurrence fixture
(`data/synthetic.py::clustered_interactions` — genuine item-item
structure; `movielens_shaped`'s independent marginals make popularity
Bayes-optimal there, useless for ranking comparisons).  One JSON line
per model: fit wall-clock (warm excluded only for jit-free models — the
compile IS part of a single closed-form fit), hit@10 and NDCG@10 over
every user's held-out interaction.

    python benchmarks/implicit_ranking_ab.py --users 2000 --items 2000
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import pandas as pd


def _persistent_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def evaluate(model_name, fit_fn, recommend_fn, train, held, users,
             known_map, k=10):
    t0 = time.perf_counter()
    fit_fn()
    fit_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    rec = recommend_fn()
    rec_s = time.perf_counter() - t0
    hits, ndcg = 0.0, 0.0
    by_user = {u_: g["item_id"].tolist() for u_, g in rec.groupby("user_id")}
    for u_ in users:
        top = by_user.get(u_, [])[:k]
        if held[u_] in top:
            hits += 1
            ndcg += 1.0 / np.log2(top.index(held[u_]) + 2)
    n = len(users)
    return {
        "model": model_name,
        "hit_at_10": round(hits / n, 4),
        "ndcg_at_10": round(ndcg / n, 4),
        "fit_seconds": round(fit_s, 2),
        "recommend_seconds": round(rec_s, 2),
        "n_eval_users": n,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=2000)
    p.add_argument("--items", type=int, default=2000)
    p.add_argument("--clusters", type=int, default=40)
    p.add_argument("--per-user", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    _persistent_cache()

    from matrix_factorization_tpu.data.synthetic import clustered_interactions
    from matrix_factorization_tpu.models.bpr import BPR
    from matrix_factorization_tpu.models.ease import EASE
    from matrix_factorization_tpu.models.implicit import ImplicitALS
    from matrix_factorization_tpu.models.popularity import Popularity

    X, y = clustered_interactions(
        n_users=args.users, n_items=args.items, n_clusters=args.clusters,
        per_user=args.per_user, seed=args.seed)
    df = X.copy()
    hidx = df.groupby("user_id", sort=False).sample(
        n=1, random_state=args.seed).index
    hold, train = df.loc[hidx], df.drop(hidx)
    held = dict(zip(hold["user_id"], hold["item_id"]))
    users = train["user_id"].unique().tolist()
    known_map = {u_: g["item_id"].tolist()
                 for u_, g in train.groupby("user_id", sort=False)}
    Xt = train[["user_id", "item_id"]]
    yt = pd.Series(np.ones(len(train), np.float32))

    def rec_batch(m):
        return lambda: m.recommend_batch(users, amount=10,
                                         items_known_map=known_map)

    # popularity baseline (models/popularity.py — host-only by design)
    pop = Popularity(score="count")
    print(json.dumps(evaluate(
        "popularity", lambda: pop.fit(Xt, yt), rec_batch(pop),
        train, held, users, known_map)), flush=True)

    ease = EASE(reg=50.0)
    print(json.dumps(evaluate(
        "ease", lambda: ease.fit(Xt, yt), rec_batch(ease),
        train, held, users, known_map)), flush=True)

    ials = ImplicitALS(n_factors=64, n_epochs=10, reg=0.05, alpha=40.0)
    print(json.dumps(evaluate(
        "implicit_als", lambda: ials.fit(Xt, yt), rec_batch(ials),
        train, held, users, known_map)), flush=True)

    bpr = BPR(n_factors=64, n_epochs=40, lr=0.05, reg=0.002,
              batch_size=16384)
    print(json.dumps(evaluate(
        "bpr", lambda: bpr.fit(Xt, yt), rec_batch(bpr),
        train, held, users, known_map)), flush=True)


if __name__ == "__main__":
    main()
