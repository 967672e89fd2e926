"""Synthetic rating data with known low-rank structure.

Used by the test suite (convergence fixtures with analytically known
structure) and by ``bench.py`` (MovieLens-shaped workloads at arbitrary
scale, no download needed — the env has no egress).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd


def lowrank_ratings(
    n_users: int = 200,
    n_items: int = 120,
    n_factors: int = 4,
    density: float = 0.3,
    noise_sd: float = 0.05,
    min_rating: float = 0.0,
    max_rating: float = 5.0,
    seed: int = 0,
) -> Tuple[pd.DataFrame, pd.Series]:
    """Ratings sampled from mu + b_u + b_i + <p_u, q_i> plus noise,
    clipped to the rating range. Returns (X[user_id,item_id], y)."""
    rng = np.random.default_rng(seed)
    mu = (min_rating + max_rating) / 2
    bu = rng.normal(0, 0.3, n_users)
    bi = rng.normal(0, 0.3, n_items)
    P = rng.normal(0, 0.5 / np.sqrt(n_factors), (n_users, n_factors))
    Q = rng.normal(0, 0.5 / np.sqrt(n_factors), (n_items, n_factors))

    n_total = n_users * n_items
    n_obs = max(1, int(density * n_total))
    flat = rng.choice(n_total, size=n_obs, replace=False)
    u, i = flat // n_items, flat % n_items
    r = mu + bu[u] + bi[i] + np.einsum("nf,nf->n", P[u], Q[i])
    r = np.clip(r + rng.normal(0, noise_sd, n_obs), min_rating, max_rating)

    X = pd.DataFrame({"user_id": u.astype(np.int64), "item_id": i.astype(np.int64)})
    return X, pd.Series(r, name="rating")


def movielens_shaped(
    n_users: int = 943,
    n_items: int = 1682,
    n_ratings: int = 100_000,
    seed: int = 0,
) -> Tuple[pd.DataFrame, pd.Series]:
    """A MovieLens-100K-shaped workload: power-law-ish popularity, ratings
    in {0.5 .. 5.0}. Not the real dataset — the shape for benchmarking."""
    if n_ratings > n_users * n_items:
        raise ValueError("n_ratings exceeds the number of possible pairs")
    rng = np.random.default_rng(seed)
    # mild power-law popularity/activity; keeps enough pair diversity that
    # vectorized oversample+dedup converges in a few rounds
    item_pop = (np.arange(1, n_items + 1, dtype=np.float64)) ** -0.8
    item_pop /= item_pop.sum()
    user_act = (np.arange(1, n_users + 1, dtype=np.float64)) ** -0.8
    user_act /= user_act.sum()

    chosen = np.empty(0, np.int64)
    for _ in range(64):
        need = n_ratings - len(chosen)
        if need <= 0:
            break
        m = max(1024, 2 * need)
        uu = rng.choice(n_users, size=m, p=user_act)
        ii = rng.choice(n_items, size=m, p=item_pop)
        chosen = np.unique(np.concatenate([chosen, uu.astype(np.int64) * n_items + ii]))
    if len(chosen) < n_ratings:  # tail fill: uniform over the complement
        all_pairs = np.setdiff1d(
            rng.permutation(n_users * n_items).astype(np.int64), chosen,
            assume_unique=False,
        )
        chosen = np.concatenate([chosen, all_pairs[: n_ratings - len(chosen)]])
    chosen = rng.permutation(chosen)[:n_ratings]
    u = (chosen // n_items).astype(np.int64)
    i = (chosen % n_items).astype(np.int64)
    base = 3.5 + 0.4 * rng.standard_normal(n_users)[u] + 0.4 * rng.standard_normal(n_items)[i]
    r = np.clip(np.round(2 * (base + 0.5 * rng.standard_normal(n_ratings))) / 2, 0.5, 5.0)
    X = pd.DataFrame({"user_id": u, "item_id": i})
    return X, pd.Series(r, name="rating")
