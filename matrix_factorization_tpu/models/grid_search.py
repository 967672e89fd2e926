"""Model-level hyperparameter grid search, vmapped on device.

The reference demonstrates hyperparameter tuning with sklearn
``GridSearchCV`` over the estimator API (81 candidates x 5 folds run
sequentially — ``examples/recommender-system.ipynb`` cells 29-30).  That
path still works here (``RecommenderBase`` is a ``BaseEstimator``, see
``tests/test_sklearn_compat.py``); this module is the TPU-native
upgrade: every (lr, reg) candidate trains SIMULTANEOUSLY in one
compiled program (``ops/sweep.py``), sharing one preprocessing pass and
one packed rating stream.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from matrix_factorization_tpu.models.kernel_mf import KernelMF
from matrix_factorization_tpu.ops import segment_sgd as sgd
from matrix_factorization_tpu.ops import sweep


def grid_search_kernel_mf(
    X: pd.DataFrame,
    y: pd.Series,
    X_val: pd.DataFrame = None,
    y_val: pd.Series = None,
    lrs: Sequence[float] = (0.002, 0.01, 0.05),
    regs: Sequence[float] = (0.005, 0.05, 0.5),
    n_epochs: int = 20,
    seed: int = 0,
    cv: int = 0,
    **model_kwargs,
) -> Tuple[KernelMF, list]:
    """Train the full (lr x reg) grid in one vmapped program.

    ``lrs``/``regs`` are the grid AXES (all pairs are trained).  Two
    evaluation protocols:

    * holdout — pass ``X_val``/``y_val``; the winning candidate's
      trained tables are returned directly on the model;
    * ``cv=F`` folds (the reference's ``GridSearchCV(cv=5)`` protocol,
      notebook cell 29) — one vmapped sweep per fold, scores averaged
      over folds, then the best (lr, reg) is refit on ALL of ``X``.

    Returns ``(best_model, results)``: a fitted :class:`KernelMF` and a
    list of dicts (lr, reg, val_rmse, train_rmse) sorted by validation
    RMSE (mean over folds when ``cv``).
    """
    if (X_val is None) == (not cv):
        raise ValueError("pass either X_val/y_val or cv=<folds>")
    if X_val is not None and y_val is None:
        raise ValueError("X_val requires y_val")
    if cv and cv < 2:
        raise ValueError(
            f"cv must be >= 2 folds (got cv={cv}: every fold's training "
            "split would be empty)"
        )
    grid = [(float(lr), float(rg)) for lr in lrs for rg in regs]
    lr_v = jnp.asarray([g[0] for g in grid], jnp.float32)
    rg_v = jnp.asarray([g[1] for g in grid], jnp.float32)

    model = KernelMF(n_epochs=n_epochs, seed=seed, **model_kwargs)
    u, i, r = model._preprocess_fit(X, y)
    model.global_mean = float(np.mean(r))
    cfg = model._cfg()
    train = sweep.jit_grid_train(cfg, n_epochs, model.n_users,
                                 model.n_items,
                                 init_mean=model.init_mean,
                                 init_sd=model.init_sd)

    if cv:
        rng = np.random.default_rng(seed)
        fold_of = rng.integers(0, cv, len(r))
        score_sum = np.zeros(len(grid), np.float32)
        hist_np = None
        for f in range(cv):
            tr = fold_of != f
            data = sgd.pack_ratings(u[tr], i[tr], r[tr], cfg.batch_size,
                                    order=model.epoch_order,
                                    row_width=cfg.padded_factors)
            params_k, hist_k = train(data, lr_v, rg_v,
                                     jnp.float32(float(r[tr].mean())),
                                     jax.random.PRNGKey(seed + f))
            scores = sweep.grid_eval_rmse(
                params_k, jnp.asarray(u[~tr]), jnp.asarray(i[~tr]),
                jnp.asarray(r[~tr]), cfg,
            )
            score_sum += np.asarray(scores)
            hist_np = np.asarray(hist_k)
        scores_np = score_sum / cv
        # NaN (diverged) candidates never win, matching select_best
        best = int(np.argmin(np.where(np.isnan(scores_np), np.inf,
                                      scores_np)))
        model.lr, model.reg = grid[best]
        # refit the winner on ALL the training data (sklearn refit=True)
        model.fit(X, y)
        # per-candidate train history: last fold's (hist_np above)
    else:
        data = sgd.pack_ratings(u, i, r, cfg.batch_size,
                                order=model.epoch_order,
                                row_width=cfg.padded_factors)
        params_k, hist_k = train(data, lr_v, rg_v,
                                 jnp.float32(model.global_mean),
                                 jax.random.PRNGKey(seed))
        uv = model.user_vocab.encode(X_val["user_id"].to_numpy())
        iv = model.item_vocab.encode(X_val["item_id"].to_numpy())
        rv = np.asarray(y_val, np.float32)
        scores = sweep.grid_eval_rmse(
            params_k, jnp.asarray(uv), jnp.asarray(iv), jnp.asarray(rv),
            cfg,
        )
        scores_np = np.asarray(scores)
        hist_np = np.asarray(hist_k)
        best, best_params = sweep.select_best(params_k, scores)
        model.lr, model.reg = grid[best]
        model._params = best_params
        model.train_rmse = hist_np[best].tolist()

    results = sorted(
        (
            {
                "lr": grid[k][0],
                "reg": grid[k][1],
                "val_rmse": float(scores_np[k]),
                "train_rmse": float(hist_np[k][-1]),
            }
            for k in range(len(grid))
        ),
        # diverged candidates (NaN) sort last, matching select_best
        key=lambda d: (np.isnan(d["val_rmse"]), d["val_rmse"]),
    )
    return model, results


def grid_search_ease(
    X: pd.DataFrame,
    y: pd.Series,
    regs: Sequence[float] = (50.0, 250.0, 1000.0),
    holdout_per_user: int = 1,
    k: int = 10,
    max_eval_users: int = 2048,
    seed: int = 0,
    **model_kwargs,
):
    """Ridge sweep for :class:`~matrix_factorization_tpu.models.ease.EASE`.

    The item gram is lam-independent, so the whole sweep is ONE gram
    build + one BATCHED Schur-recursion inverse over the stacked
    ``G + lam I`` systems (``ops/ease.py::ease_weights_multi``) — the
    closed-form analogue of the vmapped SGD sweep above.  EASE is a
    ranking model, so selection uses a per-user leave-``n``-out
    protocol: hold ``holdout_per_user`` interactions out of each
    eligible user's history, score candidates by hit@``k`` on the
    held-out items (training items masked, the serving semantics),
    then refit the winner on ALL interactions.

    Returns ``(best_model, results)``: a fitted EASE and a list of
    dicts (reg, hit_at_k) sorted best-first.
    """
    from matrix_factorization_tpu.models.ease import EASE
    from matrix_factorization_tpu.ops import ease as ease_ops

    if not regs:
        raise ValueError("regs must be non-empty")
    if holdout_per_user < 1:
        raise ValueError("holdout_per_user must be >= 1")
    model = EASE(reg=float(regs[0]), **model_kwargs)
    u, i, r = model._preprocess_fit(X, y)
    w = model._weights(r)
    ease_ops.check_item_budget(model.n_items)

    # per-user holdout: shuffle pairs, rank within user, hold the first
    # `holdout_per_user` of each user that keeps >= 1 training item
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(u))
    order = perm[np.argsort(u[perm], kind="stable")]
    us = u[order]
    starts = np.searchsorted(us, np.arange(model.n_users))
    rank = np.arange(len(us)) - starts[us]
    counts = np.bincount(u, minlength=model.n_users)
    held_mask_sorted = (rank < holdout_per_user) & \
        (counts[us] > holdout_per_user)
    held = np.zeros(len(u), bool)
    held[order] = held_mask_sorted
    tr = ~held

    G = ease_ops.item_gram(u[tr], i[tr], w[tr], model.n_users,
                           model.n_items, model.gram_chunk_users)
    B_stack = ease_ops.ease_weights_multi(G, list(regs))

    # eval cohort: users with held-out items, capped for dispatch count
    eval_users = np.unique(u[held])
    if len(eval_users) > max_eval_users:
        eval_users = rng.choice(eval_users, max_eval_users, replace=False)
    held_items = {int(uu): set() for uu in eval_users}
    for uu, ii in zip(u[held], i[held]):
        if int(uu) in held_items:
            held_items[int(uu)].add(int(ii))

    # training histories for the eval cohort (the serving-side state)
    model._set_histories(u[tr], i[tr], w[tr])
    hits = np.zeros(len(regs), np.float64)
    for lo in range(0, len(eval_users), 256):
        cohort = eval_users[lo : lo + 256]
        ids, ww = model._history_block(cohort)
        for c in range(len(regs)):
            _, idx = ease_ops.history_topk_unseen(
                B_stack[c], ids, ww, min(k, model.n_items), model.n_items)
            for row, uu in enumerate(cohort):
                if held_items[int(uu)] & set(idx[row].tolist()):
                    hits[c] += 1
    hit_rate = hits / max(1, len(eval_users))

    best = int(np.argmax(hit_rate))
    model.reg = float(regs[best])
    # refit the winner on ALL interactions (sklearn refit=True analogue)
    G_full = ease_ops.item_gram(u, i, w, model.n_users, model.n_items,
                                model.gram_chunk_users)
    model._params = ease_ops.EASEParams(
        ease_ops.ease_weights(G_full, model.reg))
    model._serving_cache = None
    model._set_histories(u, i, w)

    results = sorted(
        ({"reg": float(regs[c]), "hit_at_k": float(hit_rate[c])}
         for c in range(len(regs))),
        key=lambda d: -d["hit_at_k"],
    )
    return model, results
