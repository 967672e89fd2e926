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
