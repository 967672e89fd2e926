"""Vmapped hyperparameter sweeps: K models trained in ONE compiled program.

The reference's hyperparameter story is sklearn ``GridSearchCV`` over
pickled estimators — 81 candidates x 5 folds run SEQUENTIALLY on one
core (``examples/recommender-system.ipynb`` cells 29-30; the sklearn
path still works here via ``RecommenderBase``'s BaseEstimator API).
The TPU-native counterpart vmaps the whole multi-epoch SGD trainer over
the (lr, reg) grid: one trace, one compile, K factor-table sets trained
simultaneously — the batched gathers/scatters and einsums keep the MXU
busier than any single small model can, so K models cost far less than
K sequential fits (measured 13x at K=16, 95M aggregate updates/s,
ML-100K shapes — ``benchmarks/sweep_bench.py``).

``lr`` was always a traced argument of the trainer; ``reg`` gained a
traced override (``ops/segment_sgd.py::sgd_train(reg=...)``) so both
axes of the classic grid vmap.  Init seeds can also vary per candidate.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops import segment_sgd as sgd


def grid_train(
    data: sgd.RatingBatches,
    n_users: int,
    n_items: int,
    cfg: SGDConfig,
    n_epochs: int,
    lrs: jax.Array,
    regs: jax.Array,
    global_mean: float,
    seed: int = 0,
    per_candidate_init: bool = False,
    init_mean: float = 0.0,
    init_sd: float = 0.1,
) -> Tuple[sgd.MFParams, jax.Array]:
    """Train ``K = len(lrs)`` models over shared ``data`` in one program.

    Returns (stacked MFParams with leading K axis, (K, n_epochs) train
    RMSE history).  ``per_candidate_init=True`` gives each candidate its
    own init key (seed folded with the candidate index); the default
    shares one init so candidates differ only in (lr, reg).
    """
    lrs = jnp.asarray(lrs, jnp.float32)
    regs = jnp.asarray(regs, jnp.float32)
    if lrs.shape != regs.shape or lrs.ndim != 1:
        raise ValueError("lrs and regs must be 1-D of equal length")
    return _grid_train_traced(
        data, n_users, n_items, cfg, n_epochs, lrs, regs, global_mean,
        jax.random.PRNGKey(seed), per_candidate_init,
        init_mean=init_mean, init_sd=init_sd,
    )


_sweep_cache: dict = {}


def jit_grid_train(cfg: SGDConfig, n_epochs: int, n_users: int,
                   n_items: int, per_candidate_init: bool = False,
                   init_mean: float = 0.0, init_sd: float = 0.1):
    """Cached jit of ``grid_train`` keyed on the static arguments."""
    key = (cfg, n_epochs, n_users, n_items, per_candidate_init,
           float(init_mean), float(init_sd))
    if key not in _sweep_cache:
        _sweep_cache[key] = jax.jit(
            lambda data, lrs, regs, mu, seed_key: _grid_train_traced(
                data, n_users, n_items, cfg, n_epochs, lrs, regs, mu,
                seed_key, per_candidate_init,
                init_mean=init_mean, init_sd=init_sd,
            )
        )
    return _sweep_cache[key]


def _grid_train_traced(data, n_users, n_items, cfg, n_epochs, lrs, regs,
                       global_mean, seed_key, per_candidate_init,
                       init_mean=0.0, init_sd=0.1):
    """Traced body (PRNG key as an argument, jit-friendly)."""
    K = lrs.shape[0]
    k_init, k_train = jax.random.split(seed_key)
    if per_candidate_init:
        init_keys = jax.random.split(k_init, K)
        params0 = jax.vmap(
            lambda k: sgd.init_params(k, n_users, n_items, cfg, global_mean,
                                      init_mean, init_sd)
        )(init_keys)
    else:
        one = sgd.init_params(k_init, n_users, n_items, cfg, global_mean,
                              init_mean, init_sd)
        params0 = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (K,) + x.shape), one
        )

    def train_one(p, lr, reg):
        return sgd.sgd_train(p, data, k_train, cfg, n_epochs, lr,
                             reg=reg, allow_fused=False)

    return jax.vmap(train_one, in_axes=(0, 0, 0))(params0, lrs, regs)


_eval_cache: dict = {}


def grid_eval_rmse(
    params_k: sgd.MFParams,
    u_val: jax.Array,
    i_val: jax.Array,
    r_val: jax.Array,
    cfg: SGDConfig,
) -> jax.Array:
    """(K,) held-out RMSE for stacked sweep params (cold-start handled:
    unknown ids arrive as -1, reference ``recommender_base.py:166-168``)."""
    if cfg not in _eval_cache:
        def run(pk, u, i, r):
            def one(p):
                pred, _ = sgd.predict_pairs(p, u, i, cfg,
                                            bound_ratings=True)
                e = pred - r
                return jnp.sqrt(jnp.mean(e * e))

            return jax.vmap(one)(pk)

        _eval_cache[cfg] = jax.jit(run)
    return _eval_cache[cfg](params_k, u_val, i_val, r_val)


def select_best(
    params_k: sgd.MFParams, scores: jax.Array,
) -> Tuple[int, sgd.MFParams]:
    """Pick the argmin candidate and slice its params out of the stack.

    NaN scores (diverged candidates — large lr grids legitimately
    contain some) are treated as +inf, never selected."""
    scores = jnp.where(jnp.isnan(scores), jnp.inf, scores)
    best = int(jnp.argmin(scores))
    return best, jax.tree.map(lambda x: x[best], params_k)
