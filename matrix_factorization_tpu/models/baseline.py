"""Bias-only baseline model: r_ui ~= mu + b_u + b_i.

Reference: ``matrix_factorization/baseline_model.py`` (SGD solver
``:215-280``, closed-form ALS ``:283-362``, predict ``:365-417``,
``update_users`` ``:136-180``).  Here both solvers run entirely on device:
ALS as exact segment-sum sweeps, SGD as scanned mini-batches
(:mod:`matrix_factorization_tpu.ops.als`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from matrix_factorization_tpu.models.base import RecommenderBase, bucketed_predict
from matrix_factorization_tpu.ops import als as als_ops
from matrix_factorization_tpu.ops.segment_sgd import pack_ratings, round_up

_predict_jit_cache: dict = {}


def _jit_bias_predict(min_rating: float, max_rating: float, bound_ratings: bool):
    key = (min_rating, max_rating, bound_ratings)
    if key not in _predict_jit_cache:
        _predict_jit_cache[key] = jax.jit(
            lambda p, uu, ii: als_ops.bias_predict(
                p, uu, ii, min_rating, max_rating, bound_ratings
            )
        )
    return _predict_jit_cache[key]


class BaselineModel(RecommenderBase):
    """Explicit-rating bias model with ``method='sgd'`` or ``'als'``.

    Defaults match the reference ctor (``baseline_model.py:41-61``):
    ``n_epochs=100, reg=1, lr=0.01``.
    """

    def __init__(
        self,
        method: str = "sgd",
        n_epochs: int = 100,
        reg: float = 1.0,
        lr: float = 0.01,
        min_rating: float = 0,
        max_rating: float = 5,
        verbose: int = 0,
        batch_size: int = 1024,
        seed: int = 0,
        mesh=None,
    ):
        if method not in ("sgd", "als"):
            raise ValueError("Method param must be either 'sgd' or 'als'")
        super().__init__(min_rating=min_rating, max_rating=max_rating, verbose=verbose)
        self.method = method
        self.n_epochs = n_epochs
        self.reg = reg
        self.lr = lr
        self.batch_size = batch_size
        self.seed = seed
        # data-parallel fit over a jax.sharding.Mesh: ALS = psum'd
        # segment sums (exact), SGD = batch-sliced shards + per-step
        # psum'd delta vectors (ops/als.py dp trainers); update_users
        # stays single-device (new-user cohorts are tiny)
        self.mesh = mesh
        self._params: Optional[als_ops.BiasParams] = None
        self.train_rmse: list = []

    # -- capacity management ------------------------------------------------
    def _capacity(self) -> int:
        return 0 if self._params is None else self._params.user_biases.shape[0]

    def _ensure_user_capacity(self, n_needed: int) -> None:
        cap = self._capacity()
        if n_needed <= cap:
            return
        new_cap = round_up(max(n_needed, int(cap * 1.5) + 1), 1024)
        pad = new_cap - cap
        self._params = self._params._replace(
            user_biases=jnp.concatenate(
                [self._params.user_biases, jnp.zeros((pad,), jnp.float32)]
            )
        )

    # -- lifecycle ----------------------------------------------------------
    def fit(self, X: pd.DataFrame, y: pd.Series, n_epochs: int = None,
            warm_start: bool = False):
        if warm_start and self._params is not None:
            from matrix_factorization_tpu.core.ids import check_no_duplicates

            users = X["user_id"].to_numpy()
            items = X["item_id"].to_numpy()
            check_no_duplicates(users, items)
            u = self.user_vocab.encode(users, strict=True)
            i = self.item_vocab.encode(items, strict=True)
            r = np.asarray(y, dtype=np.float32)
            params = self._params
        else:
            u, i, r = self._preprocess_fit(X, y)
            self.global_mean = float(np.mean(r))
            params = als_ops.init_bias_params(
                round_up(self.n_users, 1024), self.n_items, self.global_mean
            )
            self.train_rmse = []
        n_epochs = n_epochs or self.n_epochs
        if self.mesh is not None:
            from matrix_factorization_tpu.parallel.mesh import data_size_of

            n_dev = data_size_of(self.mesh)
            bs = round_up(self.batch_size, n_dev)
            data = als_ops.shard_bias_data(
                pack_ratings(u, i, r, bs, aggregate=False), self.mesh)
            if self.method == "als":
                params, rmse_hist = jax.jit(
                    lambda p, d: als_ops.dp_als_train(
                        p, d, self.reg, n_epochs, self.mesh)
                )(params, data)
            else:
                key = jax.random.fold_in(
                    jax.random.PRNGKey(self.seed), len(self.train_rmse)
                )
                params, rmse_hist = jax.jit(
                    lambda p, d, k: als_ops.dp_bias_sgd_train(
                        p, d, k, self.lr, self.reg, n_epochs, self.mesh
                    )
                )(params, data, key)
        elif self.method == "als":
            data = pack_ratings(u, i, r, self.batch_size)
            params, rmse_hist = jax.jit(
                lambda p, d: als_ops.als_train(p, d, self.reg, n_epochs)
            )(params, data)
        else:
            data = pack_ratings(u, i, r, self.batch_size)
            key = jax.random.fold_in(
                jax.random.PRNGKey(self.seed), len(self.train_rmse)
            )
            params, rmse_hist = jax.jit(
                lambda p, d, k: als_ops.bias_sgd_train(
                    p, d, k, self.lr, self.reg, n_epochs, self.batch_size
                )
            )(params, data, key)

        self._params = params
        self.train_rmse = list(self.train_rmse) + np.asarray(rmse_hist).tolist()
        if self.verbose:
            for e, v in enumerate(self.train_rmse):
                print(f"Epoch {e + 1} train RMSE: {v:.4f}")
        return self

    def _predict_arrays(self, u: np.ndarray, i: np.ndarray, bound_ratings: bool):
        self._require_fitted()
        fn = _jit_bias_predict(self.min_rating, self.max_rating, bound_ratings)
        return bucketed_predict(
            lambda uu, ii: fn(self._params, jnp.asarray(uu), jnp.asarray(ii)), u, i
        )

    def predict(self, X: pd.DataFrame, bound_ratings: bool = True) -> list:
        if X.shape[0] == 0:
            return []
        u, i = self._preprocess_predict(X)
        preds, possible = self._predict_arrays(u, i, bound_ratings)
        self.predictions_possible = possible.tolist()
        return preds.tolist()

    def _predict_dense(self, u, i, bound_ratings):
        return self._predict_arrays(
            np.asarray(u, np.int32), np.asarray(i, np.int32), bound_ratings
        )

    def update_users(
        self,
        X: pd.DataFrame,
        y: pd.Series,
        lr: float = 0.01,
        n_epochs: int = 20,
        verbose: int = 0,
    ):
        """Refit user biases for new/updated users, item side frozen
        (reference ``baseline_model.py:136-180``).  Known users named in X
        are re-initialized to 0 before refitting — the reference's
        documented "pass all their ratings again" contract."""
        u, i, r, known_users, _new_users = self._preprocess_update(X, y)
        self._ensure_user_capacity(self.n_users)

        if known_users:
            idx = jnp.asarray(
                self.user_vocab.encode(np.asarray(known_users, dtype=object))
            )
            self._params = self._params._replace(
                user_biases=self._params.user_biases.at[idx].set(0.0)
            )

        pack_bs = min(self.batch_size, max(1, len(r)))
        data = pack_ratings(u, i, r, pack_bs)
        key = jax.random.PRNGKey(self.seed + 1)
        params, rmse_hist = jax.jit(
            lambda p, d, k: als_ops.bias_sgd_train(
                p, d, k, lr, self.reg, n_epochs, pack_bs, update_item_params=False
            )
        )(self._params, data, key)
        self._params = params
        self.train_rmse = np.asarray(rmse_hist).tolist()
        if verbose:
            for e, v in enumerate(self.train_rmse):
                print(f"Epoch {e + 1} train RMSE: {v:.4f}")
        return self

    def _catalog_scores(self, u_dense: int) -> np.ndarray:
        """Unbounded mu + b_u + b_i over the whole catalog (recommend path)."""
        return (
            self.global_mean
            + float(self._params.user_biases[u_dense])
            + self.item_biases
        )

    def _catalog_topk(self, u_dense: np.ndarray, k: int):
        """Device-side top-k through the shared pad/bucket/jit-cache
        harness (``ops.scoring.topk_harness``); only the bias-vector
        score expression is this model's own."""
        from matrix_factorization_tpu.ops.scoring import topk_harness

        n_items = self.n_items

        def make_run(kb, bb):
            def run(u, mu, bu, bi):
                s = (mu + bu.at[u].get(mode="promise_in_bounds")[:, None]
                     + bi[None, :n_items])
                return jax.lax.top_k(s, kb)

            return run

        return topk_harness(
            make_run, "bias_topk", n_items, u_dense, k, _predict_jit_cache,
            (jnp.float32(self.global_mean), self._params.user_biases,
             self._params.item_biases),
        )

    # -- reference-parity parameter views ------------------------------------
    @property
    def user_biases(self) -> np.ndarray:
        return np.asarray(self._params.user_biases[: self.n_users])

    @property
    def item_biases(self) -> np.ndarray:
        return np.asarray(self._params.item_biases[: self.n_items])
