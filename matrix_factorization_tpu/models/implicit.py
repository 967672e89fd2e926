"""Implicit-feedback matrix factorization (confidence-weighted ALS).

The reference has no implicit-feedback model — its Steam pipeline
converts play-hours into pseudo-ratings and feeds the explicit models
(``project_template/pipeline/prepare_steam_light.py:138-148``).  This
model consumes such interaction strengths *natively*: preferences are
binary (interacted / not), confidences grow with the strength
(``c = 1 + alpha * s``), and every unobserved (user, item) pair acts as
a weak negative — the Hu/Koren/Volinsky iALS formulation, which is the
standard for implicit data and a natural TPU fit (each sweep is one
shared k x k gram + batched Cholesky solves, zero scatters; see
``ops/ials.py::implicit_sweep``).

API matches the ``RecommenderBase`` lifecycle: ``fit / predict /
recommend / update_users``.  Predictions are preference scores in
~[0, 1], not ratings; ``update_users`` solves new users' rows exactly
(one closed-form sweep) with the item side frozen.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.models.base import RecommenderBase, bucketed_predict
from matrix_factorization_tpu.ops import ials
from matrix_factorization_tpu.ops import segment_sgd as sgd


class ImplicitALS(RecommenderBase):
    def __init__(
        self,
        n_factors: int = 64,
        n_epochs: int = 15,
        reg: float = 0.1,
        alpha: float = 40.0,
        init_sd: float = 0.01,
        verbose: int = 0,
        seed: int = 0,
        serving_dtype: str = "float32",
    ):
        """``alpha`` scales interaction strength into confidence
        (``c = 1 + alpha * strength``); strengths must be >= 0.

        ``serving_dtype``: 'float32' or 'bfloat16' — same bf16-resident
        catalog-serving option as ``KernelMF`` (see there)."""
        if serving_dtype not in ("float32", "bfloat16"):
            raise ValueError("serving_dtype must be 'float32' or 'bfloat16'")
        # preference scores live in ~[0, 1]
        super().__init__(min_rating=0.0, max_rating=1.0, verbose=verbose)
        self.n_factors = n_factors
        self.n_epochs = n_epochs
        self.reg = reg
        self.alpha = alpha
        self.init_sd = init_sd
        self.seed = seed
        self.serving_dtype = serving_dtype
        self._params: Optional[sgd.MFParams] = None
        self._serving_cache = None
        self.train_loss: list = []

    def _cfg(self, compute_epoch_rmse: bool = True) -> SGDConfig:
        return SGDConfig(
            kernel="linear",
            n_factors=self.n_factors,
            reg=self.reg,
            min_rating=self.min_rating,
            max_rating=self.max_rating,
            compute_epoch_rmse=compute_epoch_rmse,
        )

    def fit(self, X: pd.DataFrame, y: pd.Series):
        """``y`` holds non-negative interaction strengths (counts, hours,
        clicks); zeros are treated as observed-but-weak (c = 1)."""
        u, i, r = self._preprocess_fit(X, y)
        if (r < 0).any():
            raise ValueError("implicit strengths must be non-negative")
        cfg = self._cfg()
        params = sgd.init_params(
            jax.random.PRNGKey(self.seed), self.n_users, self.n_items, cfg,
            global_mean=0.0, init_sd=self.init_sd,
        )
        by_user = ials.group_by_entity(u, i, r, self.n_users)
        by_item = ials.group_by_entity(i, u, r, self.n_items)
        params, loss = ials.jit_implicit_als_train(
            cfg, self.n_epochs, self.alpha
        )(params, by_user, by_item)
        self._params = params
        self.train_loss = np.asarray(loss).tolist()
        self.global_mean = 0.0
        if self.verbose:
            for e, v in enumerate(self.train_loss):
                print(f"Epoch {e + 1} implicit loss: {v:.2f}")
        return self

    def _predict_arrays(self, u: np.ndarray, i: np.ndarray,
                        bound_ratings: bool):
        self._require_fitted()
        fn = sgd.jit_predict_pairs(self._cfg(), bound_ratings)
        return bucketed_predict(
            lambda uu, ii: fn(self._params, jnp.asarray(uu), jnp.asarray(ii)),
            u, i,
        )

    def predict(self, X: pd.DataFrame, bound_ratings: bool = True) -> list:
        """Preference scores (~[0,1], clipped when ``bound_ratings``)."""
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

    def update_users(self, X: pd.DataFrame, y: pd.Series, lr: float = 0.0,
                     n_epochs: int = 1, verbose: int = 0):
        """Exact closed-form solve of the named users' rows with the item
        side frozen (``lr`` accepted for API parity, unused — there is no
        gradient path).  Known users are re-solved from scratch (their
        row depends only on their ratings given Q), matching the
        reference's re-initialize-then-refit semantics."""
        u, i, r, _known, _new = self._preprocess_update(X, y)
        if len(r) == 0:  # every rating referenced an unknown item
            return self
        if (r < 0).any():
            raise ValueError("implicit strengths must be non-negative")
        cfg = self._cfg(compute_epoch_rmse=False)
        cap = self._params.user_features.shape[0]
        if self.n_users > cap:
            grown = sgd.round_up(self.n_users, 1024)
            fresh = sgd.fresh_user_rows(
                jax.random.PRNGKey(self.seed + 1), grown - cap, cfg, 0.0,
                self.init_sd,
            )
            self._params = self._params._replace(
                user_features=jnp.concatenate(
                    [self._params.user_features, fresh])
            )
        # solve ONLY the touched users: a compact grouped block whose
        # rows are written back at their dense ids
        uniq, local = np.unique(u, return_inverse=True)
        grouped = ials.group_by_entity(
            local.astype(np.int32), i, r, len(uniq))
        P, Q = self._params.user_features, self._params.item_features
        block = ials.implicit_sweep(
            jnp.zeros((len(uniq), P.shape[1]), jnp.float32), Q, grouped,
            self.n_items, cfg, self.alpha,
        )
        k = cfg.n_factors
        P = P.at[jnp.asarray(uniq), :k].set(block[:, :k])
        self._params = self._params._replace(user_features=P)
        return self

    def _serving_params(self) -> sgd.MFParams:
        """Serving-path parameter view (identity-keyed bf16 cache — see
        ``RecommenderBase._cached_serving_params``)."""
        return self._cached_serving_params()

    def _catalog_scores_batch(self, u_dense: np.ndarray) -> np.ndarray:
        from matrix_factorization_tpu.ops.scoring import catalog_scores

        return catalog_scores(self._cfg(), self._serving_params(),
                              self.n_items, u_dense)

    def _catalog_scores(self, u_dense: int) -> np.ndarray:
        return self._catalog_scores_batch(np.asarray([u_dense]))[0]

    def _catalog_topk(self, u_dense: np.ndarray, k: int):
        """Device-side top-k (see ``ops.scoring.catalog_topk``)."""
        from matrix_factorization_tpu.ops.scoring import catalog_topk

        return catalog_topk(self._cfg(), self._serving_params(),
                            self.n_items, u_dense, k)

    # -- parameter views ------------------------------------------------------
    @property
    def user_features(self) -> np.ndarray:
        return np.asarray(
            self._params.user_features[: self.n_users, : self.n_factors])

    @property
    def item_features(self) -> np.ndarray:
        return np.asarray(
            self._params.item_features[: self.n_items, : self.n_factors])
