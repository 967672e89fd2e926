"""SVD++: explicit-rating matrix factorization with implicit-feedback
factor terms (Koren, KDD 2008) — an extension beyond the reference's
surface (its richest model is plain KernelMF,
``matrix_factorization/kernel_matrix_factorization.py``).  The TPU
training schedule and the gradient regrouping that makes the y-updates
O(nnz) live in ``ops/svdpp.py``.

API matches the ``RecommenderBase`` lifecycle exactly: ``fit(X, y)`` on
explicit ratings, ``predict`` clamps to the rating range, ``recommend``
/ ``recommend_batch`` rank the catalog on device, and ``update_users``
re-trains the named users' rows (item and implicit tables frozen).
Serving rides the effective user table P + S, so every linear-kernel
scorer (pair predict, device top-k, bf16-resident catalogs) works
unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.models.base import RecommenderBase, bucketed_predict
from matrix_factorization_tpu.ops import segment_sgd as sgd
from matrix_factorization_tpu.ops import svdpp as svdpp_ops


class SVDpp(RecommenderBase):
    def __init__(
        self,
        n_factors: int = 64,
        n_epochs: int = 20,
        lr: float = 0.01,
        reg: float = 0.02,
        lr_y: Optional[float] = None,
        reg_y: Optional[float] = None,
        batch_size: int = 8192,
        min_rating: float = 0,
        max_rating: float = 5,
        init_sd: float = 0.1,
        verbose: int = 0,
        seed: int = 0,
        mesh=None,
        overlap_psum: bool = False,
        serving_dtype: str = "float32",
        dp_layout: str = "tiled",
        psum_every=1,
    ):
        """``lr_y`` / ``reg_y`` control the implicit table's deferred
        epoch update (default: same as ``lr`` / ``reg``; the aggregated
        epoch gradient has the same first-order magnitude as a full
        per-rating sweep, so no rescaling is needed).  ``serving_dtype``:
        'float32' or 'bfloat16', as on ``KernelMF``.

        ``mesh``: optional ``jax.sharding.Mesh``; with >1 device on the
        data axes, ``fit`` trains data-parallel (user-sharded P/S/A,
        psum'd Q deltas, one extra psum per epoch for the deferred
        y-gradient) and gathers for serving.  ``dp_layout``: 'tiled'
        (default — the MXU tile-aggregated dp step,
        ``ops/svdpp.py::dp_svdpp_train_batched``) or 'flat' (per-row
        scatters, ``dp_svdpp_train``).  ``overlap_psum`` defers the Q
        all-reduce one step/window, and ``psum_every`` windows it
        (tiled layout only) — the same knobs as ``KernelMF``/``BPR``."""
        if serving_dtype not in ("float32", "bfloat16"):
            raise ValueError("serving_dtype must be 'float32' or 'bfloat16'")
        if overlap_psum and mesh is None:
            raise ValueError("overlap_psum=True requires a mesh")
        if dp_layout not in ("tiled", "flat"):
            raise ValueError(f"unknown dp_layout {dp_layout!r}")
        if psum_every != 1 and mesh is None:
            raise ValueError("psum_every requires a mesh")
        super().__init__(min_rating=min_rating, max_rating=max_rating,
                         verbose=verbose)
        self.n_factors = n_factors
        self.n_epochs = n_epochs
        self.lr = lr
        self.reg = reg
        self.lr_y = lr_y
        self.reg_y = reg_y
        self.batch_size = batch_size
        self.init_sd = init_sd
        self.seed = seed
        self.mesh = mesh
        self.overlap_psum = overlap_psum
        self.serving_dtype = serving_dtype
        self.dp_layout = dp_layout
        self.psum_every = psum_every
        self._params: Optional[svdpp_ops.SVDppParams] = None
        self._serving_cache = None
        self._mf_cache = None
        self.train_rmse: list = []

    def _cfg(self, compute_epoch_rmse: bool = True) -> SGDConfig:
        return SGDConfig(
            kernel="linear",
            n_factors=self.n_factors,
            lr=self.lr,
            reg=self.reg,
            min_rating=self.min_rating,
            max_rating=self.max_rating,
            batch_size=self.batch_size,
            compute_epoch_rmse=compute_epoch_rmse,
        )

    # -- lifecycle ----------------------------------------------------------
    def fit(self, X: pd.DataFrame, y: pd.Series):
        u, i, r = self._preprocess_fit(X, y)
        self.global_mean = float(np.mean(r))
        cfg = self._cfg()
        # 'is None', not 'or': an explicit 0.0 (freeze y / no ridge) is a
        # legitimate ablation setting
        lr_y = self.lr if self.lr_y is None else self.lr_y
        reg_y = self.reg if self.reg_y is None else self.reg_y
        k_fit = jax.random.fold_in(jax.random.PRNGKey(self.seed), 1)
        mesh_data = 1
        if self.mesh is not None:
            from matrix_factorization_tpu.parallel.mesh import data_size_of

            mesh_data = data_size_of(self.mesh)
        if mesh_data > 1:
            from matrix_factorization_tpu.parallel import distributed as dist

            ucap, bs, (su, si, sr, sw), shard, rep = dist.dp_fit_plumbing(
                u, i, r, self.n_users, self.mesh, self.batch_size)
            params = svdpp_ops.init_params(
                jax.random.PRNGKey(self.seed), self.n_users, self.n_items,
                cfg, self.global_mean, init_sd=self.init_sd,
                user_capacity=ucap,
            )
            wvec = svdpp_ops._neighbor_weights(u, self.n_users, ucap)
            deg = np.zeros(params.item_features.shape[0], np.float32)
            deg[: self.n_items] = np.bincount(i, minlength=self.n_items)
            params = svdpp_ops.SVDppParams(
                user_features=jax.device_put(params.user_features, shard),
                item_features=jax.device_put(params.item_features, rep),
                implicit_features=jax.device_put(params.implicit_features,
                                                 rep),
                user_implicit_sums=jax.device_put(params.user_implicit_sums,
                                                  shard),
                global_mean=jax.device_put(params.global_mean, rep),
            )
            if self.dp_layout == "tiled":
                mesh_data_n = mesh_data
                data = sgd.pack_ratings(
                    u.astype(np.int32), i.astype(np.int32),
                    r.astype(np.float32), bs,
                    shuffle_seed=self.seed, order="user",
                    row_width=cfg.padded_factors, n_dev=mesh_data_n,
                    users_per_dev=ucap // mesh_data_n,
                )
                data = jax.tree.map(lambda a: jax.device_put(a, shard),
                                    data)
                train = svdpp_ops.jit_dp_svdpp_train_batched(
                    cfg, self.n_epochs, lr_y, reg_y, self.mesh,
                    overlap_psum=self.overlap_psum,
                    psum_every=self.psum_every,
                )
                params, hist = train(
                    params, data,
                    jax.device_put(jnp.asarray(wvec), shard),
                    jax.device_put(jnp.asarray(deg), rep), k_fit,
                )
            else:
                train = svdpp_ops.jit_dp_svdpp_train(
                    cfg, self.n_epochs, lr_y, reg_y, bs, len(u), self.mesh,
                    overlap_psum=self.overlap_psum,
                )
                params, hist = train(
                    params, jax.device_put(su, shard),
                    jax.device_put(si, shard),
                    jax.device_put(sr, shard), jax.device_put(sw, shard),
                    jax.device_put(jnp.asarray(wvec), shard),
                    jax.device_put(jnp.asarray(deg), rep), k_fit,
                )
            # gather for the single-device serving paths
            params = svdpp_ops.SVDppParams(
                *(jnp.asarray(np.asarray(x)) for x in params))
        else:
            params = svdpp_ops.init_params(
                jax.random.PRNGKey(self.seed), self.n_users, self.n_items,
                cfg, self.global_mean, init_sd=self.init_sd,
            )
            # user-primary pack: P/S/A share one tile one-hot per batch,
            # Q deltas ride the secondary tiles (ops/svdpp.py batched
            # trainer — the row-op-bound flat path stays for dp/refit)
            data = sgd.pack_ratings(
                u.astype(np.int32), i.astype(np.int32),
                r.astype(np.float32), self.batch_size,
                shuffle_seed=self.seed, order="user",
                row_width=cfg.padded_factors,
            )
            wvec = svdpp_ops._neighbor_weights(
                u, self.n_users, params.user_features.shape[0])
            deg = np.zeros(params.item_features.shape[0], np.float32)
            deg[: self.n_items] = np.bincount(i, minlength=self.n_items)
            fn = svdpp_ops.jit_svdpp_train_batched(
                cfg, self.n_epochs, lr_y, reg_y)
            params, hist = fn(params, data, jnp.asarray(wvec),
                              jnp.asarray(deg), k_fit)
        self._params = params
        self._serving_cache = None
        self.train_rmse = np.asarray(hist).tolist()
        if self.verbose:
            for e, v in enumerate(self.train_rmse):
                print(f"Epoch {e + 1} train RMSE: {v:.4f}")
        return self

    def _mf_view(self) -> sgd.MFParams:
        """f32 effective-table view P + S, identity-cached so the full
        (Ucap, Kp) add is not re-materialized on every predict call."""
        c = self._mf_cache
        if c is None or c[0] is not self._params:
            self._mf_cache = c = (self._params, self._params.as_mf)
        return c[1]

    def _predict_arrays(self, u: np.ndarray, i: np.ndarray,
                        bound_ratings: bool):
        self._require_fitted()
        fn = sgd.jit_predict_pairs(self._cfg(), bound_ratings)
        mf = self._mf_view()
        return bucketed_predict(
            lambda uu, ii: fn(mf, jnp.asarray(uu), jnp.asarray(ii)), u, i,
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

    def update_users(self, X: pd.DataFrame, y: pd.Series,
                     lr: float = None, n_epochs: int = None,
                     verbose: int = 0):
        """Re-train the named users' rows (fresh random init, reference
        re-initialize-then-refit semantics) against frozen Q and Y; the
        cohort's implicit sums come from the update interactions."""
        u, i, r, known_users, _new = self._preprocess_update(X, y)
        if len(r) == 0:  # every rating referenced an unknown item
            return self
        cfg = self._cfg(compute_epoch_rmse=False)
        cap = self._params.user_features.shape[0]
        if self.n_users > cap:
            grown = sgd.round_up(self.n_users, 1024)
            fresh = sgd.fresh_user_rows(
                jax.random.PRNGKey(self.seed + 1), grown - cap, cfg, 0.0,
                self.init_sd,
            )
            zeros = jnp.zeros_like(fresh)
            self._params = self._params._replace(
                user_features=jnp.concatenate(
                    [self._params.user_features, fresh]),
                user_implicit_sums=jnp.concatenate(
                    [self._params.user_implicit_sums, zeros]),
            )
        if known_users:
            idx = jnp.asarray(
                self.user_vocab.encode(np.asarray(known_users, dtype=object)))
            fresh = sgd.fresh_user_rows(
                jax.random.PRNGKey(self.seed + 2), len(known_users), cfg,
                0.0, self.init_sd,
            )
            self._params = self._params._replace(
                user_features=self._params.user_features.at[idx].set(fresh)
            )
        up, ip, rp, wp, bs = svdpp_ops.pack_pairs(
            u, i, r, min(self.batch_size, max(1, len(u))))
        wvec = svdpp_ops._neighbor_weights(
            u, self.n_users, self._params.user_features.shape[0])
        import dataclasses

        refit_cfg = cfg if lr is None else dataclasses.replace(cfg, lr=lr)
        fn = svdpp_ops.jit_user_refit(
            refit_cfg, n_epochs or self.n_epochs, bs, len(up))
        self._params = fn(
            self._params, jnp.asarray(up), jnp.asarray(ip), jnp.asarray(rp),
            jnp.asarray(wp), jnp.asarray(wvec),
            jax.random.fold_in(jax.random.PRNGKey(self.seed), 2),
        )
        self._serving_cache = None
        return self

    # -- serving --------------------------------------------------------------
    def _serving_params(self) -> sgd.MFParams:
        """Effective-table view P + S (identity-keyed cache; optional
        bf16 residency — see ``RecommenderBase._cached_serving_params``)."""
        return self._cached_serving_params(self._mf_view)

    def _catalog_topk(self, u_dense: np.ndarray, k: int):
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

    @property
    def implicit_features(self) -> np.ndarray:
        return np.asarray(
            self._params.implicit_features[: self.n_items, : self.n_factors])

    @property
    def user_biases(self) -> np.ndarray:
        col = sgd.bias_col(self._cfg(), "user")
        return np.asarray(self._params.user_features[: self.n_users, col])

    @property
    def item_biases(self) -> np.ndarray:
        col = sgd.bias_col(self._cfg(), "item")
        return np.asarray(self._params.item_features[: self.n_items, col])
